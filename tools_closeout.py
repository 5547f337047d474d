"""One-command close-out runner (r11 verdict task #5): regenerate every
committed measurement artifact FROM FINAL CODE, in dependency order, and
print the verbatim counts STATUS.md's close-out section should carry —
ending the recurring artifact/prose drift (r10 "800" vs 802 tests,
r11 "825" vs 826, r10's stale SCALING.json).

Steps (each skippable for partial reruns; durations are idle-box).
pytest runs LAST on purpose: the suite pins the cards' registry
coverage and harness hashes, so the artifacts must be regenerated
before it can be green — running it first would fail on any round that
added queries (the exact drift class this runner exists to end):

  1. verify 0.01       verify_driver --all at sf0.01   (~6 min)
  2. verify 0.1        verify_driver --all at sf0.1    (~20 min;
                       the scale-dependent-oracle-bug probe)
  3. budgets           bench.py --write-budgets at sf0.1 (~8 min;
                       also refreshes BENCH_DETAIL.json + box stamps)
  4. scaling           scaling_card.py -> SCALING.json (~15 min)
  5. parallel          parallel_card.py -> PARALLEL.json (~12 min)
  6. pytest            full zero-skip suite            (~20 min)

Usage:
    python tools_closeout.py                 # everything
    python tools_closeout.py --skip pytest   # rerun artifacts only
    python tools_closeout.py --only budgets scaling

Run on an IDLE box (the budgets/cards are checked-in ceilings). The
final block is machine-parsed-looking on purpose: paste it into
STATUS.md verbatim so the close-out numbers are this script's output,
not prose."""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

STEPS = ["verify001", "verify01", "budgets", "scaling", "parallel", "pytest"]


def _run(name: str, cmd: list[str], env: dict | None = None) -> tuple[str, float]:
    print(f"== closeout step: {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    proc = subprocess.run(
        cmd, cwd=HERE, env=e, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    dur = time.time() - t0
    tail = "\n".join(proc.stdout.strip().split("\n")[-6:])
    print(tail, flush=True)
    if proc.returncode != 0:
        print(f"!! {name} FAILED (rc={proc.returncode}) after {dur:.0f}s")
        sys.exit(proc.returncode)
    print(f"== {name} done in {dur:.0f}s", flush=True)
    return proc.stdout, dur


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[], choices=STEPS)
    ap.add_argument("--only", nargs="*", default=None, choices=STEPS)
    args = ap.parse_args()
    todo = [
        s for s in STEPS
        if (args.only is None or s in args.only) and s not in args.skip
    ]
    print(f"# closeout steps: {todo}")
    print(f"# loadavg_1m at start: {os.getloadavg()[0]:.2f}")
    summary: dict[str, str] = {}

    if "verify001" in todo:
        out, dur = _run(
            "verify 0.01", [sys.executable, "verify_driver.py", "--all"]
        )
        summary["verify_sf0.01"] = out.strip().split("\n")[-1] + f" ({dur:.0f}s)"
    if "verify01" in todo:
        out, dur = _run(
            "verify 0.1",
            [sys.executable, "verify_driver.py", "--all",
             "--sf-dir", "/root/testdata/sf0.1"],
        )
        summary["verify_sf0.1"] = out.strip().split("\n")[-1] + f" ({dur:.0f}s)"
    if "budgets" in todo:
        out, dur = _run(
            "budgets", [sys.executable, "bench.py", "--write-budgets"]
        )
        summary["bench_budgets"] = out.strip().split("\n")[-1] + f" ({dur:.0f}s)"
    if "scaling" in todo:
        out, dur = _run("scaling", [sys.executable, "scaling_card.py"])
        summary["scaling_card"] = out.strip().split("\n")[-1] + f" ({dur:.0f}s)"
    if "parallel" in todo:
        out, dur = _run("parallel", [sys.executable, "parallel_card.py"])
        summary["parallel_card"] = out.strip().split("\n")[-1] + f" ({dur:.0f}s)"
    if "pytest" in todo:
        out, dur = _run(
            "pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]
        )
        # pytest orders the summary counts by status (failures first),
        # so parse each count independently instead of one ordered regex
        # — an ordered pattern would silently report 0 failed.
        mp = re.search(r"(\d+) passed", out)
        ms = re.search(r"(\d+) skipped", out)
        mf = re.search(r"(\d+) failed", out)
        summary["pytest"] = (
            f"{mp.group(1)} passed / {ms.group(1) if ms else 0} skipped / "
            f"{mf.group(1) if mf else 0} failed ({dur:.0f}s)"
            if mp
            else f"UNPARSED ({dur:.0f}s)"
        )

    from polkadot_etl_spark.queries import QUERIES

    # Artifact-derived keys: read back the files this run regenerated so
    # the pasted block can never drift from the committed artifacts —
    # tests/test_status_numbers.py asserts these very lines against the
    # files (the r12 verdict's "STATUS quotes one sitting, the committed
    # artifact carries another" class).
    import json

    print("\n==== CLOSEOUT SUMMARY (paste into STATUS.md verbatim, inside")
    print("==== a ```closeout fence — test_status_numbers.py checks it) ====")
    print("```closeout")
    print(f"registry_queries: {len(QUERIES)}")
    detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
    if os.path.exists(detail_path):
        det = json.load(open(detail_path))
        print(f"bench_total_s: {det['value']}")
        print(f"bench_sf: {det['sf']}")
        print(f"box_speed_nt_detail: {det['box_speed_nt']}")
    budgets_path = os.path.join(HERE, "BENCH_BUDGETS.json")
    if os.path.exists(budgets_path):
        bud = json.load(open(budgets_path))
        print(f"box_speed_nt_budgets: {bud['box_speed']['box_speed_nt']}")
        print(f"budget_queries: {len(bud['budgets'])}")
    for k, v in summary.items():
        print(f"{k}: {v}")
    print(f"loadavg_1m_end: {os.getloadavg()[0]:.2f}")
    print("```")


if __name__ == "__main__":
    main()
