"""STATUS.md's close-out numbers must BE the committed artifacts' —
the drift class the r12 verdict flagged (prose quoting one sitting
while the committed artifact carries another) fails here instead of
waiting for a judge.

The contract: every round's close-out pastes `tools_closeout.py`'s
final summary VERBATIM into STATUS.md inside a ```closeout fence; this
module parses the LAST fence and asserts every artifact-derived key
equals the value in the committed artifact files / live registry. A
round that regenerates artifacts without re-pasting the block — or
pastes a block from a different sitting — goes red immediately.
"""

from __future__ import annotations

import json
import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _last_closeout_block() -> dict[str, str]:
    status = (ROOT / "STATUS.md").read_text()
    # line-anchored: prose may MENTION the fence inline; only a fence
    # opening at column 0 is the block itself
    blocks = re.findall(r"^```closeout\n(.*?)^```$", status, re.S | re.M)
    assert blocks, (
        "STATUS.md must carry the latest tools_closeout.py summary "
        "verbatim inside a ```closeout fence"
    )
    kv: dict[str, str] = {}
    for line in blocks[-1].strip().splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            kv[k.strip()] = v.strip()
    return kv


def test_status_closeout_registry_size_is_live():
    kv = _last_closeout_block()
    from polkadot_etl_spark.queries import QUERIES

    assert int(kv["registry_queries"]) == len(QUERIES), (
        "STATUS's close-out block predates the current registry — "
        "re-run tools_closeout.py and re-paste its summary"
    )


def test_status_closeout_bench_numbers_match_artifacts():
    kv = _last_closeout_block()
    det = json.loads((ROOT / "BENCH_DETAIL.json").read_text())
    assert float(kv["bench_total_s"]) == det["value"], (
        kv["bench_total_s"],
        det["value"],
    )
    assert float(kv["bench_sf"]) == det["sf"]
    assert int(kv["box_speed_nt_detail"]) == det["box_speed_nt"]
    bud = json.loads((ROOT / "BENCH_BUDGETS.json").read_text())
    assert int(kv["box_speed_nt_budgets"]) == bud["box_speed"]["box_speed_nt"]
    assert int(kv["budget_queries"]) == len(bud["budgets"])


def test_status_closeout_pytest_line_green_and_verify_lines_sized():
    """The pasted pytest line must be a zero-skip zero-fail run, and any
    verify lines the block carries must count the full registry."""
    kv = _last_closeout_block()
    from polkadot_etl_spark.queries import QUERIES

    m = re.search(r"(\d+) passed / (\d+) skipped / (\d+) failed", kv["pytest"])
    assert m, kv["pytest"]
    assert m.group(2) == "0" and m.group(3) == "0", kv["pytest"]
    for key in ("verify_sf0.01", "verify_sf0.1"):
        if key in kv:
            vm = re.search(r"(\d+) queries in [\d.]+s .*ALL PASS", kv[key])
            assert vm, kv[key]
            assert int(vm.group(1)) == len(QUERIES), kv[key]
