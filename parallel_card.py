"""Parallelism card — the LAST unmeasured axis of the 100 TB story
(r10 verdict task #3, complementing SCALING.json's data-growth card).

SCALING.json measures wall-clock growth vs DATA; nothing measured
whether each query's work actually PARALLELIZES. Every driver-side
iterative loop in the registry (kmeans, pagerank, BPE rounds, the eager
query-dim collects) is *bounded*, but a driver-serialized stage would be
invisible to the data-growth exponent: it grows with data AND runs on
one core no matter how many the cluster has.

Instrument choice (and the measurement lesson baked into this file's
history): the first cut timed the whole registry under three separate
local[8]/local[16]/local[32] driver JVMs and fitted wall-clock speedup —
and its own probe controls REFUTED it: at MB-fixture scale, cross-JVM
wall-clock is dominated by scheduling/AQE/JIT differences (the
deliberately-serial probe read speedup 2.0; the parallel probe read an
impossible 16.6x), so "expensive and flat" would have flagged half the
registry for reasons that have nothing to do with driver serialization.
The property we actually care about is direct and measurable in ONE
session: ACHIEVED CONCURRENCY = (process-tree CPU time consumed by the
driver + JVM + Python workers) / wall-clock. A driver-serialized query
cannot exceed ~1 no matter the box; genuinely distributed work on
local[32] reads well above it. No cross-JVM comparison, no AQE/JIT
confound; idle-wait (streaming checkpoint latency) correctly reads
LOW and is documented, not excused.

Per bench-enabled query at sf0.1 on local[32]: wall (min-of-2 noop-sink
discipline) + tree-CPU delta per iteration; concurrency = max over
iterations of cpu/wall (max: a serialized query cannot fake a high
reading in ANY iteration, while a healthy query's first iteration may
be scan-bound). Flag = wall >= MIN_FLAG_SECONDS (cheap queries carry no
signal) AND concurrency <= FLAG_CONCURRENCY_BELOW, excluding the
documented EXPECTED_DRIVER_BOUND set (each entry justified; the pytest
pins flagged == the measured fixture-granularity trio EXACTLY and
unexplained == [], mirroring the scaling card's ratchet — a new flag
fails the suite even if someone pre-adds an allowlist entry).

Detector sensitivity is MEASURED, not assumed: a deliberately
serialized probe (a heavy row-local fold forced into ONE post-shuffle
partition) must flag, and the identical fold spread over 64 partitions
must read high concurrency — the positive and negative controls for the
whole card.

Usage:
    python parallel_card.py           # measure + fit, writes PARALLEL.json
    python parallel_card.py --refit   # re-fit from .parallel_raw.json
                                      # (after a threshold/allowlist edit)
Run on an idle box (co-tenant CPU inflates the tree only if it is OUR
tree, but contention stretches wall and DEFLATES concurrency — phantom
flags); ~10-12 min for the full registry.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

SF_DIR = "/root/testdata/sf0.1"
MIN_FLAG_SECONDS = 2.0  # flag-eligible only when wall is above this
FLAG_CONCURRENCY_BELOW = 1.3  # <=1.3 cores busy on a 32-core box is "serial"
PROBE_PAR_MIN = 8.0  # the 64-partition probe must achieve at least this

# The documented expensive-and-serial exceptions. Every entry is a query
# whose wall-clock is dominated by work that MORE CORES cannot touch,
# with the justification; anything else that flags fails the pytest.
# NOTE: tests/test_parallel_card.py pins the flagged set EXACTLY (the
# measured fixture-granularity trio), so adding an entry here cannot
# silently excuse a newly-serialized query — the strict pin must be
# consciously updated too. The rest of this list documents which
# queries are ALLOWED to flag if a future box/SF regime shifts their
# profile (the unexplained == [] gate would then be the operative one).
EXPECTED_DRIVER_BOUND = {
    "streaming_dump_replay": "3 structured-streaming micro-batches with "
    "checkpoint round-trips; the wall is harness IDLE latency (commit-log "
    "fsyncs, trigger scheduling), not CPU — the BENCH_DETAIL stage split "
    "attributes it (stream_harness ~4x dump_compose)",
    "streaming_corpus_replay": "same micro-batch harness latency class "
    "(3-batch replay through applyInPandasWithState)",
    "streaming_neardedup_replay": "same micro-batch harness latency class",
    "corpus_daily_increment_replay": "composes the 4-wave streaming replay "
    "harness plus two bounded kmeans training loops over a 250-doc slice",
    "ann_ivf_incremental_maintenance": "bounded-driver-state kmeans "
    "training loop over the standing corpus; each round is one small "
    "job + an O(k x dims) collect — latency-bound at fixture scale",
    "embedding_abtt_isotropy_delta": "power-iteration direction training "
    "+ four bounded collect rounds; per-round work is one 500-row pass",
    "merge_upsert_state": "real parquet write/read-back round-trips "
    "(bootstrap + merge + replay) — commit-protocol latency, not CPU",
    "dune_csv_roundtrip": "real CSV write + read-back round trip; "
    "commit-protocol latency on a dim-scale file",
    "work_queue_backoff": "50-row work queue fixture: wall is fixed "
    "scheduling latency across many tiny stages",
    "token_metadata_maintenance": "real partitioned-parquet maintenance "
    "writes (newer-block gate + NFT upsert) — commit latency",
    "assethub_price_log": "tiny Dune-CSV fixture through a real file "
    "write/read round trip — commit latency",
    "ivf_centroid_update": "one literal-seed assignment + exact-decimal "
    "means over 500 vectors; sub-second jobs, latency-bound",
    "ss58_codec_roundtrip": "100-row literal-VALUES fixture; wall is "
    "per-stage scheduling floor",
    # --- (r14 note: the r11 "fixture-granularity class" — map-only
    # plans serialized by the single-row-group test parquet — emptied
    # out once the r13 keyed scan fan-outs landed: evm_decoded_transfers,
    # ann_sketch_prefilter, hard_negative_mining, ann_pq_adc_search and
    # ann_ivfpq_residual_search now measure 3.5-15x concurrent in
    # .parallel_raw.json, so their stale zero-shuffle/single-task
    # justifications are gone with them; the fan-outs themselves are
    # split-count-gated in sources/tables.fan_out_scan.)
    # --- borderline band (measured 1.4-2.0, within noise of the 1.3
    # line): bounded driver-loop rounds or map-heavy single-row-group
    # legs; documented so a noisy regen cannot churn the ratchet
    "kmeans_corpus_clusters": "bounded Lloyd rounds: each a small job + "
    "O(k x dims) collect (measured 1.39)",
    "paragraph_dedup_rewrite": "row-local CDC chunking in one Generate "
    "task over the single-row-group documents file before the 16-byte "
    "hash shuffles (measured 1.50)",
    "cdc_chunk_dedup": "same single-task chunking leg (measured 1.90)",
    "dedup_clusters": "connected-components propagation rounds: bounded "
    "driver loop of small jobs (measured 2.00)",
}


def _tree_cpu_seconds() -> float:
    """utime+stime of THIS process and every live descendant (the
    driver, the JVM, the pyspark worker pool), in seconds. /proc walk —
    no psutil in the environment. CPU of already-exited short-lived
    children is lost, which UNDER-counts concurrency slightly — the
    safe direction for a detector whose flag condition is 'too low'
    would be over-counting, so note: the pyspark worker pool is
    persistent (reuse on), and executor threads live in the one JVM, so
    the loss is negligible here."""
    tck = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    procs: dict[int, tuple[int, int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as fh:
                st = fh.read().decode("ascii", "replace")
        except OSError:
            continue
        rp = st.rindex(")")
        fields = st[rp + 2 :].split()
        procs[int(pid)] = (int(fields[1]), int(fields[11]) + int(fields[12]))
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack, seen = 0, [me], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        total += procs[p][1]
        stack.extend(kids.get(p, []))
    return total / tck


def _measure(build, spark, sf_dir: str, base_iters: int = 2) -> dict:
    """bench.py's min-of-2 noop-sink discipline, plus a tree-CPU delta
    per iteration. Returns wall (min), and concurrency (max over
    iterations of cpu/wall)."""
    import gc

    walls: list[float] = []
    concs: list[float] = []

    def one() -> None:
        c0, t0 = _tree_cpu_seconds(), time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        cpu = _tree_cpu_seconds() - c0
        walls.append(wall)
        concs.append(cpu / max(wall, 1e-3))

    for _ in range(base_iters):
        one()
    if min(walls) < 1.0:
        one()
    gc.collect()
    return {
        "wall": round(min(walls), 3),
        "concurrency": round(max(concs), 2),
    }


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    raw_path = os.path.join(here, ".parallel_raw.json")
    refit = "--refit" in sys.argv

    if not refit:
        load_start = round(os.getloadavg()[0], 2)
        from pyspark.sql import functions as F

        from polkadot_etl_spark.benchutil import warm_session
        from polkadot_etl_spark.queries import QUERIES
        from polkadot_etl_spark.session import get_spark

        spark = get_spark(app_name="polkadot-etl-spark-parallel")
        warm_session(spark, SF_DIR)

        # the heavy row-local fold both probes share — pure executor
        # CPU; the ONLY variable between the probes is task layout.
        # Sized (~23 s single-task) so the JVM's background CPU (GC/JIT,
        # measured ~2.5 cpu-s around a short job) dilutes below the flag
        # threshold for the serial control: at a 3.7 s wall the same
        # probe read concurrency 1.66 — background, not parallelism.
        heavy = F.expr(
            "aggregate(sequence(1, 600), 0L,"
            " (acc, x) -> acc + (x * l_orderkey) % 997)"
        )

        def _probe(n_parts: int):
            def build(spark_, d):
                li = spark_.read.parquet(f"{d}/lineitem.parquet").select(
                    "l_orderkey"
                )
                return (
                    li.repartition(n_parts)
                    .select(heavy.alias("h"))
                    .agg(F.sum("h").alias("s"))
                )

            return build

        raw: dict = {"queries": {}, "loadavg_1m_start": load_start}
        for name in sorted(QUERIES):
            spec = QUERIES[name]
            if not spec.bench:
                continue
            m = _measure(spec.build, spark, SF_DIR)
            raw["queries"][name] = m
            print(
                f"# {name}: wall={m['wall']:.3f}s conc={m['concurrency']:.2f}",
                file=sys.stderr,
            )
        # Phantom-flag guard (same class as benchutil's box-speed stamp
        # and the box-probe retry): a co-tenant burst inflates wall
        # while OUR process-tree CPU stays put, so a borderline query
        # crosses MIN_FLAG_SECONDS with concurrency under the line and
        # flags spuriously (measured: domain_pagerank and
        # lag_change_detection each flagged exactly once across loaded
        # sittings, at walls a hair over 2.0 s). Re-measure every
        # would-be flag that is NOT already documented driver-bound, up
        # to twice: a genuinely serialized query flags on every attempt
        # (best wall stays high, best concurrency low); a burst
        # artifact clears on a quieter re-run. min-wall/max-concurrency
        # merging matches _measure's own min/max discipline.
        def _would_flag(m: dict) -> bool:
            return (
                m["wall"] >= MIN_FLAG_SECONDS
                and m["concurrency"] <= FLAG_CONCURRENCY_BELOW
            )

        for name in sorted(raw["queries"]):
            m = raw["queries"][name]
            if name in EXPECTED_DRIVER_BOUND or not _would_flag(m):
                continue
            for _ in range(2):
                m2 = _measure(QUERIES[name].build, spark, SF_DIR)
                m = {
                    "wall": round(min(m["wall"], m2["wall"]), 3),
                    "concurrency": round(
                        max(m["concurrency"], m2["concurrency"]), 2
                    ),
                }
                if not _would_flag(m):
                    break
            raw["queries"][name] = m
            print(
                f"# re-probed {name}: wall={m['wall']:.3f}s"
                f" conc={m['concurrency']:.2f}",
                file=sys.stderr,
            )
        raw["probes"] = {
            "serial": _measure(_probe(1), spark, SF_DIR),
            "parallel": _measure(_probe(64), spark, SF_DIR),
        }
        raw["loadavg_1m_end"] = round(os.getloadavg()[0], 2)
        print(f"# probes: {raw['probes']}", file=sys.stderr)
        with open(raw_path, "w") as fh:
            json.dump(raw, fh)
    else:
        with open(raw_path) as fh:
            raw = json.load(fh)

    flagged = []
    out_queries = {}
    for name, m in sorted(raw["queries"].items()):
        is_flagged = (
            m["wall"] >= MIN_FLAG_SECONDS
            and m["concurrency"] <= FLAG_CONCURRENCY_BELOW
        )
        if is_flagged:
            flagged.append(name)
        out_queries[name] = {**m, "flagged": is_flagged}
    unexplained = sorted(set(flagged) - set(EXPECTED_DRIVER_BOUND))
    ps, pp = raw["probes"]["serial"], raw["probes"]["parallel"]
    doc = {
        "metric": "achieved concurrency = process-tree CPU / wall on local[32]",
        "sf_dir": SF_DIR,
        "min_flag_seconds": MIN_FLAG_SECONDS,
        "flag_concurrency_below": FLAG_CONCURRENCY_BELOW,
        "harness_sha256_16": hashlib.sha256(
            open(os.path.abspath(__file__), "rb").read()
        ).hexdigest()[:16],
        "loadavg_1m_start": raw["loadavg_1m_start"],
        "loadavg_1m_end": raw["loadavg_1m_end"],
        "flagged": sorted(flagged),
        "unexplained": unexplained,
        "expected_driver_bound": EXPECTED_DRIVER_BOUND,
        "probes": {
            "serial": {
                **ps,
                # the single-partition probe must read as expensive-and-
                # serial by the card's own rule, or flagged=[] is vacuous
                "detects_serial": ps["wall"] >= MIN_FLAG_SECONDS
                and ps["concurrency"] <= FLAG_CONCURRENCY_BELOW,
            },
            "parallel": {
                **pp,
                # the identical work over 64 partitions must achieve real
                # concurrency — proof the instrument can see parallelism
                "shows_parallelism": pp["concurrency"] >= PROBE_PAR_MIN,
            },
        },
        "queries": out_queries,
    }
    path = os.path.join(here, "PARALLEL.json")
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "flagged": sorted(flagged),
                "unexplained": unexplained,
                "probe_serial_detects": doc["probes"]["serial"]["detects_serial"],
                "probe_parallel_concurrency": pp["concurrency"],
                "n_queries": len(out_queries),
                "detail": "PARALLEL.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
