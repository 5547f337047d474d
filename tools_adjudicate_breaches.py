"""One-shot idle-box adjudication of bench-budget breaches (r9 verdict
task #2): min-of-5 noop-sink timing at sf0.1 for the seven r9
`over_budget` rows, printed against their checked-in budgets. Run on an
idle box; the verdict-prescribed protocol that exonerated the r8 pair.
Results are recorded in STATUS.md (not a committed artifact — delete or
keep as the round's adjudication script)."""

from __future__ import annotations

import os
import time

BREACHES = [
    "paragraph_dedup_rewrite",
    "pq_quantize_embeddings",
    "semdedup_prune",
    "simhash_fingerprints",
    "snapshots_assethub_stablecoins",
    "snapshots_dappstaking_v3",
    "snapshots_hydradx_omnipool",
]


def main() -> None:
    import json
    import sys

    from polkadot_etl_spark.queries import QUERIES
    from polkadot_etl_spark.session import get_spark

    global BREACHES
    if len(sys.argv) > 1:
        BREACHES = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="polkadot-etl-spark-adjudicate")
    print(f"# loadavg_1m at start: {os.getloadavg()[0]:.2f}")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(32).repartition(32).select(_warm("id")).collect()

    budgets = json.load(open("BENCH_BUDGETS.json"))["budgets"]
    for name in BREACHES:
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        m = min(times)
        b = budgets.get(name, float("nan"))
        verdict = "UNDER (phantom)" if m <= b else "OVER (real)"
        print(
            f"{name}: min-of-5={m:.3f}s budget={b:.2f}s {verdict} "
            f"(iters: {', '.join(f'{t:.3f}' for t in times)})"
        )


if __name__ == "__main__":
    main()
