"""Benchmark runner: executes every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
SHORT final JSON line (total wall-clock only).  The full per-query map is
written as a sidecar to BENCH_DETAIL.json next to this file — the harness
truncates long stdout lines, so the final line must stay small.

Each query is fully materialized via a count-ish action (collect on the
already-aggregated result) so the measured time includes the whole plan,
not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

from polkadot_etl_spark.queries import QUERIES
from polkadot_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="polkadot-etl-spark-bench")

    # JVM + parquet-footer warmup so q1 doesn't absorb session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    # Arrow + python-worker-pool warmup so the first pandas-UDF query
    # doesn't absorb the one-time worker fork/Arrow init (~2 s).
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415
    from pyspark.sql.functions import PandasUDFType  # noqa: PLC0415

    # no type hints: __future__ annotations stringifies them, which the
    # pandas_udf hint inference can't read
    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(32).repartition(32).select(_warm("id")).collect()

    per_query: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in sorted(QUERIES):
        spec = QUERIES[name]
        if not spec.bench:
            continue
        t0 = time.perf_counter()
        n = spec.build(spark, sf_dir).count()
        per_query[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {per_query[name]:.3f}s rows={n}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    # Sidecar carries the full per-query breakdown (too long for one stdout
    # line without the harness truncating it).
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "total wall-clock for registry queries",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "queries": per_query,
            },
            fh,
            indent=1,
        )
        fh.write("\n")

    # Final stdout line: short enough to never be truncated, valid JSON.
    print(
        json.dumps(
            {
                "metric": "total wall-clock for registry queries",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(per_query),
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
