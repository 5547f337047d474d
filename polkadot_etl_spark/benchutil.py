"""Shared measurement discipline for the three timing tools (bench.py,
scaling_card.py, tools_adjudicate_breaches.py) — ONE definition of the
warmup and the min-of-N noop-sink loop, so a future fix to either cannot
leave the tools silently measuring under different rules (r10
self-review finding: the idiom had been copy-pasted three times).

The discipline (bench.py's, unchanged):
- warmup: one parquet-footer read + one Arrow/pandas-UDF wave, so the
  first measured query absorbs neither JVM/session startup nor the
  one-time Python-worker fork (~2 s);
- timing: full materialization through the NOOP sink (every output
  column computed, no rows to the driver — `.count()` lets Catalyst
  legally eliminate the expensive stages, measured in r4);
- iterations: ``base_iters`` runs, plus one extra when the min is
  sub-second (scheduler noise dominates there); the MIN is the
  statistic;
- hygiene: gc.collect() after each query releases the built DataFrames'
  py4j refs promptly so localCheckpoint blocks from checkpoint-heavy
  queries get ContextCleaner'd instead of pressuring later queries.
"""

from __future__ import annotations

import gc
import time

from pyspark.sql import DataFrame, SparkSession

# The iteration constants, exported so sidecar metadata (bench.py) can
# reference the ACTUAL behavior instead of hardcoding literals that a
# future change here would silently falsify (r10 ADVICE note).
BASE_ITERS = 2
EXTRA_BELOW = 1.0
AGG = "min"


def warm_session(spark: SparkSession, sf_dir: str) -> None:
    """Parquet-footer + Arrow-worker warmup (see module doc)."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which the pandas_udf hint inference can't read
    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(32).repartition(32).select(_warm("id")).collect()


def time_noop_min(
    build,
    spark: SparkSession,
    sf_dir: str,
    base_iters: int = BASE_ITERS,
    extra_below: float = EXTRA_BELOW,
) -> list[float]:
    """Run ``build(spark, sf_dir)`` through the noop sink ``base_iters``
    times (+1 when the min lands under ``extra_below`` seconds) and
    return the per-iteration wall times. Callers take min()."""
    times: list[float] = []
    for _ in range(base_iters):
        t0 = time.perf_counter()
        df: DataFrame = build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    if extra_below and min(times) < extra_below:
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    gc.collect()
    return times
