"""Storage-trace analytics: the LAG change-detection views the reference
ships as product SQL (docs/AccountAnalytics.md:34-140 — reservereference0 /
accountreference0): flag rows where an address's reserved balance or
consumers/providers/sufficients counters changed, and link each change to
the previous change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def account_change_events(traces: DataFrame) -> DataFrame:
    """W1: per-address ordered diff detection over System.Account traces.

    Ordering is (block_number, intra-block trace index) where the index is
    split out of trace_id "{bn}-{idx}" — exactly the published views'
    ORDER BY. Two LAG levels: previous observation (change flag), then
    previous *change* (chain of custody), via a second window over changed
    rows only.
    """
    t = (
        traces.where((F.col("section") == "System") & (F.col("storage") == "Account"))
        .withColumn("t_index", F.split(F.col("trace_id"), "-").getItem(1).cast("int"))
        .withColumn("consumers", F.get_json_object("pv", "$.consumers").cast("int"))
        .withColumn("providers", F.get_json_object("pv", "$.providers").cast("int"))
        .withColumn("sufficients", F.get_json_object("pv", "$.sufficients").cast("int"))
    )
    w = Window.partitionBy("address_pubkey").orderBy(
        F.col("block_number").asc(), F.col("t_index").asc()
    )
    lagged = t.select(
        "address_pubkey",
        "address_ss58",
        "trace_id",
        "block_number",
        "t_index",
        "ts",
        "reserved",
        "frozen",
        "consumers",
        "providers",
        "sufficients",
        F.lag("reserved").over(w).alias("prev_reserved"),
        F.lag("frozen").over(w).alias("prev_frozen"),
        F.lag("consumers").over(w).alias("prev_consumers"),
        F.lag("providers").over(w).alias("prev_providers"),
        F.lag("sufficients").over(w).alias("prev_sufficients"),
    )
    changed = lagged.withColumn(
        "is_change",
        F.col("prev_reserved").isNull()
        | (F.col("reserved") != F.col("prev_reserved"))
        | (F.col("frozen") != F.col("prev_frozen"))
        | (F.col("consumers") != F.col("prev_consumers"))
        | (F.col("providers") != F.col("prev_providers"))
        | (F.col("sufficients") != F.col("prev_sufficients")),
    ).where(F.col("is_change"))
    w2 = Window.partitionBy("address_pubkey").orderBy(
        F.col("block_number").asc(), F.col("t_index").asc()
    )
    return changed.withColumn("prev_change_trace_id", F.lag("trace_id").over(w2)).drop(
        "is_change"
    )
