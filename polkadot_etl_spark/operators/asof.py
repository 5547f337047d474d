"""As-of (point-in-time) join.

The reference does this three ways, all with driver-side binary search over
in-memory sorted arrays (SURVEY J3/J4/J5):
- price at timestamp: assetManager.js:1392-1534 (computePriceUSD, binary
  search at :1479)
- spec_version at block: polkaholicDB.js:322-333
- block at timestamp: query.js:4290-4308

Spark has no native ASOF JOIN, and a naive range-join (l.ts >= r.ts →
latest) is an O(n·m) explosion at 100 TB. The scalable pattern used here is
**union + last-over-window**:

    union(left-tagged, right-tagged) → Window.partitionBy(keys)
        .orderBy(ts, side).rowsBetween(unboundedPreceding, current)
        → last(value, ignorenulls=True) → filter side == left

Cost: ONE shuffle of (left + right) on the join keys and a sort within
partitions — the same cost profile as a sort-merge join, with no
cross-product risk. Skewed keys are handled by AQE; for a genuinely huge
right side, pre-aggregate right to one row per (key, ts) first (done here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the value columns of the latest right row
    with ``right.ts <= left.ts`` (``<`` if strict) within the same ``by``
    group. Right rows sharing (by, ts) are deterministically reduced to the
    max struct of value_cols first (total order → reproducible output).

    Returns all left columns plus ``value_cols`` (null when no prior right
    row exists).
    """
    # Deterministic per-(key, ts) reduction of the right side.
    r = (
        right.groupBy(*by, F.col(right_ts).alias("__ts"))
        .agg(F.max(F.struct(*[F.col(c) for c in value_cols])).alias("__v"))
        .select(*by, "__ts", *[F.col(f"__v.{c}").alias(f"__r_{c}") for c in value_cols])
    )

    left_cols = left.columns
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(dict(r.dtypes)[f"__r_{c}"]))
    r_tagged = r.withColumn("__side", F.lit(0))
    for c in left_cols:
        if c not in by and c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.select(*left_cols, "__ts", "__side", *[f"__r_{c}" for c in value_cols]).unionByName(
        r_tagged.select(*left_cols, "__ts", "__side", *[f"__r_{c}" for c in value_cols]),
        allowMissingColumns=False,
    )

    # side=0 (right) sorts before side=1 (left) at equal ts → inclusive
    # as-of; strict flips the order so same-ts right rows are excluded.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        "__side",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.where(F.col("__side") == 1).drop("__side")
