"""Band (interval/tolerance) join with deterministic tie-break — the XCM
message-matching operator (SURVEY J1/J2/W2).

Reference semantics (substrate/xcmmanager.js:417-497 + dedup :609-646):
source and dest observations join on equi keys (msgHash, chainID,
chainIDDest) with a band predicate 0 <= d.sentAt - s.sentAt <= 4, then
ORDER BY (diff, ts) and first-match-wins per source.

Spark-first shape: the equi keys make this a plain shuffle hash/sort-merge
join — the band is a cheap post-filter, NOT a cross product. The tie-break
is a rank-1 window. At 100 TB the join shuffles once on the equi keys;
skew on hot msgHash values is absorbed by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def band_join_best_match(
    source: DataFrame,
    dest: DataFrame,
    keys: list[str],
    source_ts: str,
    dest_ts: str,
    lower: int | float,
    upper: int | float,
    source_id: str,
    tie_break: list[str],
    dest_prefix: str = "d_",
) -> DataFrame:
    """Join source↔dest on ``keys`` where
    ``lower <= dest_ts - source_ts <= upper``; keep, per source row, the
    single best dest (smallest time diff, then ``tie_break`` columns of the
    dest side — must form a total order for reproducible output).

    Output: all source columns, dest columns prefixed ``dest_prefix``, and
    ``diff`` = dest_ts - source_ts.
    """
    d = dest.select([F.col(c).alias(f"{dest_prefix}{c}") for c in dest.columns])
    diff: Column = F.col(f"{dest_prefix}{dest_ts}") - F.col(source_ts)
    joined = source.join(d, on=[source[k] == d[f"{dest_prefix}{k}"] for k in keys], how="inner").where(
        diff.between(F.lit(lower), F.lit(upper))
    )
    joined = joined.withColumn("diff", diff)
    w = Window.partitionBy(source_id).orderBy(
        F.col("diff").asc(), *[F.col(f"{dest_prefix}{c}").asc() for c in tie_break]
    )
    return joined.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
