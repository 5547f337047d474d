"""Top-N per group — the reference's precomputed ``addressTopN`` rank
tables (SURVEY A11/T3; polkaholic.sql:89-104, query.js:4349-4427).

One window rank per metric; at scale this is a single shuffle on the
partition keys. For global top-N (no partition key) prefer
``orderBy(...).limit(n)`` which Spark executes as a distributed
TakeOrdered — no full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_n_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top ``n`` rows per group. ``order_by`` must include a
    unique tie-break column so the selection is total-ordered and
    engine-reproducible."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= n)
