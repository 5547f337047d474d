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
    engine-reproducible.

    Scale note (measured, Spark 4): because the rank filter is a
    ``row_number() <= n`` predicate, Catalyst's rank-limit pushdown
    (SPARK-37099) inserts a PARTIAL ``WindowGroupLimit`` below the
    exchange — every input partition pre-keeps only its local top-``n``
    per group before any shuffle, and the final window task per group
    processes at most ``n × input_partitions`` survivors.  That is
    exactly the hand-rolled salted "two-phase top-N" — for free, with
    one fewer Exchange — so even a LOW-cardinality group column (the
    15-metric ``addressTopN`` shape) never puts a group's full row set
    in one task.  ``tests/test_plan_quality.py`` pins the
    ``WindowGroupLimit`` pair in the plan; don't replace this with a
    manual salt stage.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= n)
