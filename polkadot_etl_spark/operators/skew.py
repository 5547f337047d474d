"""Skew-mitigation operators: salted aggregation and salted broadcast-side
explosion for hot keys.

The reference's data has pathological key skew (a handful of exchange
hot wallets dominate transfer counts; system accounts dominate events —
the addressTopN tables exist precisely because of them). AQE's skew-join
splitting (enabled in session.py) handles most of it at runtime; these
operators are the explicit form for the two cases AQE can't fix:

- a grouped aggregation where one key owns a whole partition
  (salted_agg: two-level partial aggregation through a random salt)
- a shuffle join where ONE side's hot keys must be split and the other
  side replicated per salt (salted_join)

Both are deterministic in RESULT (the salt only routes rows; the final
combine removes it) — safe for the oracle-checked surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform routing salt derived from a repeatable per-row random —
    spark's rand(seed) is deterministic per (seed, partition, row
    position), which is stable for routing (any distribution works: the
    salt never reaches the result)."""
    return df.withColumn(col_name, (F.rand(seed=7) * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-level aggregation through a salt: groupBy(keys + salt) runs the
    partial agg (splitting a hot key over `buckets` reducers), then
    groupBy(keys) combines.

    ``aggs`` maps output name → (partial_agg_expr, combine_expr_over_partial).
    e.g. {"n": (F.count(F.lit(1)), F.sum("n")),
          "total": (F.sum(F.col("x").cast("decimal(38,10)")), F.sum("total"))}
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[combine.alias(name) for name, (_, combine) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key shuffle join: salt the fact side, explode the dim side once
    per salt value, join on (keys + salt). The dim is replicated
    `buckets`× — use only when dim is small-ish but above the broadcast
    threshold, or when specific fact keys overwhelm single reducers."""
    f = with_salt(fact, buckets)
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = f.join(d, [*on, "__salt"], how)
    return out.drop("__salt")
