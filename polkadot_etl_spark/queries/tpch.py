"""Headline relational queries (TPC-H-shaped) over the synthetic tables.

These are the generic scan→filter→join→agg→sort pipelines that every
reference ETL job reduces to (SURVEY §3.1: the daily dump is
scan→decorate→aggregate). They double as the bench.py headliners.

Scale notes: group-by aggregations run partial→final (map-side combine);
dimension joins (region/nation/customer) are broadcast — verified via
.explain("formatted") showing BroadcastHashJoin with no shuffle of the
fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polkadot_etl_spark.queries.fmt import d_decsum, s_date, s_dbl
from polkadot_etl_spark.queries.registry import query
from polkadot_etl_spark.sources.tables import load_table


def _decsum(c) -> F.Column:
    """Exact (associative) decimal sum emitted as double — see fmt.py."""
    return F.sum(c.cast("decimal(38,10)")).cast("double")


@query(
    "tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {d_decsum('l_quantity')}                                       AS sum_qty,
       {d_decsum('l_extendedprice')}                                  AS sum_base_price,
       {d_decsum('l_extendedprice * (1 - l_discount)')}               AS sum_disc_price,
       {d_decsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {d_decsum('l_quantity')} / COUNT(*)      AS avg_qty,
       {d_decsum('l_extendedprice')} / COUNT(*) AS avg_price,
       {d_decsum('l_discount')} / COUNT(*)      AS avg_disc,
       COUNT(*)                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary — the A1 grouped-agg class (reference "
    "update_blocklog, substrateetl.js:9369-9428) on the biggest fact table.",
    tags=("agg", "headline"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _decsum(F.col("l_quantity")).alias("sum_qty"),
        _decsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _decsum(disc_price).alias("sum_disc_price"),
        _decsum(charge).alias("sum_charge"),
        # avg = exact-decimal-sum ÷ count: one IEEE division on identical
        # operands in both engines — no ROUND boundary hazard.
        (_decsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        (_decsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
        (_decsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "tpch_q3",
    oracle=f"""
SELECT l.l_orderkey,
       {d_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-30'
  AND l.l_shipdate  > TIMESTAMP '1998-06-30'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,10))) DESC,
         o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
""",
    doc="TPC-H Q3 shipping priority — multi-join + agg + total-ordered "
    "top-k (reference T1 list APIs, query.js:1530-1532).",
    tags=("join", "topk", "headline"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-06-30"))
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-06-30"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)")).alias(
                "__rev"
            )
        )
        .orderBy(F.col("__rev").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            s_dbl(F.col("__rev")).alias("revenue"),
            s_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
    )


@query(
    "tpch_q5_regional_revenue",
    oracle=f"""
SELECT n.n_name,
       {d_decsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY n.n_name
""",
    doc="TPC-H Q5-shaped regional revenue — 5-way star join with broadcast "
    "dims (reference J12 dimension decoration, assetManager.js:1412-1448).",
    tags=("join", "agg", "headline"),
)
def tpch_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _decsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
