"""SURVEY §2 operator inventory — second tranche.

Covers the operator classes not yet in relational.py: the fuzzy
confidence-scored tolerance join (J2/T2), block-at-timestamp as-of
(J5), broadcast dimension decoration (J12), per-block partial stats
(A7), daily history series with running balance (W4), work-queue
selection with exponential backoff (T4), validity predicates (P6),
JSON field access (§2.8), and the recursive call-tree flatten UDTF
(F2). Docstrings cite the reference file:line each one mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polkadot_etl_spark.queries.fmt import d_date, d_decsum, d_ts, s_date, s_ts
from polkadot_etl_spark.queries.registry import query
from polkadot_etl_spark.sources.tables import load_table


def _decsum(c) -> F.Column:
    return F.sum(c.cast("decimal(38,10)")).cast("double")


@query(
    "fuzzy_confidence_match",
    oracle=f"""
WITH stats AS (
  SELECT user_id,
         COUNT(*) AS n,
         {d_decsum('value')} AS s1,
         {d_decsum('value * value')} AS s2
  FROM events WHERE event_type = 'click'
  GROUP BY user_id
),
spread AS (
  SELECT user_id,
         s1 / n AS avg_v,
         CASE WHEN n < 2 OR SQRT(GREATEST((s2 - s1*s1/n) / (n-1), 0.0)) = 0
              THEN GREATEST((s1 / n) * 0.2, 1e-9)
              ELSE SQRT(GREATEST((s2 - s1*s1/n) / (n-1), 0.0)) END AS std_v
  FROM stats
),
pairs AS (
  SELECT p.event_id AS purchase_id,
         c.event_id AS click_id,
         {d_ts('p.ts')} AS purchase_ts,
         p.user_id,
         CASE WHEN ABS(p.value - c.value) < 0.01 THEN 1.0
              ELSE 1.0 / (1.0 + ABS(p.value - c.value - s.avg_v) / s.std_v) END
           AS confidence
  FROM events p
  JOIN events c ON p.user_id = c.user_id
  JOIN spread s ON p.user_id = s.user_id
  WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    AND c.ts >= p.ts - INTERVAL 7200 SECONDS AND c.ts < p.ts
),
best AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY purchase_id
           ORDER BY confidence DESC, click_id ASC) AS rn
  FROM pairs
)
SELECT purchase_id, click_id, purchase_ts, user_id, confidence
FROM best WHERE rn = 1 AND confidence > 0.5
""",
    doc="J2+T2 fuzzy tolerance join with confidence score — the xcmCleaner "
    "transfer↔candidate match (reference xcmCleaner.js:569-700: candidate "
    "time window, exact amount → confidence 1, else z-score vs the "
    "per-group fee distribution with std=0→avg*0.2 fallback "
    "substrateetl.js:3201, keep best if > 0.5). Shuffle key is the "
    "composite (user_id, floor(epoch/7200)) — purchases probe their own "
    "and the previous 2h bucket, so a hot user cannot create a quadratic "
    "straggler task; the exact band is a post-filter on the bounded "
    "bucket pairs. Top-1 window has a total order so output is "
    "reproducible. Stats via exact decimal sums of x and x² — no "
    "Welford-order drift across engines.",
    tags=("join", "window"),
)
def fuzzy_confidence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click")
    stats = clicks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        _decsum(F.col("value")).alias("s1"),
        _decsum(F.col("value") * F.col("value")).alias("s2"),
    )
    raw_std = F.sqrt(
        F.greatest(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1),
            F.lit(0.0),
        )
    )
    spread = stats.select(
        F.col("user_id").alias("s_user_id"),
        (F.col("s1") / F.col("n")).alias("avg_v"),
        F.when((F.col("n") < 2) | (raw_std == 0), F.greatest((F.col("s1") / F.col("n")) * 0.2, F.lit(1e-9)))
        .otherwise(raw_std)
        .alias("std_v"),
    )
    # De-skew: the naive user_id equi-join materializes k·m pairs per hot
    # user BEFORE the 2h band filter — a straggler task when one address is
    # an exchange. Composite key (user_id, floor(epoch/7200)) instead: a
    # click in [p_ts - 7200s, p_ts) lives in time-bucket pb or pb-1 of the
    # purchase, so each purchase probes exactly those two buckets and the
    # per-task pair count is bounded by the per-2h-bucket density, not the
    # per-user lifetime count. Output identical; oracle unchanged.
    bucket_us = 7200 * 1_000_000
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "user_id",
        F.col("value").alias("p_value"),
        F.floor(F.unix_micros(F.col("ts")) / F.lit(bucket_us)).alias("pb"),
    )
    probe = p.withColumn("probe_bucket", F.explode(F.array(F.col("pb"), F.col("pb") - 1))).drop("pb")
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.col("user_id").alias("c_user_id"),
        F.col("value").alias("c_value"),
        F.floor(F.unix_micros(F.col("ts")) / F.lit(bucket_us)).alias("cb"),
    )
    pairs = (
        probe.join(c, (probe.user_id == c.c_user_id) & (probe.probe_bucket == c.cb))
        .where(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7200 SECONDS"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .drop("probe_bucket", "cb")
        # spread scales with distinct users — do NOT broadcast; it joins on
        # a user_id-prefixed key so AQE co-locates it (or broadcasts if it
        # measures it small).
        .join(spread, F.col("user_id") == spread.s_user_id)
    )
    confidence = F.when(F.abs(F.col("p_value") - F.col("c_value")) < 0.01, F.lit(1.0)).otherwise(
        F.lit(1.0)
        / (F.lit(1.0) + F.abs(F.col("p_value") - F.col("c_value") - F.col("avg_v")) / F.col("std_v"))
    )
    w = Window.partitionBy("purchase_id").orderBy(F.col("confidence").desc(), F.col("click_id").asc())
    return (
        pairs.withColumn("confidence", confidence)
        .withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("confidence") > 0.5))
        .select(
            "purchase_id",
            "click_id",
            s_ts("p_ts").alias("purchase_ts"),
            "user_id",
            "confidence",
        )
    )


@query(
    "block_at_timestamp",
    oracle=f"""
SELECT {d_date('ts')} AS probe_dt,
       MIN(event_id) AS first_event,
       MAX(event_id) AS last_event,
       COUNT(*) AS n_in_window
FROM events
WHERE epoch_us(ts) - epoch_us(date_trunc('day', ts)) < 60000000
GROUP BY {d_date('ts')}
""",
    doc="J5 block-at-timestamp as-of: getBlockNumberByTS finds the "
    "first/last block with blockDT in [ts, ts+60s] (reference "
    "query.js:4290-4308). Probe = each day boundary; the window predicate "
    "is integer epoch-microsecond math so it pushes to the scan and "
    "agrees exactly with the oracle.",
    tags=("asof", "agg"),
)
def block_at_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    in_window = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.date_trunc("day", F.col("ts")))
    ) < 60_000_000
    return (
        e.where(in_window)
        .groupBy(s_date("ts").alias("probe_dt"))
        .agg(
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
            F.count(F.lit(1)).alias("n_in_window"),
        )
    )


@query(
    "broadcast_dim_decoration",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber,
       p.p_name, p.p_brand,
       s.s_name, n.n_name AS supplier_nation,
       l.l_quantity, l.l_extendedprice
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE l.l_quantity >= 49
""",
    doc="J12 broadcast dimension decoration: every row decorated from "
    "in-memory dims assetInfo/chainInfos (reference "
    "assetManager.js:1412-1448, query.js:5081-5257 decorateExtrinsic). "
    "All three dims are broadcast — the fact side never shuffles "
    "(verified: BroadcastHashJoin ×3, no Exchange on lineitem).",
    tags=("join",),
)
def broadcast_dim_decoration(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_name",
            "p_brand",
            "s_name",
            F.col("n_name").alias("supplier_nation"),
            "l_quantity",
            "l_extendedprice",
        )
    )


@query(
    "per_block_stats",
    oracle=f"""
SELECT user_id, {d_date('ts')} AS log_dt,
       COUNT(*) AS n_events,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
       COUNT(DISTINCT event_type) AS n_types,
       {d_decsum('value')} AS sum_value
FROM events
GROUP BY user_id, {d_date('ts')}
""",
    doc="A7 per-block stats at index time: numExtrinsics / "
    "numSignedExtrinsics / numEvents / fees per block (reference "
    "indexer.js:5019-5048 getBlockStats) — fine-grain partial agg that "
    "map-side combines before the shuffle.",
    tags=("agg",),
)
def per_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id", s_date("ts").alias("log_dt")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.countDistinct("event_type").alias("n_types"),
        _decsum(F.col("value")).alias("sum_value"),
    )


@query(
    "daily_history_series",
    oracle=f"""
WITH daily AS (
  SELECT user_id, {d_date('ts')} AS log_dt,
         SUM(CAST(value AS DECIMAL(38,10))) AS day_value,
         COUNT(*) AS n_events
  FROM events
  GROUP BY user_id, {d_date('ts')}
)
SELECT user_id, log_dt,
       CAST(CAST(day_value AS VARCHAR) AS DOUBLE) AS day_value,
       n_events,
       CAST(CAST(SUM(day_value) OVER (
         PARTITION BY user_id ORDER BY log_dt
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS running_value
FROM daily
""",
    doc="W4 daily balance history series: per-address per-day states "
    "rendered as a cumulative time series (reference query.js:3989-4058 "
    "get_account_history / addresshistory). Running sum stays DECIMAL "
    "(associative) until the final cast, so partial-agg order can't leak; "
    "log_dt is unique per user → the window order is total.",
    tags=("window",),
)
def daily_history_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("user_id", s_date("ts").alias("log_dt")).agg(
        F.sum(F.col("value").cast("decimal(38,10)")).alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("log_dt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "log_dt",
        F.col("day_value").cast("string").cast("double").alias("day_value"),
        "n_events",
        F.sum("day_value").over(w).cast("string").cast("double").alias("running_value"),
    )


@query(
    "work_queue_backoff",
    oracle=f"""
SELECT event_id, event_id % 6 AS attempts, {d_ts('ts')} AS ts
FROM events
WHERE epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-30')
      - CAST(POWER(3, event_id % 6) AS BIGINT) * 60000000
ORDER BY attempts ASC, ts DESC, event_id ASC
LIMIT 100
""",
    doc="T4 work-queue selection with exponential backoff: ORDER BY "
    "matchAttempts ASC, sourceTS DESC LIMIT with predicate "
    "matchAttemptDT < now() - POW(3, matchAttempts) MINUTE (reference "
    "xcmCleaner.js:1020). Anchor is a fixed literal (no now()) so both "
    "engines select identical rows; POW(3,k) for k<=5 is exact in a "
    "double. Spark plans this as TakeOrderedAndProject — no full sort.",
    tags=("topk",),
)
def work_queue_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    attempts = (F.col("event_id") % 6).alias("attempts")
    backoff_us = F.pow(F.lit(3.0), (F.col("event_id") % 6).cast("double")).cast("bigint") * 60_000_000
    anchor_us = F.unix_micros(F.to_timestamp(F.lit("2024-01-30")))
    return (
        e.where(F.unix_micros(F.col("ts")) < anchor_us - backoff_us)
        .select("event_id", attempts, F.col("ts"))
        .orderBy(F.col("attempts").asc(), F.col("ts").desc(), F.col("event_id").asc())
        .limit(100)
        .select("event_id", "attempts", s_ts("ts").alias("ts"))
    )


@query(
    "validity_filter",
    oracle="""
SELECT doc_id, lang, source, n_chars, length(text) AS text_len
FROM documents
WHERE regexp_matches(lang, '^[a-z]{2}$')
  AND n_chars = length(text)
  AND n_chars BETWEEN 10 AND 100000
""",
    doc="P6 validity predicates before writes: validAddress 67-char hex, "
    "validAsset, validDouble range checks (reference indexer.js:251, "
    "487-509, 1073-1104) — regex shape check + self-consistency "
    "(n_chars == length(text)) + numeric range, all native expressions "
    "inside whole-stage codegen.",
    tags=("filter",),
)
def validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.where(
        F.col("lang").rlike("^[a-z]{2}$")
        & (F.col("n_chars") == F.length("text"))
        & F.col("n_chars").between(10, 100000)
    ).select("doc_id", "lang", "source", "n_chars", F.length("text").alias("text_len"))


@query(
    "json_field_access",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decile,
       COUNT(*) AS n,
       MIN(event_id) AS min_event
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 20
GROUP BY CAST(json_extract(props, '$.k') AS BIGINT) // 10
""",
    doc="§2.8 JSON access: JSON_VALUE / JSON_EXTRACT_SCALAR over params/"
    "data/props JSON columns (reference docs/AccountAnalytics.md:17-20, "
    "schema/events.json:22). get_json_object evaluates JVM-side; the "
    "extracted value feeds a predicate and a grouped agg.",
    tags=("filter", "agg", "json"),
)
def json_field_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # extract once in a projection; the filter and grouping key reuse the
    # materialized column instead of re-parsing the JSON twice per row
    k = e.select("event_id", F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"))
    return (
        k.where(F.col("k") >= 20)
        .groupBy((F.col("k") / 10).cast("bigint").alias("k_decile"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("event_id").alias("min_event"))
    )


@query(
    "call_tree_flatten",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority = '1-URGENT' AS nested FROM orders
)
SELECT o_orderkey, '0' AS call_id,
       CASE WHEN nested THEN 'utility' ELSE 'balances' END AS call_section,
       CASE WHEN nested THEN 'batch' ELSE 'transfer' END AS call_method,
       TRUE AS root, NOT nested AS leaf
FROM base
UNION ALL
SELECT o_orderkey, '0-0', 'balances', 'transfer', FALSE, TRUE
FROM base WHERE nested
UNION ALL
SELECT o_orderkey, '0-1', 'system', 'remark', FALSE, TRUE
FROM base WHERE nested
""",
    doc="F2 recursive call-tree flattening UDTF: 1 extrinsic → N call "
    "rows with '0-1-2' path ids, root/leaf flags (reference "
    "assetManager.js:1922-2040 paramToCalls, indexer.js:3433-3608 "
    "recursive_batch_all). The Spark side runs the real recursive "
    "pandas-UDF flattener from plans/decode.py on synthesized nested "
    "params JSON; the oracle enumerates the known two-level expansion "
    "independently — a golden test of the UDTF, not of the generator.",
    tags=("udtf",),
)
def call_tree_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polkadot_etl_spark.plans.decode import _flatten_calls

    o = load_table(spark, sf_dir, "orders")
    nested = F.col("o_orderpriority") == "1-URGENT"
    params = F.when(
        nested,
        F.concat(
            F.lit('{"calls": [{"section": "balances", "method": "transfer", "args": {"k": '),
            F.col("o_orderkey").cast("string"),
            F.lit('}}, {"section": "system", "method": "remark", "args": {"k": '),
            F.col("o_orderkey").cast("string"),
            F.lit("}}]}"),
        ),
    ).otherwise(F.lit("{}"))
    src = o.select(
        "o_orderkey",
        nested.alias("nested"),
        F.when(nested, F.lit("utility")).otherwise(F.lit("balances")).alias("section"),
        F.when(nested, F.lit("batch")).otherwise(F.lit("transfer")).alias("method"),
        params.alias("params"),
    )
    # non-nesting fast path: one native root+leaf row, no Python — the UDF
    # only sees the nesting minority (same split as plans/decode.py)
    simple = src.where(~F.col("nested")).select(
        "o_orderkey",
        F.lit("0").alias("call_id"),
        F.col("section").alias("call_section"),
        F.col("method").alias("call_method"),
        F.lit(True).alias("root"),
        F.lit(True).alias("leaf"),
    )
    node = F.explode(_flatten_calls(F.col("section"), F.col("method"), F.col("params"))).alias("node")
    deep = src.where(F.col("nested")).select("o_orderkey", node).select(
        "o_orderkey",
        F.col("node.call_id").alias("call_id"),
        F.col("node.call_section").alias("call_section"),
        F.col("node.call_method").alias("call_method"),
        F.col("node.root").alias("root"),
        F.col("node.leaf").alias("leaf"),
    )
    return simple.unionByName(deep)


@query(
    "asof_broadcast_version",
    oracle=f"""
WITH versions AS (
  SELECT * FROM (VALUES
    (1, TIMESTAMP '1995-01-01'), (2, TIMESTAMP '1996-01-01'),
    (3, TIMESTAMP '1997-01-01'), (4, TIMESTAMP '1998-07-01'),
    (5, TIMESTAMP '2000-01-01')) AS t(spec_version, since)
)
SELECT o.o_orderkey, {d_date('o.o_orderdate')} AS order_date,
       (SELECT MAX(v.spec_version) FROM versions v WHERE v.since <= o.o_orderdate)
         AS spec_version
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-06-01'
""",
    doc="J4 as-of against a tiny dim — spec_version at block (reference "
    "polkaholicDB.js:322-333 reverse-scans in-memory per-chain "
    "specVersions for max blockNumber <= bn). The honest Spark analog "
    "of that in-memory scan: collect the 5-row dim driver-side and "
    "inline it as a descending when-chain — ZERO shuffle, the as-of "
    "evaluates inside whole-stage codegen at the scan. (A cross-join + "
    "groupBy(o_orderkey) plan computes the same thing with a pointless "
    "450k-row shuffle — measured 8x slower.) Dims too big to inline use "
    "the union+window asof (J3).",
    tags=("asof", "join"),
)
def asof_broadcast_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1995-06-01"))
    # the tiny dim is a driver-side literal — no createDataFrame/.collect()
    # round-trip; the reverse scan (newest boundary first wins) compiles
    # straight into a when-chain evaluated at the parquet scan
    versions = [(1, "1995-01-01"), (2, "1996-01-01"), (3, "1997-01-01"),
                (4, "1998-07-01"), (5, "2000-01-01")]
    spec = None
    for spec_version, since in sorted(versions, key=lambda v: v[1], reverse=True):
        clause = F.col("o_orderdate") >= F.to_timestamp(F.lit(since))
        spec = F.when(clause, spec_version) if spec is None else spec.when(clause, spec_version)
    return o.select(
        "o_orderkey",
        s_date("o_orderdate").alias("order_date"),
        spec.cast("int").alias("spec_version"),
    )


@query(
    "jdbc_derby_roundtrip",
    oracle=f"""
SELECT n.n_name AS n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MIN(s.s_suppkey) AS BIGINT) AS min_suppkey,
       CAST(MAX(s.s_suppkey) AS BIGINT) AS max_suppkey,
       {d_decsum('s.s_acctbal')} AS total_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    doc="SURVEY S3 (MySQL point/range reads) executed END-TO-END: the "
    "supplier table is written into an embedded Apache Derby database "
    "through spark's own JDBC sink (the Derby jars ship inside "
    "pyspark), then read BACK through sources/jdbc.py's partition "
    "planner — stride_predicates over s_suppkey fans the range read "
    "across 4 connections exactly as the reference fans its MySQL hot-"
    "table reads (substrate/polkaholicDB.js pool queries; "
    "substrateetl.js per-range dumps) — and rolled up per nation with "
    "a broadcast dim join. The oracle computes the same rollup from "
    "the parquet truth, so the hash pins VALUE-EXACT round-tripping "
    "(bigint keys, doubles bit-for-bit through Derby's DOUBLE) and "
    "that the stride plan captures EVERY row (min/max keys per group "
    "would expose a dropped stride). This retires the planner-only S3 "
    "partial: both halves of spark.read.jdbc now execute for real in "
    "this sandbox; on a cluster the same plan feeds the actual MySQL "
    "url. Scale shape: the stride plan IS the scale story — N "
    "independent range connections, no single-reader funnel; the dim "
    "side broadcasts.",
    tags=("source", "jdbc"),
)
def jdbc_derby_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polkadot_etl_spark.sources.jdbc import (
        DERBY_DRIVER,
        derby_seeded_url,
        read_jdbc_partitioned,
        stride_predicates,
    )

    sup_truth = load_table(spark, sf_dir, "supplier")
    url = derby_seeded_url(spark, sup_truth, sf_dir, "supplier")
    # bounds from the 1-row parquet aggregate (the reference samples its
    # key range the same way before fanning range reads)
    b = sup_truth.agg(
        F.min("s_suppkey").alias("lo"), F.max("s_suppkey").alias("hi")
    ).collect()[0]
    # the writer creates QUOTED lowercase columns (Derby dialect), so the
    # pushed predicates must quote too — bare identifiers uppercase in Derby
    preds = stride_predicates('"s_suppkey"', int(b["lo"]), int(b["hi"]) + 1, 4)
    sup = read_jdbc_partitioned(
        spark, url, "supplier", preds, {"driver": DERBY_DRIVER}
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        sup.join(
            F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"]
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.min("s_suppkey").cast("bigint").alias("min_suppkey"),
            F.max("s_suppkey").cast("bigint").alias("max_suppkey"),
            _decsum(F.col("s_acctbal")).alias("total_acctbal"),
        )
    )
