"""Price-series pipelines: OHLCV rollups (A10), best-by-liquidity dedup
(W3), interval sampling (P2) and as-of USD decoration (J3) over the
assetlog table (polkaholic.sql:1528-1553; priceManager.js:223-370;
computePriceUSD assetManager.js:1392-1534).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polkadot_etl_spark.operators.asof import asof_join


def best_by_liquidity(assetlog: DataFrame) -> DataFrame:
    """W3: for each (asset, chainID, indexTS) keep the row with the lowest
    liquid rank (query.js:2078-2091); blockNumber-free total order via
    source as final tie-break."""
    w = Window.partitionBy("asset", "chainID", "indexTS").orderBy(
        F.col("liquid").asc(), F.col("source").asc()
    )
    return (
        assetlog.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def interval_sample(assetlog: DataFrame, every_seconds: int = 3600) -> DataFrame:
    """P2: downsample the 300 s grid by indexTS % k == 0 (query.js:2038)."""
    return assetlog.where(F.col("indexTS") % every_seconds == 0)


def ohlcv_rollup(assetlog: DataFrame, bucket_seconds: int = 3600) -> DataFrame:
    """A10: roll 5-min rows up to bucket_seconds OHLCV bars. open/close are
    taken from the first/last 5-min row by indexTS (total-ordered); high/
    low/volume aggregate across the bucket."""
    deduped = best_by_liquidity(assetlog)
    b = deduped.withColumn(
        "bucketTS", (F.col("indexTS") - F.col("indexTS") % bucket_seconds)
    )
    w_a = Window.partitionBy("asset", "chainID", "bucketTS").orderBy(F.col("indexTS").asc())
    w_d = Window.partitionBy("asset", "chainID", "bucketTS").orderBy(F.col("indexTS").desc())
    ranked = b.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return ranked.groupBy("asset", "chainID", "bucketTS").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("open"))).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("close"))).alias("close"),
        F.sum(F.col("total_volumes").cast("decimal(38,10)")).cast("double").alias("volume"),
        F.count(F.lit(1)).alias("n_points"),
    )


def with_price_usd(
    df: DataFrame,
    assetlog: DataFrame,
    asset_col: str = "asset",
    ts_col: str = "ts_epoch",
    amount_col: str = "amount",
) -> DataFrame:
    """J3: as-of USD decoration — attach the latest priceUSD at-or-before
    each row's timestamp per asset, then amount_usd = amount * price.

    The reference does this with an in-memory binary search per row
    (assetManager.js:1479); here it is ONE union+window pass (see
    operators/asof.py) — no per-row lookups, no driver state.
    """
    prices = best_by_liquidity(assetlog).select(
        F.col("asset").alias(asset_col), F.col("indexTS").alias(ts_col), F.col("priceUSD")
    )
    out = asof_join(
        left=df,
        right=prices,
        by=[asset_col],
        left_ts=ts_col,
        right_ts=ts_col,
        value_cols=["priceUSD"],
    )
    return out.withColumn("price_usd", F.col("priceUSD")).withColumn(
        "amount_usd", F.col(amount_col) * F.col("priceUSD")
    ).drop("priceUSD")


def lp_price_usd(
    lp: DataFrame,
    assetlog: DataFrame,
    ts_col: str = "ts_epoch",
) -> DataFrame:
    """LP token price composition (assetManager.js:1499-1534): an LP
    share's USD price = (reserve0·price0 + reserve1·price1) / lp_supply,
    where price0/price1 are the as-of prices of the two pooled tokens.

    lp columns: asset, token0, token1, reserve0, reserve1, lp_supply, ts.
    Two as-of passes (one per token leg) — each is a single shuffle on
    the token key; no per-row lookups.
    """
    prices = best_by_liquidity(assetlog).select(
        F.col("asset").alias("__p_asset"),
        F.col("indexTS").alias(ts_col),
        F.col("priceUSD"),
    )

    def leg(df: DataFrame, token_col: str, out_col: str) -> DataFrame:
        right = prices.withColumnRenamed("__p_asset", token_col)
        out = asof_join(
            left=df,
            right=right,
            by=[token_col],
            left_ts=ts_col,
            right_ts=ts_col,
            value_cols=["priceUSD"],
        )
        return out.withColumnRenamed("priceUSD", out_col)

    j = leg(lp, "token0", "price0")
    j = leg(j, "token1", "price1")
    tvl = F.col("reserve0") * F.col("price0") + F.col("reserve1") * F.col("price1")
    return j.withColumn("tvl_usd", tvl).withColumn(
        "lp_price_usd", F.when(F.col("lp_supply") > 0, tvl / F.col("lp_supply"))
    )
