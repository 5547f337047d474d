"""Gold-layer metric pipelines: blocklog daily rollup (A1) and the
account-lifecycle tables (A4/J9 + balances day-diff) published by the
reference as accountsactive / accountspassive / accountsnew /
accountsreaped (docs/DEFINITIONS.md:55-238).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def blocklog_daily(extrinsics: DataFrame, transfers: DataFrame) -> DataFrame:
    """Per-day chain metrics — update_blocklog (substrateetl.js:9369-9428):
    extrinsic counts, signed counts, fee sums, distinct signers, transfer
    counts and USD volume. One grouped agg per input; joined on day."""
    ext = extrinsics.groupBy(F.to_date("block_time").alias("log_dt")).agg(
        F.count(F.lit(1)).alias("num_extrinsics"),
        F.count(F.when(F.col("signed"), 1)).alias("num_signed_extrinsics"),
        F.sum(F.col("fee").cast("decimal(38,10)")).cast("double").alias("fees"),
        F.countDistinct(F.when(F.col("signed"), F.col("signer_pub_key"))).alias(
            "num_active_signers"
        ),
    )
    xfer = transfers.groupBy(F.to_date("block_time").alias("log_dt")).agg(
        F.count(F.lit(1)).alias("num_transfers"),
        F.sum(F.coalesce(F.col("amount_usd"), F.lit(0.0)).cast("decimal(38,10)"))
        .cast("double")
        .alias("value_transfers_usd"),
    )
    return ext.join(xfer, "log_dt", "left")


def accounts_active(extrinsics: DataFrame, blocks: DataFrame) -> DataFrame:
    """Active accounts per day = extrinsic signers (User) ∪ block authors
    (System), groupwise max(account_type) — the published
    DEFINITIONS.md:55-100 query. 'User' > 'System' lexicographically, so
    max() prefers User exactly like the reference's MAX(accountType)."""
    signers = (
        extrinsics.where(F.col("signed"))
        .select(
            F.to_date("block_time").alias("log_dt"),
            F.col("signer_ss58").alias("address_ss58"),
            F.col("signer_pub_key").alias("address_pubkey"),
            F.lit("User").alias("account_type"),
            F.col("block_time").alias("ts"),
        )
    )
    authors = blocks.where(F.col("author_pub_key").isNotNull()).select(
        F.to_date("block_time").alias("log_dt"),
        F.col("author_ss58").alias("address_ss58"),
        F.col("author_pub_key").alias("address_pubkey"),
        F.lit("System").alias("account_type"),
        F.col("block_time").alias("ts"),
    )
    return (
        signers.unionByName(authors)
        .groupBy("log_dt", "address_ss58", "address_pubkey")
        .agg(F.max("account_type").alias("account_type"), F.max("ts").alias("ts"))
    )


def accounts_passive(transfers: DataFrame, active: DataFrame) -> DataFrame:
    """Passive accounts per day = transfer senders ∪ receivers that are NOT
    active that day (DEFINITIONS.md:106-178) — the anti-join operator J9."""
    touched = (
        transfers.select(
            F.to_date("block_time").alias("log_dt"),
            F.col("from_pub_key").alias("address_pubkey"),
            F.col("from_ss58").alias("address_ss58"),
            F.col("block_time").alias("ts"),
        )
        .unionByName(
            transfers.select(
                F.to_date("block_time").alias("log_dt"),
                F.col("to_pub_key").alias("address_pubkey"),
                F.col("to_ss58").alias("address_ss58"),
                F.col("block_time").alias("ts"),
            )
        )
        .groupBy("log_dt", "address_pubkey", "address_ss58")
        .agg(F.max("ts").alias("ts"))
    )
    return touched.join(
        active.select("log_dt", "address_pubkey"), ["log_dt", "address_pubkey"], "left_anti"
    ).withColumn("account_type", F.lit("Passive"))


def accounts_new_reaped(balances: DataFrame, chain_col: str | None = None) -> DataFrame:
    """New/reaped accounts from consecutive daily balance snapshots
    (DEFINITIONS.md:205-238): new = present today, absent yesterday;
    reaped = present yesterday, absent today.

    Implemented with ONE shuffle: per (address, day) presence, then a lag
    over the per-address day sequence — no self-join per day pair.
    Multi-chain inputs pass ``chain_col``: the same address on two chains
    has independent lifecycles, so the presence key and the day-sequence
    window both carry the chain.
    """
    extra = [chain_col] if chain_col else []
    present = (
        balances.select(
            *extra,
            F.col("address_pubkey"),
            F.col("address_ss58"),
            F.to_date("ts").alias("log_dt"),
        )
        .dropDuplicates()
    )
    w = Window.partitionBy(*extra, "address_pubkey").orderBy("log_dt")
    seq = present.withColumn("prev_dt", F.lag("log_dt").over(w)).withColumn(
        "next_dt", F.lead("log_dt").over(w)
    )
    new = seq.where(
        F.col("prev_dt").isNull() | (F.datediff("log_dt", F.col("prev_dt")) > 1)
    ).select(
        *extra, "address_pubkey", "address_ss58", "log_dt",
        F.lit("New").alias("account_type"),
    )
    reaped = seq.where(
        F.col("next_dt").isNull() | (F.datediff(F.col("next_dt"), "log_dt") > 1)
    ).select(
        *extra,
        "address_pubkey",
        "address_ss58",
        F.date_add("log_dt", 1).alias("log_dt"),
        F.lit("Reaped").alias("account_type"),
    )
    return new.unionByName(reaped)


def balances_day_rollup(balances: DataFrame, chain_col: str | None = None) -> DataFrame:
    """The balances-day publish: numAddresses / numNewAccounts /
    numReapedAccounts per day from daily balance snapshots, with the
    NULLIFY sanity rule applied to both lifecycle counts — the
    updateNativeBalances → update_blocklog fragment (substrateetl.js:
    2905-3050 snapshot walk; :9369-9428 per-day rollup; :9407-9415
    NULLIFY guard).

    Scale shape: lifecycle detection is the one-shuffle lag/lead window
    of accounts_new_reaped; the per-day aggregates are map-side-partial
    counts. The reference's blocklog is PER-CHAIN (substrateetl.js:
    9369-9428) — multi-chain callers pass ``chain_col`` so the prior-day
    lag partitions by chain (and the rollup keys carry it). With the
    default single-chain input the final lag(numAddresses) window is
    ordered over the DAY axis alone — one row per day, so the
    single-partition sort is bounded by calendar length, not data
    volume (pinned in tests/test_plan_quality.py)."""
    keys = ([chain_col] if chain_col else []) + ["log_dt"]
    lifecycle = accounts_new_reaped(balances, chain_col)
    counts = lifecycle.groupBy(*keys).agg(
        F.count(F.when(F.col("account_type") == "New", 1)).alias("num_new_accounts"),
        F.count(F.when(F.col("account_type") == "Reaped", 1)).alias("num_reaped_accounts"),
    )
    addresses = (
        balances.select(*([chain_col] if chain_col else []),
                        F.to_date("ts").alias("log_dt"), "address_pubkey")
        .dropDuplicates()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("num_addresses"))
    )
    lag_w = (
        Window.partitionBy(chain_col).orderBy("log_dt")
        if chain_col
        else Window.orderBy("log_dt")
    )
    daily = (
        addresses.join(counts, keys, "full_outer")
        .withColumn("num_new_accounts", F.coalesce("num_new_accounts", F.lit(0)))
        .withColumn("num_reaped_accounts", F.coalesce("num_reaped_accounts", F.lit(0)))
        .withColumn("__prior", F.lag("num_addresses").over(lag_w))
    )
    daily = sanity_nullify_counts(daily, "num_new_accounts", "__prior")
    daily = sanity_nullify_counts(daily, "num_reaped_accounts", "__prior")
    return daily.select(
        *keys, "num_addresses", "num_new_accounts", "num_reaped_accounts"
    )


def sanity_nullify_counts(
    daily: DataFrame, count_col: str, prior_col: str, ratio: float = 0.5
) -> DataFrame:
    """The reference's data-quality guard (substrateetl.js:9407-9415):
    NULLIFY a day's new/reaped count when rat = count / (1 + prior-day
    address total) exceeds `ratio`, OR when the prior-day total is
    unknown ("don't add new or reaped if its more than half of what we
    saw yesterday, or if yesterday is blank") — a crawler glitch, not a
    real signal."""
    return daily.withColumn(
        count_col,
        F.when(
            F.col(prior_col).isNull()
            | (F.col(count_col) > (F.lit(1) + F.col(prior_col)) * ratio),
            F.lit(None),
        ).otherwise(F.col(count_col)),
    )
