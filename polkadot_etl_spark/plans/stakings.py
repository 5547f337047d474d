"""Staking analytics — the reference's published golden SQL
(docs/StakingAnalytics.md: validators0 with eraRaw LEFT JOIN for
normalized rewards ~:1-90, nominators ARRAY_AGG per validator :15-28;
SURVEY §2 A8/J8).

Two pipelines over the per-era stakings snapshot table (schema
schemas.STAKINGS, one row per (address, era, storage-kind)):

- validators_by_era: ErasStakers rows + per-era totals left-joined back
  (J8) → reward share + an APR-style normalization using the era's
  total reward points.
- nominators_per_validator: Nominators rows exploded on their JSON
  targets array, re-grouped per validator with a sorted nominator list
  (A8's ARRAY_AGG — reference uses BigQuery UNNEST + ARRAY_AGG).

Both are single-shuffle grouped plans; the era totals are a tiny
aggregate joined broadcast-style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def validators_by_era(stakings: DataFrame) -> DataFrame:
    """J8: validators × per-era aggregate, normalized reward share."""
    v = stakings.where(F.col("storage") == "ErasStakers").select(
        "era",
        F.col("address_ss58").alias("validator_ss58"),
        "validator_total",
        "validator_own",
        "validator_commission",
        "validator_reward_points",
        "ts",
    )
    era_agg = v.groupBy(F.col("era").alias("e_era")).agg(
        F.sum("validator_reward_points").alias("era_reward_points"),
        F.sum(F.col("validator_total").cast("decimal(38,10)"))
        .cast("double")
        .alias("era_total_staked"),
        F.count(F.lit(1)).alias("n_validators"),
    )
    j = v.join(F.broadcast(era_agg), v.era == era_agg.e_era, "left").drop("e_era")
    share = F.col("validator_reward_points") / F.col("era_reward_points")
    return j.select(
        "era",
        "validator_ss58",
        "validator_total",
        "validator_own",
        "validator_commission",
        "validator_reward_points",
        "era_reward_points",
        "era_total_staked",
        "n_validators",
        share.alias("reward_share"),
        # APR-style normalization: share of points scaled by stake share
        # (validators0's normalized-reward column)
        (share / (F.col("validator_total") / F.col("era_total_staked"))).alias(
            "points_per_stake_ratio"
        ),
    )


def nominators_per_validator(stakings: DataFrame) -> DataFrame:
    """A8: explode nominator target lists, ARRAY_AGG nominators per
    (validator, era) — sorted for deterministic output."""
    n = stakings.where(F.col("storage") == "Nominators").select(
        "era",
        F.col("address_ss58").alias("nominator_ss58"),
        F.explode(
            F.from_json(F.col("targets"), T.ArrayType(T.StringType()))
        ).alias("validator_ss58"),
    )
    return n.groupBy("era", "validator_ss58").agg(
        F.array_join(F.sort_array(F.collect_list("nominator_ss58")), ",").alias("nominators"),
        F.countDistinct("nominator_ss58").alias("n_nominators"),
    )
