"""XCM global asset registry (xcmgar) build + propagation.

The reference maintains a cross-chain asset registry: every chain
registers its local representation of an asset (native Token JSON,
ForeignAsset index, 128-bit asset id on EVM chains, xc-prefixed wrapper
symbols), and the registry canonicalizes them under one
``xcm_interior_key`` derived from the asset's multilocation
(substrate/xcmgarlib3.js — the (relayChain, paraID, currencyID) →
(symbol, name, decimals) map; published as schema/xcmassets.json). The
registry then propagates back into per-chain asset tables — the
asset × xcmasset join of xcmLiquidityPairsUpdate
(substrate/xcmmanager.js:500-510).

Spark shape: the multilocation→interior-key codec runs once per
registration row in one Arrow-batched UDF (registrations are dim-scale:
~1e3 rows per relay — this whole pipeline is broadcast territory);
canonical-row selection is a rank window over (origin-first,
non-wrapper-first); propagation is a broadcast join on the local
(para_id, currency_id) representation. Lake upsert goes through
operators.merge.upsert_day_partitioned (J10 MERGE semantics).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from polkadot_etl_spark.functions.multilocation import interior_key, para_id_of

_LOC_INFO = T.StructType(
    [
        T.StructField("xcm_interior_key", T.StringType()),
        T.StructField("origin_para_id", T.IntegerType()),
        T.StructField("n_junctions", T.IntegerType()),
    ]
)


@pandas_udf(_LOC_INFO)
def _loc_info_fn(multilocation: pd.Series, relay: pd.Series) -> pd.DataFrame:
    keys, paras, njs = [], [], []
    for m, r in zip(multilocation, relay):
        try:
            d = json.loads(m)
            k = interior_key(d, r or "polkadot")
            keys.append(k)
            paras.append(para_id_of(d))
            body = k.split("~", 1)[1]
            njs.append(0 if body == "here" else len(json.loads(body)))
        except Exception:
            keys.append(None)
            paras.append(None)
            njs.append(None)
    return pd.DataFrame(
        {"xcm_interior_key": keys, "origin_para_id": paras, "n_junctions": njs}
    )


# The codec IS deterministic, but Catalyst treats deterministic
# expressions as free to duplicate and push around — measured: the
# isNotNull(xcm_interior_key) gate got pushed below the repartition into
# every union leg, re-running the Arrow stage once per near-empty file
# split (each Python task pays a ~1.5 s worker-fork floor here).
# Marking it nondeterministic pins ONE evaluation in ONE compact stage.
_loc_info = _loc_info_fn.asNondeterministic()


def build_xcm_asset_registry(chain_assets: DataFrame) -> DataFrame:
    """Per-chain registrations → one canonical row per xcm_interior_key.

    Input columns: relay_chain, para_id (registering chain), currency_id
    (local representation), symbol, name, decimals, multilocation (JSON),
    xc_contract_address?, source.

    Canonical selection: the asset's HOME registration (registering chain
    == the multilocation's Parachain junction; relay assets' home is
    para 0) wins; else a non-xc-wrapper symbol; ties break on
    (para_id, currency_id) for determinism. confidence = number of
    distinct chains that know the asset (schema/xcmassets.json
    confidence column).
    """
    # One compact python stage for the codec: registrations are dim-scale
    # but typically arrive as a union of many near-empty file splits, and
    # every Arrow-UDF task pays a fixed Python-worker fork cost (~1.5 s in
    # this environment) — re-balance to one wave of core-count tasks so
    # the codec stage costs one fork wall-clock, not ceil(splits/cores).
    # capped: on a large cluster defaultParallelism is thousands, and a
    # ~1e3-row dim over thousands of codec tasks would be all fork cost
    par = min(chain_assets.sparkSession.sparkContext.defaultParallelism, 64)
    info = _loc_info(F.col("multilocation"), F.col("relay_chain")).alias("__info")
    r = (
        chain_assets.repartition(par)
        .withColumn("__info", info)
        .select("*", "__info.*")
        .drop("__info")
        .where(F.col("xcm_interior_key").isNotNull())
    )
    is_origin = F.coalesce(F.col("origin_para_id"), F.lit(0)) == F.col("para_id")
    is_wrapper = F.col("symbol").startswith("xc")
    w = Window.partitionBy("xcm_interior_key").orderBy(
        is_origin.desc(),
        is_wrapper.asc(),
        F.col("para_id").asc(),
        F.col("currency_id").asc(),
        F.col("source").asc(),
    )
    # confidence/contract stats ride the SAME key partitioning as the
    # rank window — an unordered window over xcm_interior_key reuses the
    # rank window's Exchange, where a groupBy+join-back would both add a
    # join and duplicate the upstream codec branch in the plan.
    wk = Window.partitionBy("xcm_interior_key")
    canon = (
        r.withColumn("confidence", F.size(F.collect_set("para_id").over(wk)).cast("long"))
        .withColumn("__any_contract", F.max("xc_contract_address").over(wk))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )
    return canon.select(
        "xcm_interior_key",
        F.lit(None).cast("string").alias("xcm_v1_multilocation_byte"),
        F.col("multilocation").alias("xcm_v1_multilocation"),
        "symbol",
        "decimals",
        F.coalesce(F.col("origin_para_id"), F.lit(0)).alias("para_id"),
        F.concat(F.lit("chain"), F.coalesce(F.col("origin_para_id"), F.lit(0))).alias(
            "chain_name"
        ),
        F.when(F.col("n_junctions") == 0, F.lit("here"))
        .otherwise(F.concat(F.lit("x"), F.col("n_junctions")))
        .alias("interior_type"),
        "source",
        F.col("__any_contract").alias("xc_contract_address"),
        F.col("currency_id").alias("xc_currency_id"),
        "confidence",
    )


def propagate_registry(local_assets: DataFrame, chain_assets: DataFrame, registry: DataFrame) -> DataFrame:
    """Decorate per-chain asset rows with their canonical identity — the
    xcmLiquidityPairsUpdate join (xcmmanager.js:500-510): local
    (para_id, currency_id) → xcm_interior_key → canonical
    symbol/decimals/home chain. Registry sides broadcast (dim-scale)."""
    mapping = F.broadcast(
        build_registration_index(chain_assets).select(
            F.col("para_id").alias("__mp"),
            F.col("currency_id").alias("__mc"),
            F.col("xcm_interior_key").alias("__mk"),
        )
    )
    reg = F.broadcast(
        registry.select(
            F.col("xcm_interior_key").alias("__rk"),
            F.col("symbol").alias("xcm_symbol"),
            F.col("decimals").alias("xcm_decimals"),
            F.col("para_id").alias("xcm_home_para_id"),
            F.col("confidence"),
        )
    )
    out = (
        local_assets.join(
            mapping,
            (local_assets.para_id == mapping.__mp)
            & (local_assets.currency_id == mapping.__mc),
            "left",
        )
        .join(reg, F.col("__mk") == reg.__rk, "left")
        .drop("__mp", "__mc", "__rk")
    )
    return out.withColumnRenamed("__mk", "xcm_interior_key")


def build_registration_index(chain_assets: DataFrame) -> DataFrame:
    """(para_id, currency_id) → xcm_interior_key for every registration."""
    # same codec-compaction as build_xcm_asset_registry: one wave of
    # Python tasks, not one per file split
    par = min(chain_assets.sparkSession.sparkContext.defaultParallelism, 64)
    info = _loc_info(F.col("multilocation"), F.col("relay_chain")).alias("__info")
    return (
        chain_assets.repartition(par)
        .withColumn("__info", info)
        .select("para_id", "currency_id", F.col("__info.xcm_interior_key").alias("xcm_interior_key"))
        .where(F.col("xcm_interior_key").isNotNull())
        .dropDuplicates(["para_id", "currency_id"])
    )
