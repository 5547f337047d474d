"""Token-metadata maintenance jobs — the periodic enrichment crons
(substrate/tools/updateERC20TokenSupply, tools/indexTokenURI) that keep
the asset table's supply/NFT columns fresh.

Reference behavior reproduced:

- ERC-20 supply refresh: per asset, the crawled totalSupply lands as an
  UPDATE of (totalSupply, lastUpdateBN, lastUpdateDT) (indexer.js:
  2779-2790, flush column list :2852), with validate_bigint guarding
  junk values — positive and under 30 digits, else 0
  (ethTool.js:3198-3203);
- NFT token metadata: (asset, tokenID) rows carry holder / meta /
  tokenURI / free, upserted with the lastUpdateBN-keyed replace
  (updateAssetNFTTokenMetadata indexer.js:395-401; flush :2692-2706,
  key spec :2936-2938 — the freshest block wins).

Both are MERGE-style maintenance: at 100 TB the observation batches are
tiny against a dim-scale asset table, so the newer-wins fold is one
keyed window over (key, lastUpdateBN) — observations never shuffle the
big fact tables at all. RPC fetching itself is out of scope (the same
fixture-fed S10 contract as snapshots): inputs are already-decoded
observation frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def validate_bigint(c: Column) -> Column:
    """ethTool.validate_bigint: positive and < 30 digits, else 0 — the
    reference's guard against nonsense RPC supplies."""
    dec = c.try_cast("decimal(38,0)")
    ok = dec.isNotNull() & (dec > 0) & (F.length(dec.cast("string")) < 30)
    return F.when(ok, dec).otherwise(F.lit(0).cast("decimal(38,0)"))


def _newest_per_key(
    obs: DataFrame, keys: list[str], bn_col: str, prefer: tuple[str, ...] = ()
) -> DataFrame:
    """One surviving observation per key: highest block number wins.
    ``prefer`` columns rank immediately after the block number (e.g. an
    origin flag so the CURRENT stored row survives an equal-BN
    observation — "replace only when newer"). Remaining equal ties
    break on the payload columns themselves (name-sorted, descending) —
    on a finalized chain equal BN means equal state, but
    junk/duplicated RPC batches can carry CONFLICTING same-BN payloads,
    and a bare row_number over BN alone would pick a partition-order-
    dependent winner."""
    payload = sorted(
        c for c in obs.columns if c not in keys and c != bn_col and c not in prefer
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(bn_col).desc(),
        *[F.col(c).desc() for c in prefer],
        *[F.col(c).desc() for c in payload],
    )
    return (
        obs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def refresh_token_supply(assets: DataFrame, observations: DataFrame) -> DataFrame:
    """updateERC20TokenSupply: fold supply observations into the asset
    dim — an observation updates (total_supply, last_update_bn) only
    when its block is NEWER than the stored one; junk supplies validate
    to 0 but still refresh the block stamp (the reference writes the
    validated value unconditionally, indexer.js:2779-2788).

    assets: (asset, asset_type, symbol, total_supply decimal,
    last_update_bn). observations: (asset, total_supply, block_number).
    """
    best = _newest_per_key(
        observations.select(
            "asset",
            validate_bigint(F.col("total_supply")).alias("__new_supply"),
            F.col("block_number").alias("__new_bn"),
        ),
        ["asset"],
        "__new_bn",
    )
    out = assets.join(best, "asset", "left")
    fresher = F.col("__new_bn").isNotNull() & (
        F.col("last_update_bn").isNull() | (F.col("__new_bn") > F.col("last_update_bn"))
    )
    return out.select(
        *[c for c in assets.columns if c not in ("total_supply", "last_update_bn")],
        F.when(fresher, F.col("__new_supply")).otherwise(F.col("total_supply")).alias(
            "total_supply"
        ),
        F.when(fresher, F.col("__new_bn")).otherwise(F.col("last_update_bn")).alias(
            "last_update_bn"
        ),
    )


def upsert_nft_metadata(current: DataFrame, observations: DataFrame) -> DataFrame:
    """indexTokenURI: merge NFT (asset, token_id) metadata rows —
    insert unseen tokens, replace existing rows only when the
    observation's block is newer (the REPLACE keyed on lastUpdateBN,
    indexer.js:2936-2938). Columns: asset, token_id, holder, meta,
    token_uri, free, last_update_bn."""
    cols = ["asset", "token_id", "holder", "meta", "token_uri", "free", "last_update_bn"]
    # origin flag: an observation at the SAME block as the stored row
    # must NOT replace it (replace only when strictly newer); the flag
    # ranks right after the block number in the survivor window
    unioned = (
        current.select(*cols)
        .withColumn("__origin", F.lit(1))
        .unionByName(observations.select(*cols).withColumn("__origin", F.lit(0)))
    )
    return _newest_per_key(
        unioned, ["asset", "token_id"], "last_update_bn", prefer=("__origin",)
    ).drop("__origin")
