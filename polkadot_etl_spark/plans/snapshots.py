"""The generic hourly state-snapshot publish (schema/snapshots.json).

Reference behavior reproduced:
- snapshot rows are heterogeneous state observations normalized to one
  contract — (section, storage) name the pallet/item, track/track_val an
  optional sub-key, kv/pv the key and parsed-value JSON blobs
  (priceManager.js:1013-1032 coingecko price rows; substrateetl.js:
  7807-7818 staking era points; nomination pool members :8030-8045);
- observations bucket to a CANONICAL HOUR — ts_to_snapshot maps an event
  time to the hourly snapshot block and only the FIRST observation per
  (track_val, snapshot hour) is kept (priceManager.js:1007-1012 `hit`
  dedup, :1035 canonicalTS = floor(ts/3600)*3600);
- the table is published hourly with partition replace
  (substrateetl.js:7134 bq load --time_partitioning_field=ts; the
  matching writer here is sources.tables.write_day_partitioned
  grain="hour").

Spark shape: normalization is a pure projection (to_json packs kv/pv —
JVM-side); the first-per-hour dedup is one rank window keyed on the same
(track_val, hour) the downstream reads group by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polkadot_etl_spark.schemas import SNAPSHOTS


def canonical_hour_ts(ts: Column) -> Column:
    """priceManager.js:1035 canonicalTS = floor(unix/3600)*3600, as a
    timestamp column (integer epoch math — pushes into codegen)."""
    return F.timestamp_seconds(F.floor(F.unix_timestamp(ts) / 3600) * 3600)


def snapshot_rows(
    observations: DataFrame,
    *,
    section: str,
    storage: str,
    source: str,
    chain: dict,
    block_number: Column,
    block_hash: Column,
    ts: Column,
    track: Column | None = None,
    track_val: Column | None = None,
    kv: Column | None = None,
    pv: Column | None = None,
    address_ss58: Column | None = None,
    address_pubkey: Column | None = None,
    dedup_first_per_hour: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """Normalize observation rows into the published snapshots contract.

    ``kv``/``pv`` are struct Columns (packed to JSON via to_json, so the
    blob is canonical and engine-stable for integral/string fields);
    ``chain`` supplies the relay_chain/para_id/id/chain_name identity
    literals.  With ``dedup_first_per_hour`` the reference's `hit` rule
    keeps only the earliest observation (by ``order_col``) per
    (track_val, canonical hour)."""
    null_s = F.lit(None).cast("string")
    out = observations.select(
        F.lit(chain.get("relay_chain")).alias("relay_chain"),
        F.lit(str(chain.get("para_id"))).alias("para_id"),
        F.lit(chain.get("id")).alias("id"),
        F.lit(chain.get("chain_name")).alias("chain_name"),
        canonical_hour_ts(ts).alias("ts"),
        block_number.cast("long").alias("block_number"),
        block_hash.alias("block_hash"),
        (address_ss58 if address_ss58 is not None else null_s).alias("address_ss58"),
        (address_pubkey if address_pubkey is not None else null_s).alias("address_pubkey"),
        F.lit(section).alias("section"),
        F.lit(storage).alias("storage"),
        (track if track is not None else null_s).alias("track"),
        (track_val if track_val is not None else null_s).alias("track_val"),
        (F.to_json(kv) if kv is not None else null_s).alias("kv"),
        (F.to_json(pv) if pv is not None else null_s).alias("pv"),
        F.lit(source).alias("source"),
        *( [F.col(order_col).alias("__ord")] if order_col else [] ),
    )
    if dedup_first_per_hour:
        w = Window.partitionBy("track_val", "ts").orderBy(F.col("__ord").asc())
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    if order_col:
        out = out.drop("__ord")
    return out.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in SNAPSHOTS.fields])
