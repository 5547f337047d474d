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
    kv_str: Column | None = None,
    pv: Column | None = None,
    pv_str: Column | None = None,
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
        (
            F.to_json(kv)
            if kv is not None
            else (kv_str if kv_str is not None else null_s)
        ).alias("kv"),
        # pv is a struct packed to JSON; pv_str is an already-scalar pv
        # (e.g. a bare issuance string, snapshot/hydradx.js:192)
        (
            F.to_json(pv)
            if pv is not None
            else (pv_str if pv_str is not None else null_s)
        ).alias("pv"),
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


# ---------------------------------------------------------------------------
# Per-chain snapshot track extractors (substrate/snapshot/*.js)
# ---------------------------------------------------------------------------


def _dechex_str(c: Column) -> Column:
    """paraTool.dechexToIntStr: '0x1a2' → '418', decimal strings pass
    through — full u128 range via the base-10^12 limb decode (the
    snapshot pv contract keeps big balances as exact strings, e.g.
    snapshot/hydradx.js:176-180)."""
    from polkadot_etl_spark.plans.feeds import _u128_hex_to_str

    hex_body = F.lpad(F.regexp_replace(c, "^0x", ""), 32, "0")
    return F.when(c.startswith("0x"), _u128_hex_to_str(hex_body)).otherwise(c)


class ChainSnapshotter:
    """Base of the per-chain snapshot extractors (substrate/snapshot/
    snapshotter.js): a chain identity + a set of track builders, each
    turning one pallet's state entries (key_args JSON array + value JSON,
    the fixture-fed S10 contract) into normalized snapshot rows.

    Spark shape: every track is a pure projection (native JSON access +
    to_json packing); ticker decoration joins the chain's asset registry
    dim by broadcast — the reference's in-process assetMap
    (snapshot/hydradx.js:45-66 readAssetsFromFile)."""

    chain: dict = {"relay_chain": "polkadot", "para_id": 0, "id": "polkadot-0",
                   "chain_name": "Polkadot"}
    chain_decimals = 10
    source = "polkaholic"  # setSnapshotSource (snapshot/hydradx.js:25)

    def _rows(self, obs: DataFrame, *, section: str, storage: str, block: dict,
              **kw) -> DataFrame:
        return snapshot_rows(
            obs,
            section=section,
            storage=storage,
            source=self.source,
            chain=self.chain,
            block_number=F.lit(block["number"]),
            block_hash=F.lit(block["hash"]),
            ts=F.lit(block["ts"]).cast("timestamp"),
            **kw,
        )

    def total_issuance(self, entries: DataFrame, block: dict,
                       section: str = "tokens", storage: str = "totalIssuance",
                       track: str = "asset") -> DataFrame:
        """Generic per-currency issuance track — the shape shared by
        hydradx (snapshot/hydradx.js:183-194), interlay
        (snapshot/interlay.js:31-47) and bifrost's tokens/vtokenMinting
        maps (snapshot/bifrost.js:74-130): track_val = the currency-id
        JSON itself, pv = the dechexToIntStr issuance string."""
        cur = F.get_json_object("key_args", "$[0]")
        return self._rows(
            entries.withColumn("__cur", cur),
            section=section,
            storage=storage,
            block=block,
            track=F.lit(track),
            track_val=F.col("__cur"),
            kv_str=F.col("__cur"),
            pv_str=_dechex_str(F.col("value")),
        )

    @staticmethod
    def _ticker(entries: DataFrame, asset_registry: DataFrame, id_col: Column) -> DataFrame:
        """assetMap.get(assetID)?.symbol — broadcast dim decoration; ids
        missing from the registry keep a NULL ticker exactly like the
        reference's optional-chaining miss (hydradx.js:152)."""
        dim = F.broadcast(
            asset_registry.select(
                F.col("asset_id").alias("__aid"), F.col("symbol").alias("__ticker")
            )
        )
        return entries.join(dim, id_col == F.col("__aid"), "left")


class HydradxSnapshotter(ChainSnapshotter):
    """HydraDX (polkadot-2034, snapshot/hydradx.js): the omnipool AMM
    tracks — per-asset omnipool liquidity ('omniasset'), LP position NFTs
    ('liquidity'), and per-currency total issuance ('asset'); every u128
    field normalizes through dechexToIntStr into the pv blob as an exact
    decimal STRING."""

    chain = {"relay_chain": "polkadot", "para_id": 2034, "id": "polkadot-2034",
             "chain_name": "HydraDx"}
    chain_decimals = 12

    def omnipool_assets(self, entries: DataFrame, asset_registry: DataFrame,
                        block: dict) -> DataFrame:
        """omnipool.assets → track 'omniasset' (hydradx.js:195-216):
        track_val = asset id, kv = {id, ticker}, pv = state with
        hubReserve/shares/protocolShares/cap dechex-normalized."""
        aid = F.get_json_object("key_args", "$[0]").cast("long")
        e = self._ticker(entries.withColumn("__id", aid), asset_registry, aid)
        pv = F.struct(
            _dechex_str(F.get_json_object("value", "$.hubReserve")).alias("hubReserve"),
            _dechex_str(F.get_json_object("value", "$.shares")).alias("shares"),
            _dechex_str(F.get_json_object("value", "$.protocolShares")).alias(
                "protocolShares"
            ),
            _dechex_str(F.get_json_object("value", "$.cap")).alias("cap"),
            F.get_json_object("value", "$.tradable").alias("tradable"),
        )
        return self._rows(
            e,
            section="omnipool",
            storage="assets",
            block=block,
            track=F.lit("omniasset"),
            track_val=F.col("__id").cast("string"),
            kv=F.struct(F.col("__id").alias("id"), F.col("__ticker").alias("ticker")),
            pv=pv,
        )

    def omnipool_positions(self, entries: DataFrame, asset_registry: DataFrame,
                           block: dict) -> DataFrame:
        """omnipool.positions → track 'liquidity' (hydradx.js:218-240):
        keyed by position NFT id, track_val = the position's assetId, the
        price pair splits into price_1/price_2 (both dechex-normalized,
        array dropped)."""
        pos_id = F.get_json_object("key_args", "$[0]").cast("long")
        aid = F.get_json_object("value", "$.assetId").cast("long")
        e = self._ticker(entries.withColumn("__pid", pos_id).withColumn("__aid2", aid),
                         asset_registry, aid)
        pv = F.struct(
            F.col("__aid2").alias("assetId"),
            _dechex_str(F.get_json_object("value", "$.amount")).alias("amount"),
            _dechex_str(F.get_json_object("value", "$.shares")).alias("shares"),
            _dechex_str(F.get_json_object("value", "$.price[0]")).alias("price_1"),
            _dechex_str(F.get_json_object("value", "$.price[1]")).alias("price_2"),
        )
        return self._rows(
            e,
            section="omnipool",
            storage="positions",
            block=block,
            track=F.lit("liquidity"),
            track_val=F.col("__aid2").cast("string"),
            kv=F.struct(F.col("__pid").alias("id"), F.col("__ticker").alias("ticker")),
            pv=pv,
        )


_SNAPSHOTTERS: dict[str, type[ChainSnapshotter]] = {
    "hydradx": HydradxSnapshotter,
}


def get_snapshotter(chain_name: str) -> ChainSnapshotter:
    return _SNAPSHOTTERS.get(chain_name, ChainSnapshotter)()


def pubkey_ascii_name(pk: Column) -> Column:
    """paraTool.pubKeyHex2ASCII (paraTool.js:378-411): decode the
    human-readable identity of SYSTEM accounts — pubkeys prefixed
    'para' (0x70617261), 'sibl' or 'modl' whose bytes spell a name:
    trailing zero bytes strip, [A-Za-z/] bytes append to the name,
    other bytes accumulate (prepended — which exactly un-reverses a
    little-endian id) and render as ':<int>' when ≤ 2 bytes remain.
    '0x70617261d4070000…' → 'para:2004'. NULL for every non-system
    pubkey.

    Native higher-order fold over the byte pairs (≤ 32 elements — the
    HOF re-evaluation cost is bounded), so classifying a holder table
    stays in the JVM."""
    h = F.regexp_replace(F.lower(F.regexp_replace(pk, "^0x", "")), "(00)+$", "")
    prefix_ok = F.substring(h, 1, 8).isin("70617261", "7369626c", "6d6f646c")
    n_pairs = (F.length(h) / 2).cast("int")
    pairs = F.transform(
        F.sequence(F.lit(0), n_pairs - 1), lambda i: F.substr(h, i * 2 + 1, F.lit(2))
    )
    zero = F.struct(F.lit("").alias("out"), F.lit("").alias("rem"))

    def step(acc, p):
        c = F.conv(p, 16, 10).cast("int")
        is_name = (c == 47) | ((c >= 65) & (c <= 90)) | ((c >= 97) & (c <= 122))
        return F.struct(
            F.when(is_name, F.concat(acc["out"], F.char(c))).otherwise(acc["out"]).alias("out"),
            F.when(is_name, acc["rem"]).otherwise(F.concat(p, acc["rem"])).alias("rem"),
        )

    folded = F.aggregate(pairs, zero, step)
    tail = F.when(
        (F.length(folded["rem"]) > 0) & (F.length(folded["rem"]) <= 4),
        F.concat(F.lit(":"), F.conv(folded["rem"], 16, 10)),
    ).otherwise(F.lit(""))
    return F.when(
        prefix_ok & (F.length(h) >= 8), F.concat(folded["out"], tail)
    )


class AssetHubSnapshotter(ChainSnapshotter):
    """Polkadot AssetHub (polkadot-1000, snapshot/polkadot_assethub.js):
    the stablecoin distribution snapshot — per-currency assets.asset
    state (supply/deposit/minBalance/accounts/… comma-cleaned,
    :46-63) and the assets.account holder walk with the reference's
    selective-publish rule (:77-131): INDIVIDUAL rows for system-named
    accounts (pubKeyHex2ASCII hits), for small assets (the asset
    record's holder count ≤ the target), and for whales
    (balance/totalIssuance > 0.25%); everything else folds into ONE
    residual 'holders' row per currency with an exact big-int
    balance_raw sum and a holder count.

    Spark shape: the name decode and comma-cleaning are native column
    work; asset state broadcasts onto the holder scan; the residual is
    one partial-aggregated groupBy per currency — at 100 TB the holder
    walk is one scan + one tiny shuffle. The residual float balance is
    derived from the exact raw sum (the reference's incremental float
    `+=` is order-dependent; same value, deterministic)."""

    chain = {"relay_chain": "polkadot", "para_id": 1000, "id": "polkadot-1000",
             "chain_name": "Polkadot_AssetHub"}
    chain_decimals = 10
    TARGET_MAX_HOLDERS = 5000  # snapshot/polkadot_assethub.js:73
    WHALE_SHARE = 0.0025  # :91

    def stablecoin_assets(self, asset_entries: DataFrame) -> DataFrame:
        """assets.asset rows → (currency_id, supply, holder_cnt + the
        cleaned numeric fields) — the totalIssuanceMap."""
        num = lambda f: F.regexp_replace(  # noqa: E731 — toNumWithoutComma
            F.get_json_object("value", f"$.{f}"), ",", ""
        )
        return asset_entries.select(
            F.get_json_object("key_args", "$[0]").cast("long").alias("currency_id"),
            num("supply").try_cast("decimal(38,0)").alias("supply"),
            num("deposit").try_cast("decimal(38,0)").alias("deposit"),
            num("minBalance").try_cast("decimal(38,0)").alias("min_balance"),
            num("accounts").try_cast("long").alias("holder_cnt"),
            num("sufficients").try_cast("long").alias("sufficients"),
            num("approvals").try_cast("long").alias("approvals"),
        )

    def stablecoin_holders(
        self,
        asset_entries: DataFrame,
        account_entries: DataFrame,
        currency_list: dict[int, tuple[str, int]],
        target_max_holders: int | None = None,
    ) -> DataFrame:
        """The holder-walk publish (snapshot/polkadot_assethub.js:77-138).
        currency_list: {currency_id: (symbol, decimals)} — the
        reference's hard currencyList (:38-41)."""
        tmh = self.TARGET_MAX_HOLDERS if target_max_holders is None else target_max_holders
        assets = self.stablecoin_assets(asset_entries)
        cur = F.create_map(
            *[x for cid, (sym, _d) in sorted(currency_list.items())
              for x in (F.lit(cid), F.lit(sym))]
        )
        dec = F.create_map(
            *[x for cid, (_s, d) in sorted(currency_list.items())
              for x in (F.lit(cid), F.lit(d))]
        )
        a = account_entries.select(
            F.get_json_object("key_args", "$[0]").cast("long").alias("currency_id"),
            F.get_json_object("key_args", "$[1]").alias("address_pubkey"),
            F.regexp_replace(F.get_json_object("value", "$.balance"), ",", "")
            .try_cast("decimal(38,0)")
            .alias("balance_raw"),
        ).where(F.col("balance_raw").isNotNull())
        dim = F.broadcast(assets.select("currency_id", "supply", "holder_cnt"))
        j = (
            a.join(dim, "currency_id", "inner")
            .withColumn("symbol", cur[F.col("currency_id")])
            .withColumn("__dec", dec[F.col("currency_id")])
            .where(F.col("symbol").isNotNull())
            .withColumn("name", pubkey_ascii_name(F.col("address_pubkey")))
        )
        share = F.col("balance_raw").cast("double") / F.col("supply").cast("double")
        keep = (
            F.col("name").isNotNull()
            | (F.col("holder_cnt") <= F.lit(tmh))
            | (share > F.lit(self.WHALE_SHARE))
        )
        pow10 = F.pow(F.lit(10.0), F.col("__dec").cast("double"))
        individual = j.where(keep).select(
            "currency_id",
            "symbol",
            "name",
            "address_pubkey",
            (F.col("balance_raw").cast("double") / pow10).alias("balance"),
            F.col("balance_raw").cast("string").alias("balance_raw"),
            F.lit(None).cast("long").alias("holders"),
        )
        residual = (
            j.where(~keep)
            .groupBy("currency_id", "symbol", "__dec")
            .agg(
                F.sum("balance_raw").alias("__raw"),
                F.count(F.lit(1)).alias("holders"),
            )
            .select(
                "currency_id",
                "symbol",
                F.lit("holders").alias("name"),
                F.lit(None).cast("string").alias("address_pubkey"),
                (
                    F.col("__raw").cast("string").cast("double")
                    / F.pow(F.lit(10.0), F.col("__dec").cast("double"))
                ).alias("balance"),
                F.col("__raw").cast("string").alias("balance_raw"),
                "holders",
            )
        )
        return individual.unionByName(residual)


class AstarSnapshotter(ChainSnapshotter):
    """Astar (polkadot-2006, snapshot/astar.js): the dApp-staking v3
    tracks — per-(staker, dApp) stakerInfo (voting/buildAndEarn stakes
    decimalized through dechexToInt / 10^18, dApp identity split into
    type + address from the {"Evm"/"Wasm": addr} key, :174-208) and the
    integratedDApps registry (:279-294). The float decimalization
    parses the exact decimal STRING into a double before one IEEE
    division, so both engines see identical values (decimal→double
    direct casts differ by 1 ulp across engines)."""

    chain = {"relay_chain": "polkadot", "para_id": 2006, "id": "polkadot-2006",
             "chain_name": "Astar"}
    chain_decimals = 18

    def _decimalized(self, c: Column) -> Column:
        return _dechex_str(c).cast("double") / F.lit(float(10**self.chain_decimals))

    def staker_info(self, entries: DataFrame) -> DataFrame:
        """dappStaking.stakerInfo → one typed row per (staker, dApp):
        key = [ss58, {"Evm"/"Wasm": address}], value = {staked:
        {voting, buildAndEarn, era, period}, loyalStaker}."""
        dapp = F.get_json_object("key_args", "$[1]")
        dmap = F.from_json(dapp, "map<string,string>")
        staked = F.get_json_object("value", "$.staked")
        return entries.select(
            F.get_json_object("key_args", "$[0]").alias("address_ss58"),
            F.element_at(F.map_keys(dmap), 1).alias("dapp_type"),
            F.element_at(F.map_values(dmap), 1).alias("dapp_address"),
            self._decimalized(F.get_json_object(staked, "$.voting")).alias("voting"),
            self._decimalized(F.get_json_object(staked, "$.buildAndEarn")).alias(
                "build_and_earn"
            ),
            F.get_json_object(staked, "$.era").cast("int").alias("era"),
            F.get_json_object(staked, "$.period").cast("int").alias("period"),
            F.get_json_object("value", "$.loyalStaker").cast("boolean").alias("loyal"),
        )

    def integrated_dapps(self, entries: DataFrame) -> DataFrame:
        """dappStaking.integratedDApps → the dApp registry: key =
        [{"Evm"/"Wasm": address}], value = {owner, id, state}."""
        dapp = F.get_json_object("key_args", "$[0]")
        dmap = F.from_json(dapp, "map<string,string>")
        from polkadot_etl_spark.plans.garparsers import _dechex_int

        return entries.select(
            F.get_json_object("value", "$.owner").alias("owner"),
            F.element_at(F.map_keys(dmap), 1).alias("dapp_type"),
            F.element_at(F.map_values(dmap), 1).alias("dapp_address"),
            _dechex_int(F.get_json_object("value", "$.id")).alias("dapp_id"),
            (F.get_json_object("value", "$.state") == "Registered").alias("registered"),
        )


class InterlaySnapshotter(ChainSnapshotter):
    """Interlay (polkadot-2032, snapshot/interlay.js): the per-currency
    tokens.totalIssuance walk — entirely the generic issuance track."""

    chain = {"relay_chain": "polkadot", "para_id": 2032, "id": "polkadot-2032",
             "chain_name": "Interlay"}
    chain_decimals = 10


class BifrostSnapshotter(ChainSnapshotter):
    """Bifrost (polkadot-2030, snapshot/bifrost.js): native + per-token
    issuance plus the vtokenMinting.tokenPool liquid-staking pools —
    the same key/value shape on a different storage item, published
    under track 'vtoken' (:110-130)."""

    chain = {"relay_chain": "polkadot", "para_id": 2030, "id": "polkadot-2030",
             "chain_name": "Bifrost"}
    chain_decimals = 12

    def vtoken_pool(self, entries: DataFrame, block: dict) -> DataFrame:
        return self.total_issuance(
            entries, block, section="vtokenMinting", storage="tokenPool",
            track="vtoken",
        )


_SNAPSHOTTERS.update({
    "assethub": AssetHubSnapshotter,
    "astar": AstarSnapshotter,
    "interlay": InterlaySnapshotter,
    "bifrost": BifrostSnapshotter,
})
