"""XCM cross-chain matching — the reference's hardest distinctive
semantics (SURVEY §2.3 J1/J2, §2.5 W2, §2.4 A6/A9; Phase 5).

Reference behavior reproduced:
- xcmmessages_match (xcmmanager.js:417-497): source (incoming=0) ×
  dest (incoming=1) on (msgHash, chainID, chainIDDest), band
  0 <= d.sentAt - s.sentAt <= 4, ORDER BY (diffSentAt, diffTS) first-match
  wins; dedup of repeated dest observations (:609-646).
- xcmCleaner transfer↔candidate fuzzy match (:569-700): candidate window,
  exact amount match (amountReceived + teleportFees == amountSent) →
  confidence 1.0, else fee-distribution z-score; keep best if > 0.5.
- teleport-fee stats per (symbol, chainIDDest) with std=0 → avg*0.2
  fallback (substrateetl.js:3201).
- update_xcm_summary channel rollup (substrateetl.js:5221-5300).

All shuffles are on the msgHash equi-key; the band/tolerance predicates
are post-filters; tie-breaks are total-ordered windows → reproducible
output (critical for the reference's "confidence" semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_messages(messages: DataFrame) -> DataFrame:
    """U3: the same (msgHash, incoming, sentAt) observed over consecutive
    blocks collapses to the earliest observation (xcmmessages_dedup)."""
    w = Window.partitionBy("msgHash", "incoming", "sentAt").orderBy(
        F.col("blockNumber").asc()
    )
    return (
        messages.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def match_messages(messages: DataFrame, max_sent_lag: int = 4) -> DataFrame:
    """J1+W2: source↔dest pairing with first-match-wins tie-break.

    Output: one row per matched (msgHash, dest observation) carrying both
    block numbers, sentAt lag and TS diff.
    """
    m = dedup_messages(messages)
    src = m.where(F.col("incoming") == 0).select(
        "msgHash",
        "chainID",
        "chainIDDest",
        F.col("blockNumber").alias("blockNumberSource"),
        F.col("sentAt").alias("sentAtSource"),
        F.col("sourceTS"),
    )
    dst = m.where(F.col("incoming") == 1).select(
        F.col("msgHash").alias("d_msgHash"),
        F.col("chainID").alias("d_chainID"),
        F.col("chainIDDest").alias("d_chainIDDest"),
        F.col("blockNumber").alias("blockNumberDest"),
        F.col("sentAt").alias("sentAtDest"),
        F.col("destTS"),
    )
    joined = src.join(
        dst,
        (src.msgHash == dst.d_msgHash)
        & (src.chainID == dst.d_chainID)
        & (src.chainIDDest == dst.d_chainIDDest),
    ).where(
        (F.col("sentAtDest") - F.col("sentAtSource")).between(0, max_sent_lag)
    )
    joined = joined.withColumn(
        "diffSentAt", F.col("sentAtDest") - F.col("sentAtSource")
    ).withColumn("diffTS", F.col("destTS") - F.col("sourceTS"))
    # first-match-wins per (msgHash, dest observation): smallest sentAt lag,
    # then smallest TS diff, then block number as the total-order tie-break
    w = Window.partitionBy("msgHash", "blockNumberDest").orderBy(
        F.col("diffSentAt").asc(), F.col("diffTS").asc(), F.col("blockNumberSource").asc()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "d_msgHash", "d_chainID", "d_chainIDDest")
        .withColumn("matched", F.lit(1))
    )


def teleport_fee_stats(candidates: DataFrame) -> DataFrame:
    """A6: avg/std of teleport fees per (symbol proxy, chainIDDest); the
    reference keys by symbol — candidates don't carry symbol, so callers
    join it in first. std=0 or null → avg*0.2 (substrateetl.js:3201)."""
    s = candidates.groupBy("symbol", "chainIDDest").agg(
        F.avg(F.col("xcmTeleportFees").cast("double")).alias("avg_fee"),
        F.stddev_samp(F.col("xcmTeleportFees").cast("double")).alias("std_fee"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return s.withColumn(
        "std_fee_adj",
        F.when(
            F.coalesce(F.col("std_fee"), F.lit(0.0)) == 0, F.col("avg_fee") * 0.2
        ).otherwise(F.col("std_fee")),
    )


def match_transfers(
    transfers: DataFrame,
    candidates: DataFrame,
    ts_lookback: int = 10,
    ts_lookahead: int = 120,
    min_confidence: float = 0.5,
) -> DataFrame:
    """J2: fuzzy transfer↔destination-candidate match with confidence.

    exact (amountReceived + xcmTeleportFees == amountSent) → 1.0;
    else z = |amountSent - amountReceived - avgFee| / stdFeeAdj over the
    per-(symbol, dest) teleport-fee distribution, confidence = 1/(1+z),
    keep the best candidate per transfer if confidence > min_confidence.
    """
    # De-skew: a hot msgHash (replayed/spammy message) would materialize
    # k·m pairs before the time-band filter. Composite key adds a time
    # bucket of width lookback+lookahead: any candidate inside the band
    # [sourceTS - lookback, sourceTS + lookahead] falls in the bucket of
    # the band's left edge or of its right edge, so each transfer probes
    # exactly those (≤2 distinct) buckets and per-task pair counts are
    # bounded by per-bucket density, not per-hash lifetime counts.
    bucket_w = ts_lookback + ts_lookahead
    cand = candidates.select(
        F.col("msgHash").alias("c_msgHash"),
        F.col("chainIDDest").alias("c_chainIDDest"),
        F.col("sentAt").alias("c_sentAt"),
        F.col("destTS").alias("c_destTS"),
        F.col("blockNumberDest"),
        F.col("amountReceived"),
        F.col("xcmTeleportFees"),
        F.col("eventID").alias("destEventID"),
        F.floor(F.col("destTS") / F.lit(bucket_w)).alias("c_bucket"),
    )
    probe = transfers.withColumn(
        "probe_bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("sourceTS") - ts_lookback) / F.lit(bucket_w)),
                    F.floor((F.col("sourceTS") + ts_lookahead) / F.lit(bucket_w)),
                )
            )
        ),
    )
    j = probe.join(
        cand,
        (probe.msgHash == cand.c_msgHash)
        & (probe.chainIDDest == cand.c_chainIDDest)
        & (probe.probe_bucket == cand.c_bucket),
    ).where(
        F.col("c_destTS").between(
            F.col("sourceTS") - ts_lookback, F.col("sourceTS") + ts_lookahead
        )
    ).drop("probe_bucket", "c_bucket")
    # alias the stats-side key columns explicitly: both sides descend from
    # `transfers`, and comparing same-named columns across shared lineage
    # relies on Spark's auto-disambiguation (it works — distinct attribute
    # ids in the optimized plan — but logs a trivially-true warning and is
    # one refactor away from a silent self-compare)
    stats = teleport_fee_stats(
        candidates.join(
            transfers.select("msgHash", "symbol").dropDuplicates(), "msgHash", "left"
        )
    ).select(
        F.col("symbol").alias("s_symbol"),
        F.col("chainIDDest").alias("s_chainIDDest"),
        "avg_fee",
        "std_fee_adj",
    )
    j = j.join(
        F.broadcast(stats),
        (j.symbol == stats.s_symbol) & (j.c_chainIDDest == stats.s_chainIDDest),
        "left",
    ).drop("s_symbol")

    exact = (F.col("amountReceived") + F.col("xcmTeleportFees")) == F.col("amountSent")
    resid = (
        F.col("amountSent").cast("double")
        - F.col("amountReceived").cast("double")
        - F.coalesce(F.col("avg_fee"), F.lit(0.0))
    )
    z = F.abs(resid) / F.greatest(F.col("std_fee_adj"), F.lit(1e-9))
    confidence = F.when(exact, F.lit(1.0)).otherwise(
        F.lit(1.0) / (F.lit(1.0) + z)
    )
    scored = j.withColumn("confidence", confidence)
    w = Window.partitionBy("extrinsicID", "transferIndex", "xcmIndex").orderBy(
        F.col("confidence").desc(), F.col("c_destTS").asc(), F.col("blockNumberDest").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("confidence") > min_confidence))
        .drop("__rn", "c_msgHash", "c_chainIDDest", "s_chainIDDest")
    )


def xcm_channel_summary(matched_transfers: DataFrame) -> DataFrame:
    """A9: daily per-channel rollup (update_xcm_summary)."""
    return (
        matched_transfers.withColumn(
            "log_dt", F.to_date(F.timestamp_seconds(F.col("sourceTS")))
        )
        .groupBy("chainID", "chainIDDest", "symbol", "log_dt")
        .agg(
            F.count(F.lit(1)).alias("num_transfers"),
            F.sum(F.coalesce(F.col("amountSentUSD"), F.lit(0.0)).cast("decimal(38,10)"))
            .cast("double")
            .alias("sum_usd"),
            F.avg("confidence").alias("avg_confidence"),
        )
    )


def xcmtransfers_wide(matched: DataFrame, chains: DataFrame) -> DataFrame:
    """The PUBLISHED wide xcmtransfers table (schema/xcmtransfers.json;
    dump_xcm flatten, substrateetl.js:5068-5165): one denormalized
    origination_*/destination_* row per matched transfer.

    ``matched`` is match_transfers output decorated by the caller with
    the origination extrinsic metadata the reference's indexer packs into
    xcmInfo (section, method, txFee/txFeeUSD, sender ss58+pubkey,
    beneficiary ss58+pubkey, transactionHash, isMsgSent, isFeeItem,
    destExtrinsicID, destExecutionStatus, priceUSD, amountSentUSD,
    amountReceivedUSD, xcmInfoLastUpdateTS).  ``chains`` is the chain
    registry dim (chainID, id, chain_name, para_id) — dim-scale, joined
    twice (origin + destination) as BROADCAST hash joins so the fact side
    never shuffles.

    Reference rules reproduced:
    - destination_execution_status (:5095): success iff destStatus == 1
      OR the xcmInfo destination reports success OR amountReceived > 0,
      else "unknown";
    - fee coalesces (:5128-5131): txFee/txFeeUSD → 0, is_msg_sent /
      is_fee_item → false; both *_fee_symbol columns repeat the transfer
      symbol (:5130, :5144);
    - xcm_info (:5152): the origination/destination blob, re-emitted as
      canonical JSON (to_json of the assembled struct — the reference
      round-trips the indexer's blob; we rebuild it from columns).

    The final projection iterates schemas.XCMTRANSFERS_WIDE, so column
    names, order, and types match the published contract by construction.
    """
    from polkadot_etl_spark.schemas import XCMTRANSFERS_WIDE

    o_dim = F.broadcast(
        chains.select(
            F.col("chainID").alias("__o_chain"),
            F.col("id").alias("__o_id"),
            F.col("chain_name").alias("__o_name"),
            F.col("para_id").alias("__o_para"),
        )
    )
    d_dim = F.broadcast(
        chains.select(
            F.col("chainID").alias("__d_chain"),
            F.col("id").alias("__d_id"),
            F.col("chain_name").alias("__d_name"),
            F.col("para_id").alias("__d_para"),
        )
    )
    m = matched.join(o_dim, matched.chainID == F.col("__o_chain"), "left").join(
        d_dim, matched.chainIDDest == F.col("__d_chain"), "left"
    )

    success = (
        (F.col("destStatus") == 1)
        | (F.col("destExecutionStatus") == "success")
        | (F.col("amountReceived") > 0)
    )
    origination = F.struct(
        F.col("__o_id").alias("id"),
        F.col("__o_name").alias("chainName"),
        F.col("__o_para").alias("paraID"),
        F.col("extrinsicHash").alias("extrinsicHash"),
        F.col("extrinsicID").alias("extrinsicID"),
        F.col("senderSS58").alias("sender"),
        F.col("blockNumber").alias("blockNumber"),
        F.col("section").alias("section"),
        F.col("method").alias("method"),
        F.col("amountSent").cast("long").alias("amountSent"),
        F.col("sourceTS").alias("ts"),
    )
    destination = F.struct(
        F.col("__d_id").alias("id"),
        F.col("__d_name").alias("chainName"),
        F.col("__d_para").alias("paraID"),
        F.col("beneficiarySS58").alias("beneficiary"),
        F.col("blockNumberDest").alias("blockNumber"),
        F.col("destEventID").alias("eventID"),
        F.col("amountReceived").cast("long").alias("amountReceived"),
        F.col("xcmTeleportFees").cast("long").alias("teleportFee"),
        F.col("c_destTS").alias("ts"),
        F.when(success, F.lit("success")).otherwise(F.lit("unknown")).alias("executionStatus"),
    )

    cols = {
        "symbol": F.col("symbol"),
        "xcm_interior_key": F.col("xcmInteriorKey")
        if "xcmInteriorKey" in matched.columns
        else F.lit(None),
        "xcm_interior_keys_unregistered": F.lit(None),
        "price_usd": F.col("priceUSD"),
        "origination_ts": F.timestamp_seconds(F.col("sourceTS")),
        "origination_chain_name": F.col("__o_name"),
        "origination_id": F.col("__o_id"),
        "origination_extrinsic_hash": F.col("extrinsicHash"),
        "origination_extrinsic_id": F.col("extrinsicID"),
        "origination_transfer_index": F.col("transferIndex"),
        "origination_xcm_index": F.col("xcmIndex"),
        "origination_transaction_hash": F.col("transactionHash"),
        "origination_msg_hash": F.col("msgHash"),
        "origination_is_msg_sent": F.coalesce(F.col("isMsgSent").cast("boolean"), F.lit(False)),
        "origination_block_number": F.col("blockNumber"),
        "origination_para_id": F.col("__o_para"),
        "origination_section": F.col("section"),
        "origination_method": F.col("method"),
        "origination_sender_ss58": F.col("senderSS58"),
        "origination_sender_pub_key": F.col("senderPubKey"),
        "origination_amount_sent": F.col("amountSent").cast("double"),
        "origination_amount_sent_usd": F.col("amountSentUSD"),
        "origination_tx_fee": F.coalesce(F.col("txFee"), F.lit(0.0)),
        "origination_tx_fee_usd": F.coalesce(F.col("txFeeUSD"), F.lit(0.0)),
        "origination_tx_fee_symbol": F.col("symbol"),
        "origination_is_fee_item": F.coalesce(F.col("isFeeItem").cast("boolean"), F.lit(False)),
        "origination_sent_at": F.col("sentAt"),
        "destination_execution_status": F.when(success, F.lit("success")).otherwise(
            F.lit("unknown")
        ),
        "destination_chain_name": F.col("__d_name"),
        "destination_id": F.col("__d_id"),
        "destination_para_id": F.col("__d_para"),
        "destination_beneficiary_ss58": F.col("beneficiarySS58"),
        "destination_beneficiary_pub_key": F.col("beneficiaryPubKey"),
        "destination_extrinsic_id": F.col("destExtrinsicID"),
        "destination_event_id": F.col("destEventID"),
        "destination_block_number": F.col("blockNumberDest"),
        "destination_ts": F.timestamp_seconds(F.col("c_destTS")),
        "destination_amount_received": F.col("amountReceived").cast("double"),
        "destination_amount_received_usd": F.col("amountReceivedUSD"),
        "destination_teleport_fee": F.col("xcmTeleportFees").cast("double"),
        "destination_teleport_fee_usd": F.col("teleportFeeUSD")
        if "teleportFeeUSD" in matched.columns
        else F.lit(None),
        "destination_teleport_fee_symbol": F.col("symbol"),
        "xcm_info": F.to_json(
            F.struct(origination.alias("origination"), destination.alias("destination"))
        ),
        "xcm_info_last_update_time": F.timestamp_seconds(F.col("xcmInfoLastUpdateTS")),
    }
    return m.select(
        *[cols[f.name].cast(f.dataType).alias(f.name) for f in XCMTRANSFERS_WIDE.fields]
    )


def xcm_messages_wide(messages: DataFrame, chains: DataFrame) -> DataFrame:
    """The PUBLISHED per-day xcm messages table (schema/xcm.json; the
    second flatten inside dump_xcm, substrateetl.js:5176-5214): one row
    per message with para-id/chain-id decoration
    (paraTool.getParaIDfromChainID / getIDByChainID → the chains dim,
    joined twice as BROADCAST hash joins) and the interior-key arrays
    passed through as JSON.

    ``messages`` carries the xcm MySQL row columns (schemas.XCMMESSAGES
    naming): msgHash, chainID, chainIDDest, relayedAt, includedAt,
    msgType, blockTS, msgStr, msgHex, version, xcmInteriorKeys,
    xcmInteriorKeysUnregistered.  The projection iterates
    schemas.XCM_WIDE so names/order/types match the contract."""
    from polkadot_etl_spark.schemas import XCM_WIDE

    o_dim = F.broadcast(
        chains.select(
            F.col("chainID").alias("__o_chain"),
            F.col("id").alias("__o_id"),
            F.col("para_id").alias("__o_para"),
        )
    )
    d_dim = F.broadcast(
        chains.select(
            F.col("chainID").alias("__d_chain"),
            F.col("id").alias("__d_id"),
            F.col("para_id").alias("__d_para"),
        )
    )
    m = messages.join(o_dim, messages.chainID == F.col("__o_chain"), "left").join(
        d_dim, messages.chainIDDest == F.col("__d_chain"), "left"
    )
    cols = {
        "msg_hash": F.col("msgHash"),
        "origination_ts": F.timestamp_seconds(F.col("blockTS")),
        "origination_para_id": F.col("__o_para"),
        "destination_para_id": F.col("__d_para"),
        "origination_id": F.col("__o_id"),
        "destination_id": F.col("__d_id"),
        "relayed_at": F.col("relayedAt"),
        "included_at": F.col("includedAt"),
        "msg": F.col("msgStr"),
        "msg_hex": F.col("msgHex"),
        "msg_type": F.col("msgType"),
        "version": F.col("version"),
        "xcm_interior_keys": F.col("xcmInteriorKeys"),
        "xcm_interior_keys_unregistered": F.col("xcmInteriorKeysUnregistered"),
    }
    return m.select(
        *[cols[f.name].cast(f.dataType).alias(f.name) for f in XCM_WIDE.fields]
    )
