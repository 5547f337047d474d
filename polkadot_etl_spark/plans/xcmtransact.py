"""XCM remote-execution (transact) tracing — the origination→destination
linkage of substrate/xcmtransact.js.

Reference behavior reproduced:

- an origination extrinsic qualifies when it carries events from the
  transact-relevant sections (xcmtransact.js:894-898); its per-event
  facts fold into one xcmInfo record (:913-982):
  xcmpQueue:XcmpMessageSent → msgHash linkage, xcmTransactor:
  TransactedSigned with an inner ethereumXcm:transact call → the remote
  EVM tx template (from = the multilocation-derivative account of the
  feePayer, :935-948), xTokens:TransferredMultiAssets → assets/fee +
  beneficiary (dest interior X2[1].AccountKey20, :1986-1999
  get_dest_beneficiary), transactionPayment:TransactionFeePaid and
  system:ExtrinsicSuccess;
- destination blocks link back two ways (indexDestinationChainBlock,
  :1055-1155): xcmpQueue:Success/Fail by msgHash (weight + error), and
  assets:Issued by beneficiary (owner);
- the derivative account is blake2_256(0x20 ++ 'multiloc' ++
  SCALE(XcmV1MultiLocation{parents:1, X2[Parachain(paraID),
  AccountKey20(key)]}))[:20/32] (calculateMultilocationDerivative,
  :1211-1228 — verified against the vector in that comment);
- matched remote EVM txs resolve to a destination transactionHash by
  (from = derivative, to = transact target) within the linked block
  (get_transaction_by_remoteEVMTx call at :1129-1138).

Spark shape: per-event extraction is native JSON column work; the
per-extrinsic fold is ONE groupBy(extrinsic) aggregate; both linkages
are keyed equi joins (msg_hash / beneficiary — day-scale fact⋈fact, the
keyed shuffle is the correct 100 TB plan); the only Python is the
Arrow-batched derivative codec (blake2 + SCALE compact, dim-scale input:
one row per TransactedSigned event).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# multilocation-derivative codec (xcmtransact.js:1211-1228)
# ---------------------------------------------------------------------------


def _scale_compact(n: int) -> bytes:
    if n < 64:
        return bytes([n << 2])
    if n < 2**14:
        return (n << 2 | 1).to_bytes(2, "little")
    if n < 2**30:
        return (n << 2 | 2).to_bytes(4, "little")
    raise ValueError(f"compact too large: {n}")


def multilocation_derivative(para_id: int, address: str) -> tuple[str, str]:
    """(20-byte, 32-byte) derivative accounts for a remote origin:
    blake2_256(0x20 ++ 'multiloc' ++ SCALE(XcmV1MultiLocation)) — the
    XCM DescendOrigin account derivation. XcmV1 SCALE layout: parents u8;
    Junctions::X2 = enum 2; Junction::Parachain = enum 0 + compact u32;
    Junction::AccountKey20 = enum 3 + NetworkId::Any (0) + 20 bytes;
    Junction::AccountId32 = enum 1 + NetworkId::Any + 32 bytes.
    Verified against the reference's inline vector
    (0x4423...dee55@1000 → 0x5c27c4bb7047083420eddff9cddac4a0a120b45c,
    xcmtransact.js:1222-1224)."""
    h = address[2:] if address.startswith("0x") else address
    key = bytes.fromhex(h)
    if len(key) == 20:
        account = bytes([3, 0]) + key  # AccountKey20{Any, key}
    elif len(key) == 32:
        account = bytes([1, 0]) + key  # AccountId32{Any, id}
    else:
        raise ValueError(f"address must be 20 or 32 bytes: {address}")
    scale = bytes([1, 2, 0]) + _scale_compact(int(para_id)) + account
    to_hash = bytes([32]) + b"multiloc" + scale
    digest = hashlib.blake2b(to_hash, digest_size=32).digest()
    return "0x" + digest[:20].hex(), "0x" + digest.hex()


_DERIV = T.StructType(
    [
        T.StructField("derivative20", T.StringType()),
        T.StructField("derivative32", T.StringType()),
    ]
)


@pandas_udf(_DERIV)
def u_derivative_account(para_id: pd.Series, address: pd.Series) -> pd.DataFrame:
    d20, d32 = [], []
    for p, a in zip(para_id, address):
        try:
            a20, a32 = multilocation_derivative(int(p), a)
        except (ValueError, TypeError):
            a20, a32 = None, None
        d20.append(a20)
        d32.append(a32)
    return pd.DataFrame({"derivative20": d20, "derivative32": d32})


# ---------------------------------------------------------------------------
# origination fold
# ---------------------------------------------------------------------------

_TRANSACT_SECTIONS = (
    "xcmpQueue",
    "xcmTransactor",
    "transactionPayment",
    "system",
    "xTokens",
    "assets",
)  # eventSections gate, xcmtransact.js:895


def origination_remote_exec(events: DataFrame, para_id: int) -> DataFrame:
    """Per-extrinsic xcmInfo.origination fold (index_origination_extrinsic,
    xcmtransact.js:889-984). ``events`` carry named-field JSON in ``data``
    (the decoded toHuman shape the reference walks). One groupBy on the
    extrinsic — every extraction is a map-side JSON projection first."""
    d = F.col("data")
    sec, meth = F.col("section"), F.col("method")
    e = events.where(sec.isin(*_TRANSACT_SECTIONS)).select(
        "extrinsic_id",
        "extrinsic_hash",
        "block_number",
        "block_time",
        F.when(
            (sec == "xcmpQueue") & (meth == "XcmpMessageSent"),
            F.get_json_object(d, "$.messageHash"),
        ).alias("__msg_hash"),
        F.when(
            (sec == "xcmTransactor") & (meth == "TransactedSigned"),
            F.get_json_object(d, "$.feePayer"),
        ).alias("__fee_payer"),
        # the inner call is only a remote-EVM template when it decodes to
        # ethereumXcm:transact (xcmtransact.js:941 'could be in proxy,
        # multisig, utility batch ... by no means perfect')
        F.when(
            (sec == "xcmTransactor")
            & (meth == "TransactedSigned")
            & (F.get_json_object(d, "$.call.section") == "ethereumXcm")
            & (F.get_json_object(d, "$.call.method") == "transact"),
            F.lower(
                F.get_json_object(d, "$.call.args.xcm_transaction.V1.action.Call")
            ),
        ).alias("__remote_to"),
        F.when(
            (sec == "xcmTransactor") & (meth == "TransactedSigned"),
            F.get_json_object(d, "$.call.args.xcm_transaction.V1.input"),
        ).alias("__remote_input"),
        F.when(
            (sec == "xTokens") & (meth == "TransferredMultiAssets"),
            F.lower(
                F.get_json_object(d, "$.dest.interior.X2[1].AccountKey20.key")
            ),
        ).alias("__beneficiary"),
        F.when(
            (sec == "xTokens") & (meth == "TransferredMultiAssets"),
            F.get_json_object(d, "$.assets"),
        ).alias("__assets_sent"),
        F.when(
            (sec == "transactionPayment") & (meth == "TransactionFeePaid"),
            F.get_json_object(d, "$.actualFee"),
        ).alias("__fee_paid"),
        ((sec == "system") & (meth == "ExtrinsicSuccess")).alias("__success"),
    )
    agg = e.groupBy("extrinsic_id", "extrinsic_hash").agg(
        F.min("block_number").alias("orig_block_number"),
        F.min("block_time").alias("orig_block_time"),
        F.array_sort(F.collect_set("__msg_hash")).alias("msg_hashes"),
        F.max("__fee_payer").alias("fee_payer"),
        F.max("__remote_to").alias("remote_to"),
        F.max("__remote_input").alias("remote_input"),
        F.max("__beneficiary").alias("beneficiary"),
        F.max("__assets_sent").alias("assets_sent"),
        F.max("__fee_paid").alias("fee_paid"),
        F.max("__success").alias("success"),
    )
    # derivative from-account for the remote template: the Arrow codec
    # runs once over the per-extrinsic aggregate (already folded — one
    # row per qualifying extrinsic; null fee payers yield null), and the
    # result is gated to extrinsics that actually carry a template
    deriv = u_derivative_account(F.lit(para_id), F.col("fee_payer"))
    return (
        agg.select("*", deriv.alias("__d"))
        .select(
            "*",
            F.when(
                F.col("remote_to").isNotNull(), F.col("__d.derivative20")
            ).alias("remote_from"),
        )
        .drop("__d")
        .where(F.size("msg_hashes") > 0)  # emit gate (xcmtransact.js:981)
    )


# ---------------------------------------------------------------------------
# destination observations + linkage
# ---------------------------------------------------------------------------


def destination_observations(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(msg-hash observations, assets:Issued observations) from a
    destination chain's events (indexDestinationChainBlock,
    xcmtransact.js:1069-1092)."""
    d = F.col("data")
    sec, meth = F.col("section"), F.col("method")
    q = events.where(
        (sec == "xcmpQueue") & meth.isin("Success", "Fail")
    ).select(
        F.get_json_object(d, "$.messageHash").alias("msg_hash"),
        (meth == "Success").alias("delivered"),
        F.when(meth == "Fail", F.get_json_object(d, "$.error")).alias("error"),
        F.get_json_object(d, "$.weight").alias("weight"),
        F.col("block_number").alias("dest_block_number"),
        F.col("block_time").alias("dest_block_time"),
    )
    issued = events.where((F.lower(sec) == "assets") & (meth == "Issued")).select(
        F.lower(F.get_json_object(d, "$.owner")).alias("owner"),
        F.get_json_object(d, "$.assetId").alias("issued_asset_id"),
        F.get_json_object(d, "$.totalSupply").alias("issued_amount"),
        F.col("block_number").alias("issued_block_number"),
    )
    return q, issued


def link_remote_execution(
    orig: DataFrame,
    dest_events: DataFrame,
    evm_txs: DataFrame | None = None,
    dest_para_id: int = 0,
    dest_id: str = "",
) -> DataFrame:
    """xcmInfo spans: origination extrinsics joined to destination
    observations by msg_hash (explode the per-extrinsic set — bounded:
    a handful of messages per extrinsic), decorated with the
    assets:Issued row matched by beneficiary in the same destination
    block, and — when a remote-EVM template exists — the destination EVM
    transaction matched by (from = derivative, to = transact target)
    (xcmtransact.js:1093-1143). All keyed equi joins."""
    q, issued = destination_observations(dest_events)
    o = orig.withColumn("msg_hash", F.explode("msg_hashes")).drop("msg_hashes")
    spans = o.join(q, "msg_hash", "inner")
    spans = spans.join(
        issued,
        (spans.beneficiary == issued.owner)
        & (spans.dest_block_number == issued.issued_block_number),
        "left",
    ).drop("owner", "issued_block_number")
    if evm_txs is not None:
        tx = evm_txs.select(
            F.lower(F.col("from_address")).alias("__tf"),
            F.lower(F.col("to_address")).alias("__tt"),
            F.col("block_number").alias("__tb"),
            F.col("transaction_hash").alias("remote_tx_hash"),
        )
        spans = spans.join(
            tx,
            (spans.remote_from == F.col("__tf"))
            & (spans.remote_to == F.col("__tt"))
            & (spans.dest_block_number == F.col("__tb")),
            "left",
        ).drop("__tf", "__tt", "__tb")
    else:
        spans = spans.withColumn("remote_tx_hash", F.lit(None).cast("string"))
    return spans.select(
        "extrinsic_id",
        "extrinsic_hash",
        "orig_block_number",
        "msg_hash",
        "delivered",
        "error",
        "weight",
        F.lit(dest_id).alias("dest_id"),
        F.lit(dest_para_id).alias("dest_para_id"),
        "dest_block_number",
        "dest_block_time",
        "beneficiary",
        "issued_asset_id",
        "issued_amount",
        "fee_paid",
        "success",
        "remote_from",
        "remote_to",
        "remote_tx_hash",
    )
