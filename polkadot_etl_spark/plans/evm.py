"""EVM (frontier-chain) silver tables: evmtxs and evmtransfers.

Reference behavior reproduced:
- evmtxs (schema/substrateetl/evmtxs.json; row assembly indexer.js
  dump_substrateetl evm branch; fee economics ethTool.js:819-918
  decorateTxn): one row per EVM transaction, tx × receipt joined on the
  hash, fee/burned_fee/txn_saving derived, method_id = 4-byte selector,
  signature resolved from a selector dim, params = the decoded
  ERC-20/721/1155 calldata when the selector is known.
- evmtransfers (schema/substrateetl/evmtransfers.json; log walk
  ethTool.js erc20/erc721/erc1155 ABI arms): one row per token-transfer
  log — ERC-20 Transfer (3 topics), ERC-721 Transfer (4 topics),
  ERC-1155 TransferSingle and TransferBatch (dynamic uint256[] ids and
  values decoded natively via the ABI head-tail layout).

Scale shape: both tables are pure map-side projections — selector
dispatch, word slicing, and limb arithmetic are all whole-stage-codegen
column expressions; the only join is tx × receipt on the unique hash
(co-partitioned at write time by the dump pipeline) and the tiny
broadcast of the 4-byte-signature dim. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polkadot_etl_spark.functions.evm import (
    log_array_base,
    ERC1155_SELECTORS,
    ERC20_SELECTORS,
    ERC721_SELECTORS,
    TRANSFER_BATCH_TOPIC,
    TRANSFER_SINGLE_TOPIC,
    TRANSFER_TOPIC,
    decode_token_calldata,
    decode_transfer_log,
    decorate_txn,
    log_uint_array,
    log_word,
)

# selector → canonical text signature (the reference resolves these from
# its signature store; the token-standard core is a fixed literal dim)
_KNOWN_SIGNATURES: dict[str, str] = {
    ERC20_SELECTORS["transfer"]: "transfer(address,uint256)",
    ERC20_SELECTORS["transferFrom"]: "transferFrom(address,address,uint256)",
    ERC20_SELECTORS["approve"]: "approve(address,uint256)",
    ERC721_SELECTORS["safeTransferFrom"]: "safeTransferFrom(address,address,uint256)",
    ERC721_SELECTORS["safeTransferFromData"]: "safeTransferFrom(address,address,uint256,bytes)",
    ERC1155_SELECTORS["safeTransferFrom"]: "safeTransferFrom(address,address,uint256,uint256,bytes)",
    ERC1155_SELECTORS["safeBatchTransferFrom"]: "safeBatchTransferFrom(address,address,uint256[],uint256[],bytes)",
}


def _signature_col(selector) -> F.Column:
    out = None
    for sel, sig in sorted(_KNOWN_SIGNATURES.items()):
        clause = selector == sel
        out = F.when(clause, sig) if out is None else out.when(clause, sig)
    return out


def evmtxs_table(txns: DataFrame, receipts: DataFrame) -> DataFrame:
    """The published evmtxs rows (schema/substrateetl/evmtxs.json) from
    raw tx + receipt frames — decorate_txn's fee economics re-keyed to
    the published column names, plus method_id/signature/params decode.

    Input columns are decorate_txn's contract (functions/evm.py); txns
    additionally carries block_time, extrinsic_id, extrinsic_hash,
    access_list when available."""
    opt = [c for c in ("block_time", "extrinsic_id", "extrinsic_hash", "access_list") if c in txns.columns]
    d = decorate_txn(txns.select(
        "hash", "block_hash", "block_number", "transaction_index", "from_addr",
        "to_addr", "chain_id", "nonce", "tx_type", "value", "gas", "gas_price",
        "max_fee_per_gas", "max_priority_fee_per_gas", "input", *opt,
    ), receipts)
    params = decode_token_calldata(F.col("input"))
    return d.select(
        F.col("transaction_hash").alias("hash"),
        F.col("nonce").cast("long").alias("nonce"),
        F.col("transaction_index").cast("int").alias("transaction_index"),
        F.col("from_addr").alias("from_address"),
        F.col("to_addr").alias("to_address"),
        F.col("value_raw").alias("value"),
        F.col("gas_limit").cast("long").alias("gas"),
        F.col("gas_price_wei").alias("gas_price"),
        F.col("input"),
        F.col("cumulative_gas_used").cast("long").alias("receipt_cumulative_gas_used"),
        F.col("gas_used").cast("long").alias("receipt_gas_used"),
        F.col("creates").alias("receipt_contract_address"),
        F.col("status").cast("int").alias("receipt_status"),
        (F.col("block_time") if "block_time" in d.columns else F.lit(None).cast("timestamp")).alias("block_timestamp"),
        F.col("block_number").cast("long").alias("block_number"),
        F.col("block_hash"),
        F.col("max_fee_per_gas_wei").alias("max_fee_per_gas"),
        F.col("max_priority_fee_per_gas_wei").alias("max_priority_fee_per_gas"),
        F.col("tx_type").cast("int").alias("transaction_type"),
        F.col("effective_gas_price_wei").alias("receipt_effective_gas_price"),
        F.col("fee"),
        F.col("txn_saving"),
        F.col("burned_fee"),
        (F.col("extrinsic_id") if "extrinsic_id" in d.columns else F.lit(None).cast("string")).alias("extrinsic_id"),
        (F.col("extrinsic_hash") if "extrinsic_hash" in d.columns else F.lit(None).cast("string")).alias("extrinsic_hash"),
        F.col("selector").alias("method_id"),
        _signature_col(F.col("selector")).alias("signature"),
        (F.col("access_list") if "access_list" in d.columns else F.lit(None).cast("string")).alias("access_list"),
        F.when(
            params.isNotNull(), F.to_json(params)
        ).alias("params"),
    )


def evmtransfers_table(logs: DataFrame) -> DataFrame:
    """The published evmtransfers rows from EVM logs(address, topics
    array<string>, data, transaction_hash, log_index, block_time,
    block_number, block_hash): one output row per token-transfer log;
    non-transfer logs drop out.

    TransferBatch ids/values decode natively from the dynamic-array
    tail (log_uint_array); single-token arms reuse decode_transfer_log.
    transfer_type ∈ {erc20, erc721, erc1155_single, erc1155_batch}."""
    topics = F.col("topics")
    t0 = F.lower(topics[0])
    n = F.size(topics)
    is_single = (
        ((t0 == TRANSFER_TOPIC) & n.isin(3, 4)) | (t0 == TRANSFER_SINGLE_TOPIC)
    )
    is_batch = t0 == TRANSFER_BATCH_TOPIC

    def addr(t):
        return F.concat(F.lit("0x"), F.lower(F.substring(t, 27, 40)))

    # tail bases materialize ONCE per head slot; inlining them into every
    # element position of the transform lambdas blows the generated
    # method past janino's 64 KB limit (measured: the final projection
    # fell out of whole-stage codegen)
    staged = (
        logs.where(is_single | is_batch)
        .withColumn("d", decode_transfer_log(topics, F.col("data")))
        .withColumn("__b0", F.when(is_batch, log_array_base(F.col("data"), 0)))
        .withColumn("__b1", F.when(is_batch, log_array_base(F.col("data"), 1)))
        .withColumn("__ids", log_uint_array(F.col("data"), base=F.col("__b0")))
        .withColumn("__vals", log_uint_array(F.col("data"), base=F.col("__b1")))
    )
    ids = F.col("__ids")
    vals = F.col("__vals")

    base = staged.select(
        F.col("address").alias("token_address"),
        F.when(is_batch, addr(topics[2])).otherwise(F.col("d.from_addr")).alias("from_address"),
        F.when(is_batch, addr(topics[3])).otherwise(F.col("d.to_addr")).alias("to_address"),
        F.when(is_batch, F.lit(None).cast("string"))
        .otherwise(
            F.coalesce(F.col("d.amount_raw"), F.col("d.token_id")).cast("string")
        )
        .alias("value"),
        F.lit(None).cast("double").alias("value_usd"),
        F.when(is_batch | (t0 == TRANSFER_SINGLE_TOPIC), addr(topics[1])).alias("operator"),
        F.when(is_batch, F.to_json(ids))
        .when(t0 == TRANSFER_SINGLE_TOPIC, F.to_json(F.array(F.col("d.token_id"))))
        .alias("token_ids"),
        F.when(is_batch, F.to_json(vals))
        .when(t0 == TRANSFER_SINGLE_TOPIC, F.to_json(F.array(F.col("d.amount_raw"))))
        .alias("token_values"),
        "transaction_hash",
        F.col("log_index").cast("int").alias("log_index"),
        F.col("block_time").alias("block_timestamp"),
        F.col("block_number").cast("long").alias("block_number"),
        "block_hash",
        F.when(is_batch, F.lit("erc1155_batch"))
        .when(t0 == TRANSFER_SINGLE_TOPIC, F.lit("erc1155_single"))
        .when(F.col("d.kind") == "erc721_transfer", F.lit("erc721"))
        .otherwise(F.lit("erc20"))
        .alias("transfer_type"),
    )
    return base


def accounts_evm_active(evmtxs: DataFrame) -> DataFrame:
    """The published accountsevmactive rows (schema/accountsevmactive.json;
    the Frontier twin of the accountsactive build, docs/DEFINITIONS.md:
    30-100): per day, every EVM transaction sender with its per-day
    transaction_count and last-seen ts.  The published table is
    date-partitioned by ts, so the day grain is internal (one groupBy on
    (day, from_address) with map-side partials — a single shuffle).
    """
    return (
        evmtxs.where(F.col("from_address").isNotNull())
        .groupBy(
            F.to_date("block_timestamp").alias("__d"),
            "from_address",
        )
        .agg(
            F.max("block_timestamp").alias("ts"),
            F.count(F.lit(1)).alias("transaction_count"),
        )
        .select("from_address", "ts", "transaction_count")
    )


def accounts_evm_passive(
    transfers: DataFrame,
    evmtxs: DataFrame,
    para_id: str,
    relay_chain: str,
) -> DataFrame:
    """The published accountsevmpassive rows (schema/accountsevmpassive.
    json; the Frontier twin of accountspassive, docs/DEFINITIONS.md:
    104-178): addresses touched by a transfer that day (sender OR
    receiver) that did NOT send any EVM transaction that day — J9
    anti-join, keyed on (day, address) so both sides co-partition on the
    same shuffle key.

    ``transfers`` needs (from_address, to_address, block_timestamp);
    ``evmtxs`` is the active side (from_address, block_timestamp).
    """
    touched = (
        transfers.select(
            F.to_date("block_timestamp").alias("__d"),
            F.col("from_address").alias("address"),
            F.col("block_timestamp").alias("ts"),
        )
        .unionByName(
            transfers.select(
                F.to_date("block_timestamp").alias("__d"),
                F.col("to_address").alias("address"),
                F.col("block_timestamp").alias("ts"),
            )
        )
        .where(F.col("address").isNotNull())
        .groupBy("__d", "address")
        .agg(F.max("ts").alias("ts"))
    )
    active = evmtxs.where(F.col("from_address").isNotNull()).select(
        F.to_date("block_timestamp").alias("__d"),
        F.col("from_address").alias("address"),
    )
    return (
        touched.join(active, ["__d", "address"], "left_anti")
        .select(
            F.lit(para_id).alias("para_id"),
            F.lit(relay_chain).alias("relay_chain"),
            "address",
            "ts",
        )
    )
