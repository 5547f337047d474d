"""EthOn / schema.org JSON-LD export of decoded EVM activity
(substrate/jsonld.js): the reference renders decoded transactions into
semantic-web documents — `tx_to_jsonld` (jsonld.js:91-162: @context,
CreatesTx/CallTx/ValueTx typing, account nodes, gas/fee economics,
decodedInput byte/canonical signatures + typed params, decodedLogs as
EthOn LogEntry nodes with indexed topics), `account_to_jsonld` (:57-74,
optional evm:name), `kv_to_jsonld` (:10-22: address params become
Account nodes, everything else a typed evm:* literal), `log_to_jsonld`
(:25-44) and `topic_to_jsonld` (:1-8).

Spark shape: ONE nested struct per tx, field order = the reference's
insertion order, serialized with to_json — Spark drops null struct
fields exactly like JSON.stringify drops undefined-valued keys, so the
reference's conditional-field semantics (evm:name only when labeled,
the EIP-1559 fields only on type-2 txs, the decodedInput trio only when
the calldata decoded) fall out of nullability with no branching. Pure
column work, zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CONTEXT = {
    "schema": "https://schema.org/",
    "ethon": "https://ethon.consensys.net/",
    "evm": "https://polkaholic.io/types/",
}
ABI_URL_PREFIX = "https://evm.colorfulnotion.com/"  # jsonld.js:39,154


def account_node(address: Column, name: Column | None = None) -> Column:
    """account_to_jsonld: {@type, ethon:address} + evm:name only when
    labeled (jsonld.js:57-74)."""
    return F.struct(
        F.lit("ethon:Account").alias("@type"),
        address.alias("ethon:address"),
        (name if name is not None else F.lit(None).cast("string")).alias("evm:name"),
    )


def kv_node(ptype: Column, pname: Column, pvalue: Column) -> Column:
    """kv_to_jsonld: an 'address' param renders as an Account node
    carrying the param name; any other type as a typed evm:* literal
    (jsonld.js:10-22). One nullable struct serves both shapes — the
    unused fields drop out of the JSON."""
    is_addr = ptype == "address"
    return F.struct(
        F.when(is_addr, F.lit("ethon:Account"))
        .otherwise(F.concat(F.lit("evm:"), ptype))
        .alias("@type"),
        F.when(is_addr, pvalue).alias("ethon:address"),
        pname.alias("evm:name"),
        F.when(~is_addr, pvalue).alias("evm:value"),
    )


def topic_node(topic: Column, idx: Column) -> Column:
    """topic_to_jsonld (jsonld.js:1-8)."""
    return F.struct(
        idx.cast("int").alias("ethon:logTopicIndex"),
        topic.alias("ethon:logTopicData"),
    )


def log_node(
    topics: Column, log_data: Column, logged_by: Column, signature: Column,
    events: Column,
) -> Column:
    """log_to_jsonld (jsonld.js:25-44): indexed topics, the emitting
    account, the canonical signature, the selector-keyed abi URL and
    the decoded event kvs.

    The loggedBy node is typed ``evm:Account`` — the reference INLINES
    that @type in log_to_jsonld (jsonld.js:32-36) instead of reusing
    account_to_jsonld's ``ethon:Account``; we reproduce the published
    byte format, inconsistency included."""
    return F.struct(
        F.lit("ethon:LogEntry").alias("@type"),
        F.transform(topics, lambda t, i: topic_node(t, i)).alias("ethon:hasLogTopic"),
        log_data.alias("ethon:logData"),
        F.struct(
            F.lit("evm:Account").alias("@type"),
            logged_by.alias("ethon:address"),
        ).alias("ethon:loggedBy"),
        signature.alias("ethon:canonicalSignature"),
        # topics[0] (GetArrayItem), not element_at(topics, 1): identical
        # value for the always-present topic0, but element_at's generated
        # index-check branches trip an upstream expression-splitter bug
        # ('isNull_… is not an rvalue') in this projection's factory
        # codegen, silently degrading the stage to row-interpreted eval
        F.concat(F.lit(ABI_URL_PREFIX), topics[0], F.lit("/")).alias("evm:abi"),
        events.alias("ethon:event"),
    )


def tx_jsonld(
    *,
    creates: Column,
    tx_input: Column,
    chain_id: Column,
    chain_name: Column,
    tx_hash: Column,
    from_addr: Column,
    to_addr: Column,
    value: Column,
    gas_price: Column,
    tx_index: Column,
    nonce: Column,
    gas_limit: Column,
    gas_used: Column,
    block_hash: Column,
    block_number: Column,
    tx_type: Column,
    access_list: Column,
    fee: Column,
    burned_fee: Column,
    txn_saving: Column,
    cumulative_gas_used: Column,
    max_fee_per_gas: Column,
    max_priority_fee_per_gas: Column,
    base_fee_per_gas: Column,
    effective_gas_price: Column,
    method_id: Column,
    signature: Column,
    decoded_input: Column,
    decoded_logs: Column,
) -> Column:
    """tx_to_jsonld (jsonld.js:91-162) as ONE to_json-able struct, field
    order = the reference's insertion order. Nullable EIP-1559 /
    decodedInput fields drop from the serialized document exactly like
    the reference's undefined keys."""
    tx_type_node = (
        F.when(creates, F.lit("ethon:CreatesTx"))
        .when(F.length(tx_input) >= 10, F.lit("ethon:CallTx"))
        .otherwise(F.lit("ethon:ValueTx"))
    )
    has_decode = method_id.isNotNull()
    return F.struct(
        F.struct(
            *[F.lit(v).alias(k) for k, v in CONTEXT.items()]
        ).alias("@context"),
        tx_type_node.alias("@type"),
        F.struct(chain_id.alias("chainID"), chain_name.alias("name")).alias("evm:chain"),
        tx_hash.alias("ethon:txHash"),
        account_node(from_addr).alias("ethon:from"),
        account_node(to_addr).alias("ethon:to"),
        value.alias("ethon:value"),
        gas_price.alias("ethon:txGasPrice"),
        tx_index.alias("ethon:txIndex"),
        nonce.alias("ethon:txNonce"),
        tx_input.alias("ethon:msgPayload"),
        gas_limit.alias("ethon:msgGasLimit"),
        gas_used.alias("ethon:msgGasUsed"),
        gas_used.alias("ethon:txGasUsed"),
        block_hash.alias("evm:blockHash"),
        block_number.alias("evm:blockNumber"),
        tx_index.alias("evm:transactionIndex"),
        tx_type.alias("evm:txType"),
        access_list.alias("evm:accessList"),
        fee.alias("evm:txFee"),
        burned_fee.alias("evm:burnedFee"),
        txn_saving.alias("evm:txnSaving"),
        cumulative_gas_used.alias("evm:cumulativeGasUsed"),
        max_fee_per_gas.alias("evm:maxFeePerGas"),
        max_priority_fee_per_gas.alias("evm:maxPriorityFeePerGas"),
        base_fee_per_gas.alias("evm:baseFeePerGas"),
        effective_gas_price.alias("evm:effectiveGasPrice"),
        F.when(has_decode, method_id).alias("ethon:byteSignature"),
        F.when(has_decode, signature).alias("ethon:canonicalSignature"),
        F.when(has_decode, F.concat(F.lit(ABI_URL_PREFIX), method_id, F.lit("/"))).alias(
            "evm:abi"
        ),
        decoded_input.alias("evm:decodedInput"),
        decoded_logs.alias("evm:decodedLogs"),
    )
