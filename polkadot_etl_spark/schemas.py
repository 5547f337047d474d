"""StructType registry — the engine's schema catalog.

Transcribes the reference's published table contracts into Spark schemas
(SURVEY §1.2): the BigQuery JSON schema files (/root/reference/schema/*.json,
substrate/schema/substrateetl/*.json) and the MySQL hot tables
(substrate/schema/polkaholic.sql). Type mapping follows SURVEY §1.3:

- STRING/INTEGER/FLOAT/BOOLEAN/TIMESTAMP → String/Long/Double/Boolean/Timestamp
- BigQuery NUMERIC (u128 raw amounts, transfers.json:112) → DecimalType(38,0)
- u128 that can exceed 38 digits (balances free_raw, balances.json:54) →
  kept as exact STRING alongside the float column, like the reference
- JSON payloads (params/data/call_args/pv/spec) → JSON string columns,
  promoted to typed structs via from_json where a pallet schema is known
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.StringType(), nullable)


def _i(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.IntegerType(), nullable)


def _l(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.LongType(), nullable)


def _d(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.DoubleType(), nullable)


def _b(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.BooleanType(), nullable)


def _ts(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.TimestampType(), nullable)


def _dec(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.DecimalType(38, 0), nullable)


# ref: schema/blocks.json:1-88
BLOCKS = T.StructType(
    [
        _s("hash", False),
        _s("parent_hash", False),
        _l("number", False),
        _s("state_root", False),
        _s("extrinsics_root", False),
        _ts("block_time", False),
        _s("author_ss58"),
        _s("author_pub_key"),
        _i("spec_version", False),
        _l("relay_block_number"),
        _s("relay_state_root"),
        _i("extrinsic_count"),
        _i("event_count"),
        _i("transfer_count"),
        _i("trace_count"),
    ]
)

# ref: schema/extrinsics.json:1-96
EXTRINSICS = T.StructType(
    [
        _s("hash", False),
        _s("extrinsic_id", False),  # "{bn}-{idx}"
        _ts("block_time", False),
        _l("block_number", False),
        _s("block_hash"),
        _s("lifetime"),  # JSON {isImmortal, birth, death}
        _s("section"),
        _s("method", False),
        _s("params"),  # JSON
        _d("fee"),
        _d("fee_usd"),
        _l("weight"),
        _b("signed"),
        _s("signer_ss58"),
        _s("signer_pub_key"),
    ]
)

# ref: schema/events.json:1-63
EVENTS = T.StructType(
    [
        _s("event_id", False),  # "{bn}-{extIdx}-{evIdx}"
        _s("section", False),
        _s("method", False),
        _s("data", False),  # JSON array (positional args)
        _s("extrinsic_id", False),
        _s("extrinsic_hash", False),
        _ts("block_time", False),
        _l("block_number", False),
        _s("block_hash", False),
        _s("data_decoded"),  # JSON
    ]
)

# ref: substrate/schema/substrateetl/logs.json:1-32 — one row per digest
# log of a block, log_id = "{blockNumber}-{logIndex}" (substrateetl.js:6462-6473)
LOGS = T.StructType(
    [
        _s("log_id", False),
        _s("block_hash", False),
        _ts("block_time", False),
        _l("block_number", False),
        _s("log", False),  # raw digest log JSON (BigQuery JSON column)
    ]
)

# Bronze-layer block rows as the indexer hands them to dump_day: the
# published BLOCKS header fields plus the raw digest logs that the logs
# silver table is exploded from (substrateetl.js:6293-6309 header map,
# :6462 hdr.digest.logs). No counts — those are derived from the child
# tables during the dump.
RAW_BLOCKS = T.StructType(
    [
        _l("number", False),
        _s("hash", False),
        _s("parent_hash"),
        _s("state_root"),
        _s("extrinsics_root"),
        _ts("block_time", False),
        _s("author_ss58"),
        _s("author_pub_key"),
        _i("spec_version"),
        _l("relay_block_number"),
        _s("relay_state_root"),
        T.StructField("digest_logs", T.ArrayType(T.StringType()), True),
    ]
)

# ref: schema/calls.json:1-140 (flattened call tree)
CALLS = T.StructType(
    [
        _s("relay_chain", False),
        _i("para_id", False),
        _s("id"),
        _s("block_hash"),
        _l("block_number", False),
        _ts("block_time", False),
        _s("extrinsic_hash", False),
        _s("extrinsic_id", False),
        _s("extrinsic_section"),
        _s("extrinsic_method"),
        _s("call_id", False),  # path id "0-1-2"
        _s("call_index"),  # 2-byte hex
        _s("call_section"),
        _s("call_method"),
        _s("call_args"),  # JSON
        _s("call_args_def"),  # JSON
        _b("root"),
        _b("leaf"),
        _d("fee"),  # non-null only at root (substrateetl.js:6409-6416)
        _d("fee_usd"),
        _l("weight"),
        _b("signed"),
        _s("signer_ss58"),
        _s("signer_pub_key"),
        _s("lifetime"),
    ]
)

# ref: schema/transfers.json:1-120
TRANSFERS = T.StructType(
    [
        _s("event_id", False),
        _s("section", False),
        _s("method", False),
        _s("extrinsic_id", False),
        _s("extrinsic_hash", False),
        _ts("block_time", False),
        _l("block_number", False),
        _s("block_hash", False),
        _s("from_ss58", False),
        _s("from_pub_key", False),
        _s("to_ss58", False),
        _s("to_pub_key", False),
        _s("asset"),
        _d("price_usd"),
        _d("amount_usd"),
        _s("symbol"),
        _i("decimals"),
        _d("amount"),  # decimalized: raw_amount / 10^decimals
        _dec("raw_amount", False),  # exact u128 (BigQuery NUMERIC)
    ]
)

# ref: schema/balances.json:1-112 (daily snapshot; *_raw kept as exact strings)
BALANCES = T.StructType(
    [
        _s("symbol"),
        _s("address_ss58"),
        _s("address_pubkey"),
        _ts("ts"),
        _s("id"),
        _s("chain_name"),
        _s("asset"),
        _i("para_id"),
        _d("free"),
        _d("free_usd"),
        _s("free_raw"),
        _d("reserved"),
        _d("reserved_usd"),
        _s("reserved_raw"),
        _d("misc_frozen"),
        _d("misc_frozen_usd"),
        _s("misc_frozen_raw"),
        _d("frozen"),
        _d("frozen_usd"),
        _s("frozen_raw"),
        _d("price_usd"),
        _i("nonce"),
    ]
)

# ref: schema/stakings.json:1-160 (per-era snapshot)
STAKINGS = T.StructType(
    [
        _s("address_ss58"),
        _s("address_pubkey"),
        _s("section"),
        _s("storage"),
        _s("track"),
        _l("block_number"),
        _s("block_hash"),
        _ts("ts", False),
        _i("era"),
        _i("submitted_in"),
        _b("suppressed"),
        _d("validator_total"),
        _d("validator_own"),
        _d("validator_commission"),
        _d("validator_reward_shares"),
        _i("validator_reward_points"),
        _d("validator_staking_rewards"),
        _d("total_staked"),
        _i("total_reward_points"),
        _d("total_staking_rewards"),
        _i("nominationpools_id"),
        _d("nominationpools_total"),
        _i("nominationpools_member_cnt"),
        _d("nominationpools_commission"),
        _s("nominationpools_rewardpools"),
        _d("member_bonded"),
        _d("member_unbonded"),
        _d("member_share"),
        _s("targets"),  # JSON array of validator ss58
        _s("pv"),  # JSON
    ]
)

# ref: substrate/schema/substrateetl/traces.json:1-140 (storage diffs)
TRACES = T.StructType(
    [
        _s("relay_chain", False),
        _s("para_id", False),
        _s("id", False),
        _s("chain_name"),
        _s("trace_id", False),  # "{bn}-{idx}"
        _s("extrinsic_id"),
        _ts("ts", False),
        _l("block_number", False),
        _s("block_hash", False),
        _s("k", False),
        _s("v"),
        _s("section"),
        _s("storage"),
        _s("pk_extra"),
        _s("pv"),  # JSON, e.g. {"consumers":..,"providers":..}
        _s("symbol"),
        _i("decimals"),
        _s("asset"),
        _s("asset_name"),
        _s("asset_type"),
        _s("xcm_interior_key"),
        _s("address_ss58"),
        _s("address_pubkey"),
        _s("flags"),
        _d("free"),
        _d("reserved"),
        _d("frozen"),
    ]
)

# ref: substrate/schema/polkaholic.sql:4092-4118 (xcmmessages)
XCMMESSAGES = T.StructType(
    [
        _s("msgHash", False),
        _l("blockNumber", False),
        _i("incoming", False),  # 0 = sent at source, 1 = observed at dest
        _i("chainID"),
        _i("chainIDDest"),
        _s("msgType"),
        _s("relayChain"),
        _l("sentAt"),
        _l("blockTS"),
        _l("sourceTS"),
        _l("destTS"),
        _i("matched"),
        _s("msgStr"),  # JSON
        _s("errorDesc"),
        _s("destStatus"),
        _s("executedEventID"),
    ]
)

# ref: substrate/schema/polkaholic.sql:4143 (xcmtransfer, origination side)
XCMTRANSFER = T.StructType(
    [
        _s("extrinsicHash"),
        _s("extrinsicID"),
        _i("transferIndex"),
        _i("xcmIndex"),
        _i("chainID"),
        _i("chainIDDest"),
        _l("blockNumber"),
        _s("fromAddress"),
        _s("destAddress"),
        _s("symbol"),
        _s("relayChain"),
        _dec("amountSent"),
        _d("amountSentUSD"),
        _l("sourceTS"),
        _l("sentAt"),
        _s("msgHash"),
        _i("incomplete"),
        _i("destStatus"),
    ]
)

# ref: substrate/schema/polkaholic.sql:4192 (destination candidates)
XCMTRANSFER_DEST_CANDIDATE = T.StructType(
    [
        _i("chainIDDest"),
        _s("msgHash"),
        _l("sentAt"),
        _l("destTS"),
        _l("blockNumberDest"),
        _dec("amountReceived"),
        _dec("xcmTeleportFees"),
        _s("feeReceivingAddress"),
        _s("feeEventID"),
        _i("reaped"),
        _i("isFeeItem"),
        _s("eventID"),
        _s("extrinsicID"),
        _s("fromAddress"),
    ]
)

# ref: schema/xcmtransfers.json:1-220 — the PUBLISHED wide xcmtransfers
# contract (dump_xcm flatten, substrateetl.js:5068-5165): the per-day
# partitioned origination_*/destination_* denormalization of one matched
# transfer. Column order follows the schema file exactly.
XCMTRANSFERS_WIDE = T.StructType(
    [
        _s("symbol"),
        _s("xcm_interior_key"),
        _l("xcm_interior_keys_unregistered"),
        _d("price_usd"),
        _ts("origination_ts", False),
        _s("origination_chain_name", False),
        _s("origination_id", False),
        _s("origination_extrinsic_hash", False),
        _s("origination_extrinsic_id", False),
        _l("origination_transfer_index", False),
        _l("origination_xcm_index", False),
        _s("origination_transaction_hash"),
        _s("origination_msg_hash"),
        _b("origination_is_msg_sent"),
        _l("origination_block_number", False),
        _l("origination_para_id", False),
        _s("origination_section", False),
        _s("origination_method", False),
        _s("origination_sender_ss58", False),
        _s("origination_sender_pub_key", False),
        _d("origination_amount_sent"),
        _d("origination_amount_sent_usd"),
        _d("origination_tx_fee", False),
        _d("origination_tx_fee_usd", False),
        _s("origination_tx_fee_symbol", False),
        _b("origination_is_fee_item", False),
        _l("origination_sent_at"),
        _s("destination_execution_status", False),
        _s("destination_chain_name"),
        _s("destination_id"),
        _l("destination_para_id"),
        _s("destination_beneficiary_ss58"),
        _s("destination_beneficiary_pub_key"),
        _s("destination_extrinsic_id"),
        _s("destination_event_id"),
        _l("destination_block_number"),
        _ts("destination_ts"),
        _d("destination_amount_received"),
        _d("destination_amount_received_usd"),
        _d("destination_teleport_fee"),
        _d("destination_teleport_fee_usd"),
        _s("destination_teleport_fee_symbol"),
        _s("xcm_info", False),  # BigQuery JSON → JSON string column
        _ts("xcm_info_last_update_time", False),
    ]
)

# ref: schema/xcm.json:1-60 — the PUBLISHED per-day xcm messages table
# (dump_xcm second half, substrateetl.js:5176-5214): one row per message
# with para-id/chain-id decoration and the registry key arrays as JSON.
XCM_WIDE = T.StructType(
    [
        _s("msg_hash", False),
        _ts("origination_ts", False),
        _l("origination_para_id", False),
        _l("destination_para_id", False),
        _s("origination_id"),
        _s("destination_id"),
        _l("relayed_at"),
        _l("included_at"),
        _s("msg"),
        _s("msg_hex"),
        _s("msg_type", False),
        _s("version"),
        _s("xcm_interior_keys"),  # BigQuery JSON → JSON string column
        _s("xcm_interior_keys_unregistered"),
    ]
)

# ref: schema/snapshots.json:1-66 — the generic hourly state-snapshot
# contract (priceManager.js:1013-1032 price feed rows; substrateetl.js:
# 7807-7818 staking era snapshots; loaded :7134 with
# --time_partitioning_field=ts): heterogeneous state rows normalized to
# (section, storage, track, track_val, kv JSON, pv JSON).
SNAPSHOTS = T.StructType(
    [
        _s("relay_chain"),
        _s("para_id"),
        _s("id"),
        _s("chain_name"),
        _ts("ts", False),
        _l("block_number", False),
        _s("block_hash", False),
        _s("address_ss58"),
        _s("address_pubkey"),
        _s("section", False),
        _s("storage", False),
        _s("track"),
        _s("track_val"),
        _s("kv"),  # BigQuery JSON → JSON string column
        _s("pv"),
        _s("source", False),
    ]
)

# ref: substrate/schema/polkaholic.sql:1528-1553 (assetlog OHLCV series)
ASSETLOG = T.StructType(
    [
        _s("asset", False),
        _i("chainID", False),
        _s("source", False),  # enum: coingecko | oracle | onchain
        _l("indexTS", False),
        _d("priceUSD"),
        _d("total_volumes"),
        _d("market_caps"),
        _d("low"),
        _d("high"),
        _d("open"),
        _d("close"),
        _d("lp0"),
        _d("lp1"),
        T.StructField("token0Volume", T.DecimalType(38, 18)),
        T.StructField("token1Volume", T.DecimalType(38, 18)),
        T.StructField("issuance", T.DecimalType(38, 18)),
        _i("liquid"),
    ]
)

# ref: schema/specversions.json:1-33
SPECVERSIONS = T.StructType(
    [
        _i("spec_version", False),
        _l("block_number", False),
        _s("block_hash", False),
        _ts("block_time", False),
        _s("spec"),  # full runtime metadata JSON
    ]
)

# ref: schema/identity.json:1-112 (identityManager.js:60-185 build)
IDENTITY = T.StructType(
    [
        _s("pubkey", False),
        _s("polkadot_ss58", False),
        _s("kusama_ss58", False),
        _s("polkadot_parent"),
        _b("polkadot_is_subidentity"),
        _s("polkadot_fullname"),
        _s("polkadot_name"),
        _s("polkadot_subname"),
        _s("polkadot_info"),  # JSON
        _s("polkadot_judgements"),  # JSON
        _b("polkadot_judgement_verified"),
        _s("kusama_parent"),
        _b("kusama_is_subidentity"),
        _s("kusama_fullname"),
        _s("kusama_name"),
        _s("kusama_subname"),
        _s("kusama_info"),  # JSON
        _s("kusama_judgements"),  # JSON
        _b("kusama_judgement_verified"),
    ]
)

# ref: schema/assets.json:1-48
ASSETS = T.StructType(
    [
        _i("para_id"),
        _s("chain_name"),
        _s("asset"),
        _s("name"),
        _s("currency_id"),
        _s("symbol"),
        _i("decimals"),
        _s("xcm_interior_key"),
        _s("xc_contract_address"),
    ]
)

# ref: schema/xcmassets.json:1-62 (the xcmgar global asset registry rows)
XCMASSETS = T.StructType(
    [
        _s("xcm_interior_key", False),
        _s("xcm_v1_multilocation_byte"),
        _s("xcm_v1_multilocation"),  # JSON
        _s("symbol"),
        _i("decimals"),
        _i("para_id"),
        _s("chain_name"),
        _s("interior_type"),
        _s("source"),
        _s("xc_contract_address"),
        _s("xc_currency_id"),
        _i("confidence"),
    ]
)

# feedreward rows (indexer.js:3962-3999 decorateFeedReward; served by
# query.js:4147 get_account_rewards)
REWARDS = T.StructType(
    [
        _s("event_id", False),
        _s("extrinsic_id"),
        _s("section", False),
        _s("method", False),
        _s("account", False),
        _s("account_pubkey"),
        _l("block_number"),
        _ts("block_time"),
        _i("era"),
        _d("amount"),  # decimalized, sign-flipped for Slashed
        _dec("raw_amount"),
        _d("amount_usd"),
        _d("price_usd"),
    ]
)

# feedcrowdloan rows (chainparser.js:4033-4083 prepareFeedcrowdloan;
# served by query.js:4059 get_account_crowdloans)
CROWDLOANS = T.StructType(
    [
        _s("event_id", False),
        _s("extrinsic_id"),
        _s("section", False),
        _s("method", False),
        _s("account", False),
        _i("para_id"),
        _d("amount"),
        _dec("raw_amount"),
        _s("memo"),
        _l("block_number"),
        _ts("block_time"),
    ]
)

# ref: schema/substrateetl/evmtxs.json:1 (frontier-chain decorated txns,
# fee economics per ethTool.js:819-918 decorateTxn)
EVMTXS = T.StructType(
    [
        _s("hash", False),
        _l("nonce"),
        _i("transaction_index"),
        _s("from_address"),
        _s("to_address"),
        _dec("value"),
        _l("gas"),
        _l("gas_price"),
        _s("input"),
        _l("receipt_cumulative_gas_used"),
        _l("receipt_gas_used"),
        _s("receipt_contract_address"),
        _i("receipt_status"),
        _ts("block_timestamp"),
        _l("block_number"),
        _s("block_hash"),
        _l("max_fee_per_gas"),
        _l("max_priority_fee_per_gas"),
        _i("transaction_type"),
        _l("receipt_effective_gas_price"),
        _d("fee"),
        _d("txn_saving"),
        _d("burned_fee"),
        _s("extrinsic_id"),
        _s("extrinsic_hash"),
        _s("method_id"),
        _s("signature"),
        _s("access_list"),  # JSON
        _s("params"),  # JSON
    ]
)

# ref: schema/substrateetl/evmtransfers.json:1 (token transfers decoded
# from EVM logs; token_ids/token_values carry the 1155 batch arrays)
EVMTRANSFERS = T.StructType(
    [
        _s("token_address"),
        _s("from_address"),
        _s("to_address"),
        _s("value"),  # raw u256 as exact string
        _d("value_usd"),
        _s("operator"),
        _s("token_ids"),  # JSON array
        _s("token_values"),  # JSON array
        _s("transaction_hash"),
        _i("log_index"),
        _ts("block_timestamp"),
        _l("block_number"),
        _s("block_hash"),
        _s("transfer_type"),
    ]
)

# ref: schema/substrateetl/contracts/contracts.json (ink!/WASM contracts
# dim; build substrateetl.js:2544-2566)
CONTRACTS = T.StructType(
    [
        _s("address_pub_key", False),
        _s("deployer_pub_key"),
        _s("storer_pub_key"),
        _s("extrinsic_id"),
        _s("extrinsic_hash"),
        _l("block_number_instantiated"),
        _ts("deployed_ts"),
        _s("code_hash"),
    ]
)

# ref: schema/substrateetl/contracts/contractscode.json (CodeStored rows,
# substrateetl.js:2524-2542)
CONTRACTSCODE = T.StructType(
    [
        _s("code_hash", False),
        _s("extrinsic_id"),
        _s("extrinsic_hash"),
        _s("storer_pub_key"),
        _l("block_number"),
        _ts("code_stored_ts"),
    ]
)

# ref: schema/substrateetl/contracts/contractscall.json (contracts.call
# rows with dechexed limits + ink! decoded_call, substrateetl.js:2569-2640)
CONTRACTSCALL = T.StructType(
    [
        _s("extrinsic_id", False),
        _s("extrinsic_hash"),
        _ts("block_timestamp"),
        _l("block_number"),
        _s("block_hash"),
        _s("address_pub_key"),
        _s("gas_limit"),  # exact u128 strings (dechexToIntStr)
        _s("storage_deposit_limit"),
        _s("value"),
        _s("caller_pub_key"),
        _s("code_hash"),
        _s("decoded_call"),  # JSON
    ]
)

# ref: schema/substrateetl/chains.json (the chain registry dim)
CHAINS = T.StructType(
    [
        _i("para_id"),
        _s("id", False),
        _s("chain_name"),
        _i("ss58_prefix"),
        _s("symbol"),
        _b("is_evm"),
        _b("is_wasm"),
    ]
)

# ref: schema/substrateetl/users.json (ss58↔evm address unification)
USERS = T.StructType(
    [
        _s("id", False),
        _s("ss58_address"),
        _s("evm_address"),
        _s("account_pubkey"),
    ]
)

# ref: schema/substrateetl/exchanges.json (address label dim; joined as a
# broadcast decoration exactly like J12)
EXCHANGES = T.StructType(
    [
        _s("address_pubkey", False),
        _s("address_nickname"),
        _s("address_label"),
    ]
)

# ref: schema/accountsactive.json:1-32 (+ passive/new/reaped variants)
ACCOUNTS = T.StructType(
    [
        _i("para_id"),
        _s("relay_chain"),
        _s("address_ss58"),
        _s("address_pubkey"),
        _s("account_type"),  # active: max over User/System; passive/new/reaped fixed
        _ts("ts"),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "blocks": BLOCKS,
    "blocks_raw": RAW_BLOCKS,
    "extrinsics": EXTRINSICS,
    "events": EVENTS,
    "logs": LOGS,
    "calls": CALLS,
    "transfers": TRANSFERS,
    "balances": BALANCES,
    "stakings": STAKINGS,
    "traces": TRACES,
    "xcmmessages": XCMMESSAGES,
    "xcmtransfer": XCMTRANSFER,
    "xcmtransferdestcandidate": XCMTRANSFER_DEST_CANDIDATE,
    "assetlog": ASSETLOG,
    "specversions": SPECVERSIONS,
    "accounts": ACCOUNTS,
    "identity": IDENTITY,
    "assets": ASSETS,
    "xcmassets": XCMASSETS,
    "rewards": REWARDS,
    "crowdloans": CROWDLOANS,
    "evmtxs": EVMTXS,
    "evmtransfers": EVMTRANSFERS,
    "contracts": CONTRACTS,
    "contractscode": CONTRACTSCODE,
    "contractscall": CONTRACTSCALL,
    "chains": CHAINS,
    "users": USERS,
    "exchanges": EXCHANGES,
}
