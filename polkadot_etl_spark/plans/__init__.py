from polkadot_etl_spark.plans.decode import calls_from_extrinsics, transfers_from_events
from polkadot_etl_spark.plans.dump import (
    blocklog_gold,
    dump_day,
    gap_audit,
    logs_from_blocks,
    published_blocks,
    write_dump,
)
from polkadot_etl_spark.plans.metrics import (
    accounts_active,
    accounts_new_reaped,
    accounts_passive,
    blocklog_daily,
)
from polkadot_etl_spark.plans.feeds import (
    crowdloan_feed,
    identity_table,
    reward_feed,
)
from polkadot_etl_spark.plans.stakings import nominators_per_validator, validators_by_era
from polkadot_etl_spark.plans.xcmgar import build_xcm_asset_registry, propagate_registry
from polkadot_etl_spark.plans.prices import best_by_liquidity, ohlcv_rollup, with_price_usd
from polkadot_etl_spark.plans.pallets import PalletRegistry, map_substrate_type
from polkadot_etl_spark.plans.traces import account_change_events, parse_traces, storage_keys_dim
from polkadot_etl_spark.plans.xcm import (
    match_messages,
    match_transfers,
    teleport_fee_stats,
    xcm_channel_summary,
)

__all__ = [
    "calls_from_extrinsics",
    "transfers_from_events",
    "dump_day",
    "write_dump",
    "logs_from_blocks",
    "published_blocks",
    "blocklog_gold",
    "gap_audit",
    "reward_feed",
    "crowdloan_feed",
    "identity_table",
    "build_xcm_asset_registry",
    "propagate_registry",
    "blocklog_daily",
    "accounts_active",
    "accounts_passive",
    "accounts_new_reaped",
    "ohlcv_rollup",
    "best_by_liquidity",
    "validators_by_era",
    "nominators_per_validator",
    "with_price_usd",
    "account_change_events",
    "parse_traces",
    "storage_keys_dim",
    "PalletRegistry",
    "map_substrate_type",
    "match_messages",
    "match_transfers",
    "teleport_fee_stats",
    "xcm_channel_summary",
]
