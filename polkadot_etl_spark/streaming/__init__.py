from polkadot_etl_spark.streaming.pipeline import (
    block_candidates_stream,
    finalized_only,
    fork_resolving_sink,
    gap_audit,
    hourly_block_stats,
    resolve_forks,
)

__all__ = [
    "block_candidates_stream",
    "finalized_only",
    "fork_resolving_sink",
    "gap_audit",
    "hourly_block_stats",
    "resolve_forks",
]
