"""Query registry: every implemented operator from SURVEY §2 is one
QuerySpec — a Spark DataFrame builder plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. The driver's correctness gate and our own
pytest harness both consume this registry, so there is exactly one source
of truth for "what is implemented"."""

from polkadot_etl_spark.queries.registry import QUERIES, QuerySpec, query

# Importing these modules populates QUERIES via the @query decorator.
from polkadot_etl_spark.queries import tpch  # noqa: F401,E402
from polkadot_etl_spark.queries import relational  # noqa: F401,E402
from polkadot_etl_spark.queries import llmdata  # noqa: F401,E402
from polkadot_etl_spark.queries import survey_ext  # noqa: F401,E402
from polkadot_etl_spark.queries import pipelines  # noqa: F401,E402
from polkadot_etl_spark.queries import corpus_ext  # noqa: F401,E402

# The external correctness gate records only the FIRST 50 registry entries
# (registration order).  _PRIORITY pins that window to one green
# representative of every SURVEY §2 family plus ALL LLM-data-pipeline ops;
# everything demoted past slot 50 keeps a prior driver-green row (pinned by
# tests/test_registry_order.py against the committed CORRECTNESS artifacts)
# and stays verified by the local oracle suite every session.
#
# ROUND-13 ROTATION (oldest-first under the <=6-round staleness pin,
# tests/test_registry_order.py::test_registry_freshness_max_staleness):
# in-window this round are (a) the flagship, (b) the six new r13
# queries, (c) the two queries whose CODE changed this round after
# their r12 green rows (the chained-ghost SNM rewrite and the unimax
# zero-token guard), (d) corpus_daily_increment_replay, kept in-window
# deliberately — several _DEMOTED_GREEN notes lean on its composed
# replay skeleton / IVF maintenance re-running in-window every round,
# and (e) the ENTIRE r8 tail (32 entries, the oldest green rows — the
# staleness wall the r12 verdict called out) plus the oldest 8 of the
# r9 tail alphabetically, pulling the next wall forward before the
# ratchet forces it. Every demotion is r12-green (CORRECTNESS_r12.json,
# 50/50 zero err); the five demoted corpus_ext entries gain
# _DEMOTED_GREEN redundancy notes.
_PRIORITY: list[str] = [
    # --- the flagship (driver smoke-checks entry() against it)
    "tpch_q1",
    # --- NEW this round: DoReMi iterative mixture reweighting, the
    # multi-pass SNM union with per-pass attribution, MMC4-style
    # interleaved multimodal document assembly, the Derby-backed
    # end-to-end JDBC round trip (retires the S3 planner-only partial),
    # RHO-loss doc-level data selection, and the dedup-family Venn
    "mixture_doremi_weights",
    "snm_multipass_dedup",
    "mmc4_interleaved_docs",
    "jdbc_derby_roundtrip",
    "rholoss_doc_selection",
    "dedup_family_venn",
    # --- changed-code re-greens (r12-green, code changed this round)
    "sorted_neighborhood_dedup",
    "unimax_mixture_budget",
    # --- composition hub kept in-window (see header note d)
    "corpus_daily_increment_replay",
    # --- the full r8 tail (32): last driver-green row is round 8
    "audio_silence_trim",
    "benchmark_contamination",
    "bigram_perplexity_backoff",
    "bloom_dedup_membership",
    "bpe_fertility_audit",
    "bpe_merge_train_steps",
    "contamination_containment",
    "corpus_shard_shuffle",
    "datacard_source_stats",
    "dedup_incremental_batch",
    "dedup_minhash_banded_r2",
    "domain_pagerank",
    "domain_quota_sample",
    "embedding_int8_quantize",
    "embedding_isotropy_card",
    "gar_longtail_registry",
    "gate_attribution_audit",
    "hard_negative_mining",
    "image_dhash_hamming_lsh",
    "merge_upsert_state",
    "mmr_diversified_topk",
    "pallet_typed_views",
    "paragraph_dedup_rewrite",
    "pq_quantize_embeddings",
    "rag_chunk_documents",
    "skewed_hotkey_rollup",
    "source_overlap_matrix",
    "source_vocab_drift",
    "url_domain_filter",
    "video_keyframe_sample",
    "xcm_trace_spans",
    "xcmtransfers_wide",
    # --- the oldest 8 of the r9 tail (alphabetical) — pulled forward
    # so the r9 wall (47 entries due at r16) starts draining now
    "active_accounts_union",
    "ann_dim_truncation_audit",
    "anti_join_no_urgent",
    "asof_join_last_purchase",
    "best_by_rank",
    "block_at_timestamp",
    "bm25_champion_prune",
    "bm25_rm3_expansion",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:  # fail fast: a typo here silently hides a query from the gate
        raise ValueError(f"_PRIORITY names not in registry: {missing}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "QuerySpec", "query"]
