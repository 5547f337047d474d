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
# ROUND-9 ROTATION (the r8 verdict's task #5 — grind the r1/r2 staleness
# tail): 81 queries' last driver-green row was r1-r3; this round dedicates
# 35 slots to the OLDEST tail (all 26 r1 entries + 9 of the 24 r2
# entries after eight late-r9 deferrals for the new-query blocks; the 15
# remaining r2 + the 31 r3 entries queue for r10, taking the oldest-green
# tail from 81 to 46 < 50). Every rotated-in entry is
# relational/tpch-family code untouched since its green row and verified
# by the local oracle suite every session. The 45 demotions are ALL
# r8-green (CORRECTNESS_r08.json, 50/50): the llmdata/corpus_ext demotions
# carry per-name redundancy notes in tests/test_registry_order.py's
# _DEMOTED_GREEN; the pipelines demotions are, with green rows:
#   gar_longtail_registry (r6+r8)     — 5-leg gar parser canonicalization,
#     locally oracle-verified; registry dispatch pinned by pytest
#   snapshots_relay_opengov (r6+r8)   — snapshot_rows contract + vote-byte
#     decode stay pytest-pinned; r9 idle re-measure cleared its breach
#   assethub_price_log (r6+r8)        — J10 last-wins MERGE window form;
#     keyed-MERGE semantics re-run in the local oracle suite
#   cluster_trace_reference (r4..r8)  — F4 trace decode + u128 duals,
#     locally oracle-verified every session
#   dump_day_blocklog (r3..r8)        — the integrated day-dump gold;
#     composes call_tree_flatten + decode plans, locally verified
#   evm_tx_jsonld (r6+r8)             — byte-exact JSON-LD export vs the
#     string-assembly oracle, locally verified
#   pallet_typed_views (r4..r8)       — dynamic schema registry + u128
#     raw duals, locally verified
#   wasm_contract_calls (r3..r8)      — ink! SCALE decode; TypeRegistry
#     compound decode pytest-pinned
#   merge_upsert_state (r4..r8)       — keyed MERGE + replay idempotence
#     (X6) hash gate, locally verified (real writes) every session
#   skewed_hotkey_rollup (r4+r8)      — salted-agg combine vs plain
#     GROUP BY oracle, locally verified
#   xcm_trace_spans (r3..r8)          — J1 band join + W2 tie-break,
#     locally verified
#   xcmtransfers_wide (r4..r8)        — 44-column published table (J2
#     fuzzy match), locally verified
#   balances_day_lifecycle (r4+r8)    — NULLIFY rat rule + lifecycle
#     windows, locally verified
_PRIORITY: list[str] = [
    # --- keeps: the flagship + every query whose CODE changed in r9
    # (the staleness rule: nothing ships with code newer than its green
    # row) + the two new r9 queries
    "tpch_q1",
    # bm25: df-cap restructure (r9); hybrid: sketch-leg composition (r9);
    # html_boilerplate: short-doc clamp (r9); funnel: kept as the composed
    # release flagship whose stage plans gate_attribution_audit shares
    "bm25_topk_retrieval",
    "hybrid_rrf_fusion",
    "hybrid_fusion_recall_audit",
    "html_boilerplate_extract",
    "corpus_release_funnel",
    "streaming_corpus_replay",
    # late-r9 additions (new queries MUST be in-window; four r2-tail
    # slots deferred to r10 to make room — see the r2 block below):
    # the SECOND streaming machine driver-gated, RM3 feedback expansion
    # composing the real BM25, the Matryoshka truncation-recall card,
    # and the serving padding-waste card
    "streaming_neardedup_replay",
    "bm25_rm3_expansion",
    "ann_dim_truncation_audit",
    "inference_batch_padding_card",
    # second late-r9 batch (two more r2-tail slots deferred to r10):
    # champion-list index pruning and the shuffle-key skew card
    "bm25_champion_prune",
    "shuffle_skew_audit",
    # third late-r9 addition (one more r2-tail slot deferred): the
    # fourth iterative family — fixed-point top-PC power iteration,
    # plus the card that APPLIES its direction (train -> use)
    "embedding_top_pc_power",
    "embedding_abtt_card",
    # --- the r1 tail (26): last driver-green row is round 1
    "asof_join_last_purchase",
    "channel_daily_summary",
    "collect_sorted_list",
    "customer_lifetime_stats",
    "distinct_pairs",
    "duplicate_detection",
    "fee_distribution_stats",
    "fee_percentiles",
    "first_attribution",
    "moving_avg_7d",
    "rollup_daily_type",
    "semi_join_building",
    "sessionize_events",
    "size_histogram",
    "topn_per_group",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q10_returned_items",
    "tpch_q13_order_count_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_predicates",
    "tpch_q22_global_sales_opportunity",
    "trailing_rollups",
    # --- the r2 tail (9 of 24): last driver-green row is round 2
    # (left for r10: session_window_native, topk_paging,
    # tpch_q4_order_priority, tpch_q5_regional_revenue,
    # tpch_q6_forecast_revenue, unpivot_roundtrip, work_queue_backoff,
    # plus eight deferred late-r9 for the new-query blocks above —
    # like_filter, noise_suppression, validity_filter,
    # pivot_event_counts (P-family filter/pivot shapes whose predicates
    # re-run inside in-window relational plans), per_block_stats (A7 —
    # the agg family keeps 8+ in-window reps), daily_history_series
    # (W4 — window family repped by best_by_rank + moving_avg_7d
    # in-window), monthly_rollup_having (A3 — same agg-family
    # argument) and json_field_access (the get_json_object scalar
    # surface re-runs inside dozens of in-window plans); all stay in
    # the local oracle suite every session)
    "active_accounts_union",
    "anti_join_no_urgent",
    "best_by_rank",
    "block_at_timestamp",
    "daily_order_metrics",
    "gap_detection",
    "intersect_except_users",
    "interval_sampling",
    "left_join_dim_agg",
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
