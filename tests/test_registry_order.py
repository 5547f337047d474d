"""Guards the driver-facing registry window.

The external correctness gate records only the FIRST 50 registry entries
(registration order).  ``queries/__init__._PRIORITY`` pins that window; these
tests make the pinning contract explicit so a refactor can't silently push a
first-class operator (the LLM-data surface in particular) past slot 50.
"""

from polkadot_etl_spark.queries import QUERIES, _PRIORITY


def test_priority_names_all_registered():
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_priority_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_window_starts_with_priority_in_order():
    assert list(QUERIES)[: len(_PRIORITY)] == _PRIORITY


def test_window_fits_driver_sample():
    assert len(_PRIORITY) <= 50, "driver records only the first 50 entries"


# LLM-data ops rotated out of the window in r4 for the six new
# corpus_ext ops. Demotion is legal ONLY with a prior driver-green row;
# these six are green in BOTH CORRECTNESS_r02.json and r03 (and stay in
# the local oracle suite every session).
_DEMOTED_GREEN = {
    "dedup_minhash_signatures",
    "simhash_fingerprints",
    "lang_id_heuristic",
    "text_quality",
    "token_counts",
    "doc_fingerprint",
    "embedding_bucket_stats",  # r2+r3 green; slot went to users_tags_attribution
    "dedup_exact",  # r2+r3 green; slot went to unigram_perplexity
    "ann_cosine_topk",  # r2+r3 green; slot went to split_leakage_audit
    "dedup_ngram_jaccard",  # r2+r3 green; re-runs inside dedup_corpus_survivors
    # mid-r4 demotions for the three new mid-r4 queries (audio codec,
    # audit_row_counts, address_topn_metrics); each demotee's semantics
    # re-run inside an in-window composed query every round
    "dedup_minhash_lsh_pairs",  # r2+r3 green; LSH stage of dedup_corpus_survivors
    "dedup_clusters",  # r3 green; CC stage of dedup_corpus_survivors
    "train_val_split",  # r3 green; split stage of split_leakage_audit
    "gopher_repetition",  # r3 green; slot went to intradoc_dup_ngrams (same family)
    "dedup_embedding_cosine",  # r2+r3 green; slot went to pq_quantize_embeddings
    "ann_lsh_bucketed",  # r3 green; slot went to ann_pq_adc_search (same family)
    "stratified_sample",  # r3 green; slot went to mixture_sample_corpus (same family)
    "passage_dedup_ngrams",  # r3 green; slot went to exact_substring_dup_spans (same family)
    "ivf_centroid_update",  # r3 green; slot went to ccnet_perplexity_buckets (VQ family -> PQ pair)
    "pii_scrub",  # r3 green; slot went to audio_energy_hash_dedup
    "pq_quantize_embeddings",  # r4 green; slot went to assethub_asset_transfers
    # (the PQ encode plan re-runs inside in-window ann_pq_adc_search)
    "bpe_encode_vocab",  # r4 green; slot went to evm_precompile_calls
    # (BPE family keeps bpe_pair_counts in-window)
    "multimodal_audio_features",  # r4+r5 green; slot went to
    # winnowing_fingerprints mid-r6 (the WAV codec path re-runs inside
    # in-window audio_energy_hash_dedup every round)
    "multimodal_image_features",  # r4 green (full hash); slot went to
    # snapshots_assethub_stablecoins — the PNG codec path re-runs inside
    # in-window image_dhash_dedup every round
    "lsh_dropped_buckets",  # r4 green; slot went to
    # token_metadata_maintenance (bucket-cap accounting rides the capped
    # pipeline inside in-window dedup_corpus_survivors)
    "ccnet_perplexity_buckets",  # r4 green; slot went to
    # kmeans_corpus_clusters (its tercile stage composes the in-window
    # unigram_perplexity plan every round)
    "intradoc_dup_ngrams",  # r4 green; slot went to url_domain_filter
    # (within-doc complement of in-window exact_substring_dup_spans)
    # --- mid-r7 demotions (the verdict's re-green rotation): slots went
    # to the two new r7 queries plus six stale entries whose CODE
    # changed after their last driver-green row; every demotee below is
    # r6-green (see CORRECTNESS_r06.json) and most have 2-3 green rows
    "semdedup_prune",  # r4+r5+r6 green; assign_nearest_broadcast shape
    # runs inside the in-window ANN family every round
    "dedup_corpus_survivors",  # r4+r5+r6 green; the full
    # LSH->Jaccard->CC->roster pipeline re-runs inside in-window
    # corpus_release_funnel (stage 4) every round
    "corpus_filter_funnel",  # r4+r5+r6 green; funnel accounting
    # repped by successor corpus_release_funnel
    "url_domain_filter",  # r5+r6 green; _url_staged re-runs inside
    # corpus_release_funnel (stage 1) every round
    "kmeans_corpus_clusters",  # r5+r6 green; kmeans_lloyd convergence
    # re-runs inside ann_recall_audit's composed trained-IVF leg
    "mixture_sample_corpus",  # r5+r6 green; md5-threshold sampling
    # runs inside in-window split_leakage_audit + mixture_weights
    "ann_ivf_trained_search",  # r6 green; the ENTIRE trained search
    # re-runs inside its successor ann_recall_audit every round
    # --- late-r7 demotions for the three new late-r7 queries
    # (cdc_chunk_dedup / dedup_incremental_batch / corpus_shard_shuffle)
    "exact_substring_dup_spans",  # r4+r5+r6 green; slot went to
    # same-family successor cdc_chunk_dedup (cross-doc duplicated-text
    # detection with content-defined boundaries)
    "quality_classifier_logit",  # r4+r5+r6 green; the hashed-unigram
    # md5-bucket feature fold is the same map-side HOF mechanism
    # in-window dsir_importance runs every round
    "benchmark_contamination",  # r4+r5+r6 green; slot went to
    # bloom_dedup_membership — the broadcast-shingle decontamination
    # semi-join re-runs inside in-window corpus_release_funnel every round
    "ann_pq_adc_search",  # r4+r5+r6 green; slot went to same-family
    # successor ann_ivfpq_residual_search (IVFADC) — the ADC scoring and
    # formula codebook re-run inside the residual search every round
    "split_leakage_audit",  # r4+r5+r6 green; slot went to
    # domain_pagerank — both its mechanisms stay in-window (md5-range
    # split via train_val_split; word-5-gram overlap via
    # corpus_release_funnel's shared _word_grams/_split_col stages)
    "mixture_weights",  # r4+r5+r6 green; slot went to
    # ann_ivfpq_recall_audit — the per-source token aggregate re-runs
    # inside in-window datacard_source_stats every round
    "winnowing_fingerprints",  # r6 green; slot went to
    # contamination_containment — offset-robust fingerprint overlap
    # stays in-window via cdc_chunk_dedup + the capped containment join
    "sequence_packing",  # r4+r5+r6 green; slot went to same-family
    # successor rag_chunk_documents (sentence-aligned context-window
    # assembly, the retrieval-side form)
    "dsir_importance",  # r4+r5+r6+r7 green; slot went to
    # hard_negative_mining (r8) — the broadcast-LM-dim + decimal-exact
    # per-doc fold mechanism re-runs inside bigram_perplexity_backoff
    "audio_energy_hash_dedup",  # r4+r5+r6+r7 green; slot went to
    # codec-family successor audio_silence_trim (r8) — the 8-bit WAV
    # encode->RIFF-parse path re-runs inside the trim every round
    "video_scene_cuts",  # r4+r5+r6+r7 green; slot went to same-family
    # successor video_keyframe_sample (r8), which COMPOSES the entire
    # synthesize->sample->pair->diff cut plan every round
    "bpe_pair_counts",  # r4+r5+r6+r7 green; slot went to same-family
    # successor bpe_merge_train_steps (r8) — step 1 of the training loop
    # is exactly the pair count, re-run every round
    "unigram_perplexity",  # r4+r5+r6+r7 green; slot went to same-family
    # successor bigram_perplexity_backoff (r8) — the shared
    # _unigram_lm_dim construction re-runs inside the backoff branch
    "cdc_chunk_dedup",  # r7 green; slot went to same-family successor
    # paragraph_dedup_rewrite (r8) — the shared _cdc_occurrences stage
    # (cuts/spans/chunk hashes) re-runs inside the rewrite every round
    "image_dhash_dedup",  # r5+r6 green; slot went to same-family
    # successor image_dhash_hamming_lsh, which COMPOSES the entire
    # codec->dhash plan and adds the banded Hamming near-dup layer
    "ss58_codec_roundtrip",  # r5+r6+r7 green; demoted late-r8 for the
    # retrieval/accounting block — its literal-VALUES oracle is
    # SF-invariant, so the local suite runs the IDENTICAL comparison
    # every session, and the codec stays pinned by the hypothesis
    # round-trip + Substrate public vectors
    "quality_signal_spearman",  # r7 green; demoted late-r8 for
    # hybrid_rrf_fusion — its four input signals are the same map-side
    # stage in-window datacard_source_stats computes every round; the
    # tie-corrected rank mechanism stays locally oracle-verified
    # (train_val_split + passage_dedup_ngrams rotated back in mid-r7 to
    # re-green on their refactors, DEMOTED AGAIN in r8 now r3+r7 green —
    # the shared _split_col/_word_grams stages run inside in-window
    # corpus_release_funnel every round; their set entries above apply
    # again. url_domain_filter / pq_quantize_embeddings /
    # ann_pq_adc_search / benchmark_contamination / ann_ivf_trained_search
    # rotated back IN for r8 per the staleness rule — their r7
    # shared-helper refactors post-date their green rows — making their
    # entries above vacuous while in-window.)
    # (evm_txn_fees is pipelines-module, outside this llmdata guard; its
    # r3-green demotion for image_dhash_dedup is noted in queries/__init__.py)
    # (evmtxs_daily_gold is pipelines-module, outside this llmdata guard;
    # its r3-green demotion for skewed_hotkey_rollup is noted in
    # queries/__init__.py)
    # --- ROUND-9 ROTATION: 43 slots went to the r1/r2 staleness tail
    # (the r8 verdict's task #5). Every entry below is r8-green
    # (CORRECTNESS_r08.json, 50/50) and most are multi-round green; the
    # r8 batch additionally re-greened at sf0.001/0.01/0.1 + the
    # shuffle=8 probe when they landed. All stay in the local oracle
    # suite every session.
    "ann_sketch_prefilter",  # r8 green; the ENTIRE prefilter + rerank
    # plan (_sketch_prefiltered + _sketch_rerank) composes inside
    # in-window hybrid_rrf_fusion AND hybrid_fusion_recall_audit every
    # round — the strongest demotion form. (r9 ADVICE note: the r9
    # _sketch_rerank edit was signature-only — a new `topk` parameter
    # defaulting to the previous SKETCH_TOPK constant, behavior-identical
    # for this query and ann_recall_audit — and the shared path was
    # re-verified IN-window that round via the hybrid pair, so the
    # staleness rule is satisfied by composition rather than re-green.)
    "ann_recall_audit",  # r7+r8 green; its sketch leg re-runs inside the
    # in-window hybrid pair every round; the IVF/LSH legs and recall
    # accounting stay locally oracle-verified
    "ann_ivfpq_residual_search",  # r7+r8 green; IVFADC family locally
    # oracle-verified; its coarse-cell + ADC mechanisms pinned by
    # tests + the (demoted-green) pq/adc/recall family
    "ann_ivfpq_recall_audit",  # r7+r8 green; same family as above, the
    # pruning-ceiling accounting stays locally oracle-verified
    "gate_attribution_audit",  # r8 green; composes the SAME six shared
    # gate flag plans (_release_stage_parts) that in-window
    # corpus_release_funnel drives every round — only the Venn rollup
    # differs, and it stays locally oracle-verified
    "embedding_int8_quantize",  # r8 green; per-dim absmax calibration
    # card, exact-integer outputs locally oracle-verified every session
    "datacard_source_stats",  # r7+r8 green; its per-source signal
    # aggregates stay locally verified; the BPE token totals re-run
    # inside (demoted-green) bpe_fertility_audit's shared layers
    "dedup_minhash_banded_r2",  # r8 green; the banded-MinHash digest
    # machinery re-runs inside in-window corpus_release_funnel's
    # lsh_near_dedup gate (same _minhash_signatures family) every round
    "rag_chunk_documents",  # r7+r8 green; row-local HOF chunk fold,
    # locally oracle-verified (incl. the empty-doc guard test)
    "hard_negative_mining",  # r8 green; composes _sketch_prefiltered,
    # which re-runs inside the in-window hybrid pair every round
    "bpe_merge_train_steps",  # r8 green; the full training loop re-runs
    # inside (demoted-green) bpe_fertility_audit via shared _bpe_train;
    # both locally oracle-verified every session
    "bpe_fertility_audit",  # r8 green; see above — the shared unrolled
    # oracle layers keep the merge-table hash pinned locally
    "bigram_perplexity_backoff",  # r8 green; stupid-backoff LM scoring
    # in integer micro-nats, locally oracle-verified
    "domain_pagerank",  # r7+r8 green; integer power iteration pinned
    # against the pure-Python model in tests/test_pagerank.py plus the
    # local oracle row; _url_staged re-runs in-window via the funnel
    "bloom_dedup_membership",  # r7+r8 green; the bit-array operator is
    # model-pinned in tests/test_bloom.py (no-false-negative guarantee)
    # plus the local oracle row
    "dedup_incremental_batch",  # r7+r8 green; the digest-ledger dedup
    # rule re-runs inside in-window streaming_corpus_replay (the same
    # first-occurrence-per-digest semantics, state-machine form)
    "paragraph_dedup_rewrite",  # r8 green; shared _cdc_occurrences
    # chunking locally oracle-verified; the rewrite hash gate re-runs
    # in the local suite every session
    "audio_silence_trim",  # r8 green; the real 8-bit WAV round trip,
    # locally oracle-verified (the codec itself is golden-tested)
    "video_keyframe_sample",  # r8 green; composes the entire scene-cut
    # plan, locally oracle-verified every session
    "image_dhash_hamming_lsh",  # r7+r8 green; PNG->dHash->banded-Hamming
    # path locally oracle-verified; the codec wave is golden-tested
    "contamination_containment",  # r7+r8 green; graded containment with
    # cap accounting, locally oracle-verified; the verbatim-overlap
    # decontamination rule re-runs in-window via the funnel every round
    "corpus_shard_shuffle",  # r7+r8 green; md5-shard training-order
    # shuffle with order_sig, locally oracle-verified
    "mmr_diversified_topk",  # r8 green; the WindowGroupLimit candidate
    # pool re-runs inside in-window bm25/hybrid every round; the greedy
    # HOF fold stays locally oracle-verified
    "source_vocab_drift",  # r8 green; exact-ppm TV distance card,
    # locally oracle-verified (checkpoint-shape plan test retained)
    "domain_quota_sample",  # r8 green; composes _url_staged (re-runs
    # in-window via the funnel); quota rule locally oracle-verified
    "source_overlap_matrix",  # r8 green; row-local pair expansion vs
    # the oracle's self-join — both locally verified every session
    "embedding_isotropy_card",  # r8 green; centroid-compactness card,
    # floor-micro integer outputs locally oracle-verified
    "skewed_hotkey_rollup",  # r4+r8 green; salted-agg combine vs plain
    # GROUP BY oracle, locally verified; the salting operator is
    # pytest-pinned in its own right
    # --- ROUND-10 ROTATION: the full r9 corpus_ext window block rotates
    # out so the final 46-query r2/r3 staleness tail fits in one window
    # (the r9 verdict's task #1 — after r10 the tail is ZERO). Every
    # entry below is r9-green (CORRECTNESS_r09.json, 50/50, zero err)
    # and stays in the local oracle suite every session.
    "bm25_topk_retrieval",  # r8+r9 green (r9 re-green after the df-cap
    # restructure); the shared _bm25_parts stages re-run inside the
    # local suite and the BM25 family's plan tests pin the cap
    "hybrid_rrf_fusion",  # r8+r9 green (r9 re-green after the
    # sketch-leg composition); both legs' mechanisms stay locally
    # oracle-verified and plan-pinned
    "hybrid_fusion_recall_audit",  # r9 green; prices the hybrid pair's
    # sketch-vs-brute trade, locally oracle-verified
    "html_boilerplate_extract",  # r7+r8+r9 green (r9 re-green after the
    # short-doc clamp); jusText-lite gates locally oracle-verified
    "corpus_release_funnel",  # r5..r9 green; the six-gate integration
    # whose stage plans the (equally demoted-green) gate_attribution
    # audit shares; locally oracle-verified every session
    "streaming_corpus_replay",  # r9 green; the ingest state machine's
    # equivalence contract stays pinned in tests/test_streaming_corpus
    # AND the new in-window streaming_dump_replay composes the same
    # FileStreamSource + foreachBatch replay harness every round
    "streaming_neardedup_replay",  # r9 green; roster state machine
    # pinned in tests/test_streaming_neardedup + the local oracle row
    "bm25_rm3_expansion",  # r9 green; composes the demoted-green BM25
    # parts twice, locally oracle-verified
    "ann_dim_truncation_audit",  # r9 green; Matryoshka recall card,
    # locally oracle-verified
    "inference_batch_padding_card",  # r9 green; serving padding-waste
    # card, locally oracle-verified
    "bm25_champion_prune",  # r9 green; champion-list pruning with
    # measured overlap ppm, locally oracle-verified
    "shuffle_skew_audit",  # r9 green; the salting-decision card,
    # locally oracle-verified
    "embedding_top_pc_power",  # r9 green; the power-iteration loop is
    # COMPOSED by embedding_abtt_isotropy_delta (r11+r12 green, demoted
    # r13) via _pc_power_direction and stays numpy-model-pinned in
    # pytest + locally oracle-verified every session
    "embedding_abtt_card",  # r9 green; its projection mechanism re-runs
    # inside embedding_abtt_isotropy_delta (r11+r12 green, demoted r13 —
    # same direction, same 128-bit-lane share math), locally
    # oracle-verified every session
    # --- ROUND-12 ROTATION demotions (every entry r11-green,
    # CORRECTNESS_r11.json 50/50 zero err; slots went to the r7 tail +
    # the codegen-compaction changed set + the oldest r8 slice)
    "streaming_corpus_replay",  # r9+r11 green; the FileStreamSource +
    # foreachBatch replay skeleton (streaming/replay.py) re-runs inside
    # in-window corpus_daily_increment_replay every round, and the
    # ingest state machine stays pinned in tests/test_streaming_corpus
    "streaming_neardedup_replay",  # r9+r11 green; same shared replay
    # skeleton, roster state machine pinned in
    # tests/test_streaming_neardedup + the local oracle row
    "ann_ivf_incremental_maintenance",  # r11 green; its EXACT machinery
    # (_ivf_maint_corpus/_ivf_train_canon/_ivf_ledger) re-runs inside
    # in-window corpus_daily_increment_replay every round — the
    # strongest demotion form (the composed successor carries the
    # shared helpers under its own hash)
    "cms_heavy_hitters",  # r11 green; the md5-nibble distributed-ledger
    # discipline is bloom_dedup_membership's (in-window r12) — the CMS
    # one-sided-error contract stays locally oracle-verified every
    # session
    "corpus_filter_funnel",  # r4..r6+r11 green; funnel accounting
    # repped by corpus_release_funnel (demoted-green, whose stage plans
    # re-run in the local suite); re-listed for the r12 rotation
    "dedup_corpus_survivors",  # r4..r6+r11 green; the LSH->Jaccard->CC
    # roster pipeline re-runs inside corpus_release_funnel's stage 4
    # every session (entry above applies again post-r11-window)
    "kmeans_corpus_clusters",  # r5+r6+r11 green; kmeans_lloyd re-runs
    # inside corpus_daily_increment_replay's quantizer training
    # (in-window) every round
    "mixture_sample_corpus",  # r5+r6+r11 green; md5-threshold sampling
    # re-runs inside in-window train_val_split + split family
    "mixture_weights",  # r4..r6+r11 green; slot went to same-family
    # successor unimax_mixture_budget (the OTHER published mixing rule,
    # sharing the per-source token aggregate)
    "quality_classifier_logit",  # r4..r6+r11 green; the logit
    # mechanism (z10 HOF fold) re-runs VERBATIM inside in-window
    # filter_threshold_sweep every round — the strongest demotion form
    "semdedup_prune",  # r4..r6+r11 green; assign_nearest re-runs
    # inside the in-window ANN family every round
    "sequence_packing",  # r4..r6+r11 green; successor
    # rag_chunk_documents demoted-green; token cumsum window locally
    # oracle-verified
    "split_leakage_audit",  # r4..r6+r11 green; split + word-gram
    # mechanisms in-window via train_val_split + passage_dedup_ngrams
    "winnowing_fingerprints",  # r6+r11 green; offset-robust fingerprint
    # overlap stays in-window via cdc_chunk_dedup
    "exact_substring_dup_spans",  # r4..r6+r11 green; within/cross-doc
    # gram machinery in-window via passage_dedup_ngrams +
    # intradoc complement (locally verified)
    "image_dhash_dedup",  # r5+r6+r11 green; successor
    # image_dhash_hamming_lsh (demoted-green) composes the entire
    # codec->dhash plan; locally oracle-verified
    "bpe_encode_vocab",  # r4+r11 green; BPE family keeps
    # bpe_pair_counts' successors demoted-green; locally verified
    "ccnet_perplexity_buckets",  # r4+r11 green; composes in-window
    # unigram_perplexity's LM dim every round
    "intradoc_dup_ngrams",  # r4+r11 green; within-doc complement of
    # in-window passage_dedup_ngrams
    "lsh_dropped_buckets",  # r4+r11 green; bucket-cap accounting rides
    # the capped pipeline inside corpus_release_funnel (demoted-green)
    "multimodal_image_features",  # r4+r11 green; PNG codec path re-runs
    # inside image_dhash_hamming_lsh's wave (demoted-green), golden-
    # tested in tests/test_multimodal
    "audio_energy_hash_dedup",  # r4..r7+r11 green; 8-bit WAV round trip
    # re-runs inside audio_silence_trim (in-window r12)
    # --- ROUND-13 ROTATION demotions (every entry r12-green,
    # CORRECTNESS_r12.json 50/50 zero err; slots went to the four new
    # r13 queries + the full r8 tail + the oldest r9 slice)
    "prefix_cache_buckets",  # r12 green; the digest-keyed groupBy is
    # dedup_exact's discipline (demoted-green family), locally
    # oracle-verified + plan-pinned every session
    "filter_threshold_sweep",  # r12 green; its z10 HOF fold is shared
    # VERBATIM with quality_classifier_logit and re-runs inside the new
    # in-window mixture_doremi_weights' loss stage family; locally
    # oracle-verified + monotonicity-pinned every session
    "heaps_vocab_growth",  # r12 green; one word->min(doc_id) ledger,
    # locally oracle-verified + telescoping-pinned every session
    "pack_bins_ffd",  # r12 green; sharded FFD fold, locally
    # oracle-verified + exactly-2-Exchange plan-pinned every session
    "embedding_abtt_isotropy_delta",  # r11+r12 green; composes
    # _pc_power_direction (numpy-model-pinned in pytest) and the
    # isotropy card math; locally oracle-verified every session
}


def test_window_contains_all_llmdata_ops():
    # Every @query defined in queries/llmdata.py + corpus_ext.py must sit
    # inside the 50-slot window — the LLM-data-pipeline surface is graded
    # first-class — unless it already has a driver-green row (see
    # _DEMOTED_GREEN above).
    from polkadot_etl_spark.queries import corpus_ext, llmdata  # noqa: F401

    llm_names = {
        n
        for n, s in QUERIES.items()
        if s.build.__module__.rpartition(".")[2] in ("llmdata", "corpus_ext")
    }
    window = set(list(QUERIES)[:50])
    assert llm_names, "llmdata registered no queries?"
    outside = sorted(llm_names - window - _DEMOTED_GREEN)
    assert not outside, f"llmdata ops outside the driver window: {outside}"


def test_registry_freshness_max_staleness():
    """The freshness program's ratchet (r10 verdict task #6): no
    registry entry may sit more than 6 rounds past its latest
    driver-green row. With R = the newest committed CORRECTNESS round,
    the upcoming round is R+1, so every entry OUTSIDE the current
    window (in-window entries re-green at R+1 by construction) must
    have a green row >= R-5. This forces the oldest-first rotation to
    actually happen each round instead of silently lapsing — at the
    start of a round this test FAILS until the rotation is written,
    which is the point."""
    import json
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    newest = 0
    for rec in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", rec.stem).group(1))
        newest = max(newest, rnd)
        for name, row in json.loads(rec.read_text()).items():
            if row.get("hash_match") or (
                row.get("err") == "no_oracle" and row.get("spark_rows", 0) >= 0
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    window = set(list(QUERIES)[:50])
    floor = newest + 1 - 6
    stale = sorted(
        n
        for n in QUERIES
        if n not in window and latest.get(n, 0) < floor
    )
    assert not stale, (
        f"entries staler than 6 rounds (latest green < r{floor}) and not "
        f"in the rotation window: {stale}"
    )


def test_demoted_ops_have_recorded_green_rows():
    """A demotion without a prior driver-green row would hide an operator
    from the gate forever — pin the precondition against the committed
    CORRECTNESS artifacts themselves."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    green: set[str] = set()
    for rec in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(rec.read_text()).items():
            if row.get("hash_match") or (
                row.get("err") == "no_oracle" and row.get("spark_rows", 0) >= 0
            ):
                green.add(name)
    missing = sorted(_DEMOTED_GREEN - green)
    assert not missing, f"demoted without a driver-green row: {missing}"
