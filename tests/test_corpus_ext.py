"""Semantic invariants for the second-tier corpus ops — properties the
row-hash oracle gate can't express (cross-row consistency, conservation
laws, independent recomputation in plain Python)."""

from __future__ import annotations

import numpy as np
import pytest

from polkadot_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_sequence_packing_conserves_tokens_and_is_contiguous(spark):
    """Within each shard: offsets are exactly the running token sum (no
    gaps, no overlaps), chunk spans are consistent, and the total token
    count is conserved."""
    pdf = (
        QUERIES["sequence_packing"]
        .build(spark, SF_DIR)
        .toPandas()
        .sort_values(["source", "doc_id"])
    )
    C = 256
    for _, grp in pdf.groupby("source"):
        expected_start = 0
        for row in grp.itertuples():
            assert row.start_offset == expected_start
            expected_start += row.n_tokens
            end = row.start_offset + row.n_tokens - 1
            assert row.chunk_first == row.start_offset // C
            assert row.chunk_last == end // C
            assert row.n_chunks == row.chunk_last - row.chunk_first + 1 >= 1
    assert pdf.n_tokens.sum() > 0


def test_corpus_survivors_keep_exactly_min_per_cluster(spark):
    """Every cluster keeps exactly one doc — its min id — and the roster
    covers the whole corpus exactly once."""
    pdf = QUERIES["dedup_corpus_survivors"].build(spark, SF_DIR).toPandas()
    assert pdf.doc_id.is_unique
    for cid, grp in pdf.groupby("cluster_id"):
        kept = grp[grp.is_kept]
        assert len(kept) == 1, f"cluster {cid} kept {len(kept)}"
        assert kept.doc_id.iloc[0] == grp.doc_id.min() == cid
        assert (grp.cluster_size == len(grp)).all()


def test_semdedup_drop_rule(spark):
    """A vector is dropped iff some LOWER-id vector in the same cell has
    rounded cosine >= the threshold — recomputed independently in numpy
    from the raw embeddings + the query's own cell assignment."""
    from polkadot_etl_spark.sources.tables import load_table

    pdf = QUERIES["semdedup_prune"].build(spark, SF_DIR).toPandas()
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    by_cell: dict[int, list[int]] = {}
    for r in pdf.itertuples():
        by_cell.setdefault(r.cid, []).append(r.vec_id)
    expect_dropped = set()
    for members in by_cell.values():
        members.sort()
        for i, b in enumerate(members):
            for a in members[:i]:
                va, vb = emb[a], emb[b]
                cos = float(va @ vb) / np.sqrt(float(va @ va) * float(vb @ vb))
                if round(cos, 6) >= 0.3:
                    expect_dropped.add(b)
                    break
    got_dropped = set(pdf[pdf.is_dropped].vec_id)
    assert got_dropped == expect_dropped
    # cells of size 1 can never drop
    singles = {m[0] for m in by_cell.values() if len(m) == 1}
    assert not (singles & got_dropped)


def test_dsir_importance_is_finite_and_word_counted(spark):
    """Importance weights are finite, word counts match an independent
    recount, and docs sharing the exact same text get the same weight."""
    import re

    from polkadot_etl_spark.sources.tables import load_table

    pdf = QUERIES["dsir_importance"].build(spark, SF_DIR).toPandas()
    assert np.isfinite(pdf.importance).all()
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    for r in pdf.sample(n=min(25, len(pdf)), random_state=7).itertuples():
        assert r.n_words == len(re.findall(r"[a-z]+", texts[r.doc_id].lower()))
    by_text: dict[str, set[float]] = {}
    for r in pdf.itertuples():
        by_text.setdefault(texts[r.doc_id], set()).add(r.importance)
    for t, vals in by_text.items():
        assert len(vals) == 1, f"same text, different importance: {vals}"


def test_filter_funnel_is_a_cascade(spark):
    """Stage arithmetic: n_in(1) = corpus size, n_in(i+1) = n_kept(i),
    kept <= in everywhere, and dropped = in - kept."""
    from polkadot_etl_spark.sources.tables import load_table

    pdf = (
        QUERIES["corpus_filter_funnel"].build(spark, SF_DIR).toPandas().sort_values("stage")
    )
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert list(pdf.stage) == [1, 2, 3, 4, 5]
    assert pdf.n_in.iloc[0] == n_docs
    for i in range(len(pdf) - 1):
        assert pdf.n_in.iloc[i + 1] == pdf.n_kept.iloc[i]
    assert (pdf.n_kept <= pdf.n_in).all()
    assert (pdf.n_dropped == pdf.n_in - pdf.n_kept).all()
    assert pdf.n_kept.iloc[-1] > 0, "funnel filtered out the whole corpus"


def test_bpe_top_pair_matches_python_recount(spark):
    """The #1 merge candidate equals a from-scratch Python recount over
    the same corpus."""
    import re
    from collections import Counter

    from polkadot_etl_spark.sources.tables import load_table

    pdf = QUERIES["bpe_pair_counts"].build(spark, SF_DIR).toPandas()
    counts: Counter[str] = Counter()
    for r in load_table(spark, SF_DIR, "documents").collect():
        for w in re.findall(r"[a-z]+", r["text"].lower()):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    top_pair, top_n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    head = pdf[pdf.rn == 1].iloc[0]
    assert (head["pair"], head["n_occurrences"]) == (top_pair, top_n)
    assert list(pdf.rn) == list(range(1, len(pdf) + 1))


def test_users_tags_scam_senders_attribute_as_other(spark):
    """Senders whose label row is Scam-typed (or absent) must attribute
    as 'other' — the label never leaks through the pre-join filter."""
    pdf = QUERIES["users_tags_attribution"].build(spark, SF_DIR).toPandas()
    for r in pdf.itertuples():
        # _pk zero-pads the DECIMAL key string (digits are valid hex, but
        # the content is base-10)
        suppkey = int(r.first_transfer_sender_pub_key[2:], 10)
        if suppkey % 4 == 1 or suppkey % 9 == 0:  # unlabeled or Scams
            assert r.first_transfer == "other", r
        else:
            assert r.first_transfer == f"EX{suppkey % 12}", r
        assert r.transfer_cnt > 0 and "_" not in r.user_pubkey


def test_perplexity_tracks_word_rarity(spark):
    """Independent recomputation: per-doc cross-entropy from a Python
    corpus count must match the query to 1e-5, and OOV rate must be the
    fraction of words outside the top-200 vocabulary."""
    import math
    import re
    from collections import Counter

    from polkadot_etl_spark.sources.tables import load_table

    pdf = QUERIES["unigram_perplexity"].build(spark, SF_DIR).toPandas()
    docs = {
        r["doc_id"]: re.findall(r"[a-z]+", r["text"].lower())
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    counts = Counter(w for ws in docs.values() for w in ws)
    tot = sum(counts.values())
    vocab = {
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    }
    for r in pdf.sample(n=min(30, len(pdf)), random_state=3).itertuples():
        ws = docs[r.doc_id]
        if not ws:
            assert r.cross_entropy == 0 and r.oov_rate == 0
            continue
        h = -sum(round(math.log(counts[w] / tot), 6) for w in ws) / len(ws)
        assert abs(r.cross_entropy - h) < 1e-5, r.doc_id
        oov = sum(1 for w in ws if w not in vocab) / len(ws)
        assert abs(r.oov_rate - oov) < 1e-5, r.doc_id


def test_split_leakage_bounds_and_coverage(spark):
    """Both held-out splits report, rates are in [0, 1], and n_leaked
    can never exceed n_grams."""
    pdf = QUERIES["split_leakage_audit"].build(spark, SF_DIR).toPandas()
    assert set(pdf.split) == {"val", "test"}
    assert (pdf.n_leaked <= pdf.n_grams).all()
    assert ((pdf.leak_rate >= 0) & (pdf.leak_rate <= 1)).all()
    assert (pdf.n_grams > 0).all()


def test_mixture_weights_normalize_and_smooth(spark):
    """Weights and raw shares each sum to ~1; temperature smoothing must
    COMPRESS the mixture (max weight <= max raw share, min weight >= min
    raw share) while preserving the source ordering; epochs are the
    budget identity."""
    pdf = QUERIES["mixture_weights"].build(spark, SF_DIR).toPandas()
    assert abs(pdf.weight.sum() - 1) < 1e-4
    assert abs(pdf.raw_share.sum() - 1) < 1e-4
    assert pdf.weight.max() <= pdf.raw_share.max() + 1e-9
    assert pdf.weight.min() >= pdf.raw_share.min() - 1e-9
    by_tokens = pdf.sort_values(["n_tokens", "source"])
    assert list(by_tokens.weight) == sorted(by_tokens.weight)
    for r in pdf.itertuples():
        # epochs derives from the UNROUNDED weight; compare relatively
        expected = r.weight * 1_000_000_000 / r.n_tokens
        assert abs(r.epochs - expected) / expected < 1e-4


def test_non_utc_driver_session_still_matches_oracle(spark, oracle):
    """The external driver builds its own SparkSession with whatever
    timezone the host has; load_table force-resets the session tz to UTC
    so date/epoch math keeps matching the oracle. Pin that guard by
    running date-sensitive queries under a Los Angeles session."""
    from tests.conftest import compare_frames

    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        for name in ("daily_order_metrics", "ohlcv_hourly"):
            spec = QUERIES[name]
            spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
            spdf = spec.build(spark, SF_DIR).toPandas()
            compare_frames(spdf, oracle.execute(spec.oracle).df(), f"{name}@LA")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------------------
# kmeans operator: two assignment forms, empty-cluster policy
# ---------------------------------------------------------------------------


def _toy_vectors(spark, n=40, dim=4):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").cast("int").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.col("id") % 5).cast("double") * 10.0 + i.cast("double") * 0.01,
        ).alias("embedding"),
    )


def test_kmeans_broadcast_form_plans_at_k1024(spark):
    """The r5 verdict's one scale-killer: the literal-inline assignment
    is a k x dim SQL expression and cannot plan at IVF-coarse k. The
    broadcast-centroid form must build and PLAN at k=1024, dim=64 with
    O(1) expression size — the plan is a BroadcastNestedLoopJoin, never
    a CartesianProduct, and planning completes in seconds."""
    import time

    from polkadot_etl_spark.operators.kmeans import K_LITERAL_MAX, assign_nearest

    k, dim = 1024, 64
    assert k > K_LITERAL_MAX
    centroids = [[float((j * 31 + i) % 17) for i in range(dim)] for j in range(k)]
    df = _toy_vectors(spark, n=8, dim=dim)
    t0 = time.monotonic()
    assigned = assign_nearest(df, centroids, "embedding", "vec_id")
    plan = assigned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    elapsed = time.monotonic() - t0
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert elapsed < 60, f"planning at k={k} took {elapsed:.1f}s - expression blowup"


def test_kmeans_assignment_forms_agree(spark):
    """Literal-inline and broadcast-join assignment are the same
    operator: identical (vec_id, cid) output including the lowest-cid
    tie-break, only the physical plan differs."""
    from polkadot_etl_spark.operators.kmeans import (
        assign_nearest_broadcast,
        assign_nearest_literal,
    )

    df = _toy_vectors(spark, n=40, dim=4)
    # 7 centroids: the 5 generating points plus one duplicate (tie ->
    # lowest cid) and one far outlier (never wins).
    cents = [[c * 10.0 + i * 0.01 for i in range(4)] for c in range(5)]
    cents.append(list(cents[2]))  # exact duplicate of cid 2 -> cid 2 wins ties
    cents.append([1e6] * 4)
    lit = {
        r.vec_id: r.cid
        for r in assign_nearest_literal(df, cents, "embedding").collect()
    }
    bc = {
        r.vec_id: r.cid
        for r in assign_nearest_broadcast(df, cents, "embedding", "vec_id").collect()
    }
    assert lit == bc
    assert set(lit.values()) == {0, 1, 2, 3, 4}
    assert all(lit[v] == v % 5 for v in lit)


def test_kmeans_empty_cluster_carries_previous_centroid(spark):
    """A cluster that loses all members keeps its previous centroid
    (carry-forward policy) instead of resetting to the origin: seeds 0
    and 1 are identical, so cid 1 is empty from round 1 (ties break to
    cid 0) and must stay at the seed vector, not [0, 0]."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.operators.kmeans import kmeans_lloyd

    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [5.0, 5.0]), (3, [5.2, 5.0])]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    # One round: every point ties-or-prefers cid 0, cluster 1 is empty.
    _, centroids1, _ = kmeans_lloyd(
        df, vec_col="embedding", id_col="vec_id", k=2, max_iter=1, tol=0.0
    )
    assert centroids1[1] == [1.0, 1.0], "empty cluster must carry forward, not zero"
    assert centroids1[0] == [pytest.approx(3.05), pytest.approx(3.0)]
    # Run to convergence: the carried-forward centroid RE-ACQUIRES the
    # near points (exactly what an origin-reset could not guarantee) and
    # the loop lands on the natural 2-clustering.
    assigned, centroids, n_iter = kmeans_lloyd(
        df, vec_col="embedding", id_col="vec_id", k=2, max_iter=10, tol=0.0
    )
    got = {r.vec_id: r.cid for r in assigned.collect()}
    assert got == {0: 1, 1: 1, 2: 0, 3: 0}
    assert centroids[1] == [1.0, 1.0]
    assert centroids[0] == [pytest.approx(5.1), pytest.approx(5.0)]
    assert n_iter <= 10


def test_kmeans_parallel_init_deterministic_and_spread(spark):
    """k-means|| init: (a) identical output at 1 and 13 partitions (the
    md5-threshold draw is partitioning-independent, unlike rand()); (b)
    on well-separated clusters it seeds EVERY cluster, which the naive
    lowest-id init provably does not; (c) composed with kmeans_lloyd it
    converges to the true centroids."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.operators.kmeans import (
        kmeans_lloyd,
        kmeans_parallel_init,
    )

    # 5 clusters spiked +1000 on dimension (vec_id % 5): ids 0..4 are one
    # per cluster BUT ids sort 0,1,2,... so naive lowest-id-k seeds for
    # k=5 happen to hit each cluster; use a skewed id layout instead —
    # first 40 ids all in cluster 0, the rest spread.
    n, dim = 200, 4
    base = spark.range(n).select(
        F.col("id").cast("long").alias("vec_id"),
        F.when(F.col("id") < 40, F.lit(0))
        .otherwise((F.col("id") % 5).cast("int"))
        .alias("c"),
    )
    vecs = base.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(i == F.col("c"), F.lit(1000.0)).otherwise(F.lit(0.0))
            + (F.col("vec_id") % 7).cast("double") * 0.001,
        ).alias("embedding"),
    ).select("vec_id", "embedding")

    seeds1 = kmeans_parallel_init(vecs.repartition(1), k=5, rounds=3)
    seeds13 = kmeans_parallel_init(vecs.repartition(13), k=5, rounds=3)
    assert seeds1 == seeds13, "init must be partitioning-invariant"

    def cluster_of(vec):
        return max(range(4), key=lambda i: vec[i]) if max(vec) > 500 else None

    seeded_clusters = {cluster_of(s) for s in seeds1}
    assert len(seeded_clusters) >= 4, f"seeds missed clusters: {seeded_clusters}"

    assigned, centroids, n_iter = kmeans_lloyd(
        vecs, k=5, max_iter=10, tol=0.0, init=seeds1
    )
    # every true cluster ends owned by exactly one centroid
    got = (
        assigned.select("cid", (F.col("vec_id") % 5).alias("true_c"))
        .where(F.col("vec_id") >= 40)
        .distinct()
        .groupBy("true_c")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in got)
    assert n_iter <= 10


def test_weighted_recluster_ignores_stray_outliers():
    """The adversarial candidate distribution from the r6 review: a
    pool holding 5 dense cluster centers (heavy d²-mass) plus 3
    moderately-far stray candidates (weight 1 each). An UNWEIGHTED
    farthest-first traversal provably spends seeds on the strays
    (stray min-d² 3.25e6 > inter-cluster 2e6); the paper's weighted
    reclustering must cover every dense cluster instead."""
    from polkadot_etl_spark.operators.kmeans import _weighted_recluster

    dim = 5
    clusters = []
    for c in range(5):
        v = [0.0] * dim
        v[c] = 1000.0
        clusters.append(v)
    strays = []
    for s in range(3):
        v = [0.0] * dim
        v[s] = -1500.0
        strays.append(v)
    cands = clusters + strays
    weights = [40.0] * 5 + [1.0] * 3

    # the unweighted failure mode really exists on this pool: strays are
    # farther from every cluster (3.25e6) than clusters are from each
    # other (2e6), so spread-only selection grabs all three first
    assert min(
        sum((a - b) ** 2 for a, b in zip(strays[0], c)) for c in clusters
    ) > max(
        sum((a - b) ** 2 for a, b in zip(clusters[0], c)) for c in clusters[1:]
    )

    seeds = _weighted_recluster(cands, weights, k=5)
    covered = {max(range(dim), key=lambda i: s[i]) for s in seeds}
    assert covered == {0, 1, 2, 3, 4}, f"seeds missed dense clusters: {seeds}"
    for s in seeds:
        assert max(s) > 500.0, f"a seed landed on a stray: {s}"


def test_kmeans_parallel_init_weighted_prune_ignores_strays(spark):
    """End-to-end k-means|| with stray outliers in the DATA: 5 dense
    clusters (40 points each, +1000 spike on their dim) plus 3 stray
    points at -1500 on distinct dims. The strays enter the candidate
    pool (their d² is the largest in the corpus, so the proportional
    draw picks them with probability ~1) but carry weight 1; the
    weighted prune must still seed every dense cluster."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.operators.kmeans import kmeans_parallel_init

    dim = 5
    base = spark.range(203).select(
        F.col("id").cast("long").alias("vec_id"),
        F.when(F.col("id") < 200, (F.col("id") % 5).cast("int"))
        .otherwise((F.col("id") - 200).cast("int"))
        .alias("c"),
        (F.col("id") >= 200).alias("stray"),
    )
    vecs = base.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(
                i == F.col("c"),
                F.when(F.col("stray"), F.lit(-1500.0)).otherwise(F.lit(1000.0)),
            ).otherwise(F.lit(0.0))
            + (F.col("vec_id") % 7).cast("double") * 0.001,
        ).alias("embedding"),
    )
    seeds = kmeans_parallel_init(vecs, k=5, rounds=3)
    covered = {max(range(dim), key=lambda i: s[i]) for s in seeds}
    assert covered == {0, 1, 2, 3, 4}, f"seeds missed dense clusters: {seeds}"
    for s in seeds:
        assert max(s) > 500.0, f"a seed landed on a stray: {s}"


def test_winnowing_guarantee_and_rightmost_tiebreak(spark):
    """The winnowing guarantee (Schleimer et al. 2003): two documents
    sharing a word run of length >= k + w - 1 MUST share at least one
    fingerprint; and the selection is the RIGHTMOST minimal hash of
    each window (pinned by comparing against an independent Python
    winnower over the same md5 gram hashes)."""
    import hashlib

    from polkadot_etl_spark.queries import QUERIES
    from polkadot_etl_spark.queries.corpus_ext import (
        WINNOW_CAP,
        WINNOW_K,
        WINNOW_MIN_SHARED,
        WINNOW_W,
    )
    from polkadot_etl_spark.sources.tables import load_table
    import re as _re

    pdf = QUERIES["winnowing_fingerprints"].build(spark, SF_DIR).toPandas()
    pairs = {
        (int(r.doc_a), int(r.doc_b)): int(r.n)
        for r in pdf[pdf.kind == "pair"].itertuples()
    }

    def winnow(text):
        ws = _re.findall(r"[a-z]+", text.lower())
        grams = [
            " ".join(ws[i : i + WINNOW_K])
            for i in range(len(ws) - WINNOW_K + 1)
        ]
        hs = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
        if not hs:
            return set()
        sel = set()
        n = len(hs)
        starts = range(max(1, n - WINNOW_W + 1))
        for s in starts:
            win = hs[s : s + WINNOW_W]
            m = min(win)
            # rightmost occurrence of the minimum
            j = max(i for i, h in enumerate(win) if h == m)
            sel.add((s + j, m))
        return sel

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    fps = {d: winnow(t) for d, t in docs.items()}
    # per-doc counts match the independent winnower exactly
    got_counts = {
        int(r.doc_a): int(r.n) for r in pdf[pdf.kind == "doc"].itertuples()
    }
    expect_counts = {d: len(s) for d, s in fps.items() if s}
    assert got_counts == expect_counts
    # pair rows match an independent recomputation (bucket cap +
    # min-shared floor applied the same way)
    from collections import defaultdict

    by_hash = defaultdict(set)
    for d, sel in fps.items():
        for _, h in sel:
            by_hash[h].add(d)
    shared = defaultdict(int)
    for h, ds in by_hash.items():
        if len(ds) <= WINNOW_CAP:
            ds = sorted(ds)
            for i, a in enumerate(ds):
                for b in ds[i + 1 :]:
                    shared[(a, b)] += 1
    expect_pairs = {k: v for k, v in shared.items() if v >= WINNOW_MIN_SHARED}
    assert pairs == expect_pairs
    n_dropped = sum(1 for ds in by_hash.values() if len(ds) > WINNOW_CAP)
    assert int(pdf[pdf.kind == "dropped_bucket"].n.iloc[0]) == n_dropped
    # guarantee: any two docs sharing a (k+w-1)-word run share a hash
    run_len = WINNOW_K + WINNOW_W - 1
    doc_ids = sorted(docs)
    runs = {}
    for d in doc_ids:
        ws = _re.findall(r"[a-z]+", docs[d].lower())
        for i in range(len(ws) - run_len + 1):
            runs.setdefault(" ".join(ws[i : i + run_len]), set()).add(d)
    shared_hashes = lambda a, b: {h for _, h in fps[a]} & {h for _, h in fps[b]}  # noqa: E731
    checked = 0
    for run, ds in runs.items():
        if len(ds) > 1:
            ds = sorted(ds)
            for x in ds[1:]:
                assert shared_hashes(ds[0], x), (run, ds[0], x)
                checked += 1
        if checked > 50:
            break
    assert checked > 0, "fixture produced no shared runs to check"


def test_rag_chunk_documents_survives_empty_docs(spark, tmp_path):
    """The greedy chunk fold must short-circuit on an empty sentence
    array: Spark's sequence(1, 0) counts DOWN ([1, 0]), so without the
    size guard element_at(toks, 0) aborts the whole job on the first
    empty or whitespace-only document (none exist in the fixture; they
    are routine in a real crawl)."""
    import pandas as pd

    from polkadot_etl_spark.queries.corpus_ext import rag_chunk_documents

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["", "   ", "alpha beta gamma delta epsilon zeta"],
            "lang": ["en"] * 3,
            "source": ["src0"] * 3,
            "n_chars": [0, 3, 36],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = rag_chunk_documents(spark, str(tmp_path)).collect()
    # empty docs contribute no chunks; the real doc chunks normally
    assert {r["doc_id"] for r in out} == {2}
    assert all(r["n_tokens"] > 0 for r in out)


def test_html_boilerplate_survives_short_docs(spark, tmp_path):
    """Docs with 1-2 words have q = greatest(n div 4, 1) = 1, so the
    k=3 quarter-slice length n - 3*q goes negative; Spark's slice()
    THROWS on a negative length (DuckDB's list slice returns empty) —
    a data-dependent crash on valid short documents that the fixture
    happens to avoid. greatest(n - 3*q, 0) clamps it to the oracle's
    graceful empty-slice behavior."""
    import pandas as pd

    from polkadot_etl_spark.queries.corpus_ext import html_boilerplate_extract

    pdf = pd.DataFrame(
        {
            # 1 and 2 words (the negative-length class) next to a
            # normal doc; ids avoid %3 == 0 / %7 == 0 so the zoo arms
            # that index words[1..8] (NULL-propagating on short docs)
            # stay out of the way of what this test pins.
            "doc_id": [1, 2, 4],
            "text": ["solo", "two words", "alpha beta gamma delta epsilon"],
            "lang": ["en"] * 3,
            "source": ["src0"] * 3,
            "n_chars": [4, 9, 30],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in html_boilerplate_extract(spark, str(tmp_path)).collect()
    }
    # every doc segments (nav + footer blocks always exist); short docs
    # simply contribute fewer/no content blocks rather than crashing
    assert set(out) == {1, 2, 4}
    assert all(r["n_blocks"] >= 2 for r in out.values())


def test_ivfpq_nprobe_raises_pruning_ceiling(spark):
    """The parameterized nprobe knob: the pruning ceiling (|exact-L2
    truth ∩ probed cells|) is monotone in nprobe, reaches totality at
    nprobe = IVFPQ_NCELL (every cell probed), and out-of-range values
    are rejected — the r7 verdict's 'parameterize nprobe' ask made a
    measured fact."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from polkadot_etl_spark.queries.corpus_ext import (
        IVFPQ_NCELL,
        IVFPQ_NQ,
        IVFPQ_TOPK,
        _ivfpq_celled,
        _ivfpq_probed,
    )
    from polkadot_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") < IVFPQ_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    db = e.select(F.col("vec_id").alias("db_id"), F.col("embedding").alias("c_emb"))
    l2 = F.expr(
        "round(aggregate(zip_with(q_emb, c_emb,"
        " (x, y) -> (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))), 0D, (acc, v) -> acc + v), 6)"
    )
    tw = Window.partitionBy("q_id").orderBy(F.col("l2").asc(), F.col("db_id").asc())
    truth = (
        F.broadcast(q)
        .crossJoin(db)
        .where(F.col("q_id") != F.col("db_id"))
        .select("q_id", "db_id", l2.alias("l2"))
        .withColumn("rn", F.row_number().over(tw))
        .where(F.col("rn") <= IVFPQ_TOPK)
        .select("q_id", "db_id")
        .localCheckpoint(eager=True)
    )
    celled = _ivfpq_celled(e).select("db_id", "cell").localCheckpoint(eager=True)

    def ceiling(nprobe: int) -> int:
        cand = celled.join(
            F.broadcast(_ivfpq_probed(e, nprobe).select("q_id", "cell")), "cell"
        ).where(F.col("db_id") != F.col("q_id")).select("q_id", "db_id")
        return truth.join(cand, ["q_id", "db_id"]).count()

    total = IVFPQ_NQ * IVFPQ_TOPK
    ceilings = [ceiling(n) for n in range(1, IVFPQ_NCELL + 1)]
    assert all(a <= b for a, b in zip(ceilings, ceilings[1:])), ceilings
    assert ceilings[-1] == total  # probing every cell prunes nothing
    assert ceilings[0] < total    # nprobe=1 genuinely prunes on this fixture
    with pytest.raises(ValueError, match="nprobe"):
        _ivfpq_probed(e, 0)
    with pytest.raises(ValueError, match="nprobe"):
        _ivfpq_probed(e, IVFPQ_NCELL + 1)


def test_top_pc_power_matches_numpy_eigenvector(spark):
    """The fixed-point power iteration must point where real linear
    algebra points: the integer direction's |cosine| with numpy's
    leading eigenvector of the centered quantized data's covariance
    must be ~1 (the pagerank/bloom model-pin discipline), and the
    output must be the documented scale/sign contract."""
    import math

    import numpy as np

    from polkadot_etl_spark.queries.corpus_ext import (
        PC_DIMS,
        PC_QUANT,
        PC_SCALE,
        embedding_top_pc_power,
    )
    from polkadot_etl_spark.sources.tables import load_table

    rows = embedding_top_pc_power(spark, SF_DIR).collect()
    assert len(rows) == PC_DIMS
    x = np.array(
        [r["pc_micro"] for r in sorted(rows, key=lambda r: r["dim"])],
        dtype=float,
    )
    # scale contract: max|coord| in [PC_SCALE, 2*PC_SCALE)
    assert PC_SCALE <= np.abs(x).max() < 2 * PC_SCALE
    # sign contract: first nonzero coordinate is positive
    first_nz = next(v for v in x if v != 0)
    assert first_nz > 0

    rows_e = (
        load_table(spark, SF_DIR, "embeddings").orderBy("vec_id").collect()
    )
    emb = np.array([r["embedding"] for r in rows_e], dtype=float)
    ids = np.array([r["vec_id"] for r in rows_e], dtype=np.int64)
    d = np.arange(1, PC_DIMS + 1)
    # the query's synthesized common-direction component (the ABTT
    # setting: the raw fixture is deliberately isotropic)
    bias = ((d * 7) % 13 - 6)[None, :] * (20 + (ids % 11) * 4)[:, None]
    q = np.floor(emb * PC_QUANT) + bias
    # truncating-mean center (Spark div / DuckDB // truncate toward 0)
    s_ = q.sum(axis=0)
    mu = np.sign(s_) * (np.abs(s_) // len(q))
    c = q - mu
    cov = c.T @ c
    w, v = np.linalg.eigh(cov)
    assert w[-2] / w[-1] < 0.5, "synthesized anisotropy missing?"
    lead = v[:, -1]
    cos = abs(float(x @ lead) / (math.sqrt(float(x @ x)) * 1.0))
    assert cos > 0.999, cos


def test_abtt_card_share_semantics(spark):
    """The per-label top-PC variance share must (a) exceed the
    isotropic 1/dims baseline by a wide margin (the synthesized common
    direction is real anisotropy) and (b) be label-UNIFORM (max/min
    within 2x — a direction dominating one label would be signal, not
    anisotropy), and (c) respect the Cauchy-Schwarz bound ppm <= 1e6."""
    from polkadot_etl_spark.queries.corpus_ext import (
        PC_DIMS,
        embedding_abtt_card,
    )

    rows = embedding_abtt_card(spark, SF_DIR).collect()
    shares = {r["label"]: r["pc_share_ppm"] for r in rows}
    assert len(shares) == 10
    baseline = 1_000_000 // PC_DIMS
    assert all(0 < s <= 1_000_000 for s in shares.values())
    assert min(shares.values()) > 3 * baseline
    assert max(shares.values()) < 2 * min(shares.values())


def test_abtt_isotropy_delta_semantics(spark):
    """The applied correction must (a) actually remove the direction —
    residual_pc_ppm exactly 0 per label (truncation residue is < 1 ppm
    by construction, and the projection identity makes the exact value
    part of the hash gate too), and (b) deliver Mu & Viswanath's claim:
    the cross-label spread of centroid-alignment shares TIGHTENS once
    the label-uniform common direction is gone (before: the inflated
    outlier labels sit >2.5x the minimum; after: everything within 2x)."""
    from polkadot_etl_spark.queries.corpus_ext import (
        embedding_abtt_isotropy_delta,
    )

    rows = embedding_abtt_isotropy_delta(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r["residual_pc_ppm"] == 0 for r in rows)
    before = [r["share_before_ppm"] for r in rows]
    after = [r["share_after_ppm"] for r in rows]
    assert all(0 < s <= 1_000_000 for s in before + after)
    assert max(before) > 2.5 * min(before), "fixture anisotropy missing?"
    assert max(after) < 2.0 * min(after), "spread did not tighten"
    assert max(after) / min(after) < max(before) / min(before)
    for r in rows:
        assert r["delta_ppm"] == r["share_after_ppm"] - r["share_before_ppm"]


def test_ivf_incremental_maintenance_semantics(spark):
    """The maintenance card's contracts: the synthesized per-cell drift
    gradient is strictly increasing in cell id, the retrain threshold
    genuinely SPLITS the cells (both verdicts occur — a flag that is
    always true or always false gates nothing), growth sits at the
    2/7-new-batch design point, the quantizer converges in the pinned 2
    rounds, and standing+new partition the corpus exactly."""
    from polkadot_etl_spark.queries.corpus_ext import (
        IVF_MAINT_RETRAIN_PPM,
        ann_ivf_incremental_maintenance,
    )
    from polkadot_etl_spark.sources.tables import load_table

    rows = sorted(
        ann_ivf_incremental_maintenance(spark, SF_DIR).collect(),
        key=lambda r: r["cell"],
    )
    assert [r["cell"] for r in rows] == [0, 1, 2, 3, 4]
    drifts = [r["drift_ppm"] for r in rows]
    assert drifts == sorted(drifts) and len(set(drifts)) == 5, drifts
    verdicts = {r["retrain"] for r in rows}
    assert verdicts == {True, False}, "threshold does not split the cells"
    for r in rows:
        assert r["retrain"] == (r["drift_ppm"] >= IVF_MAINT_RETRAIN_PPM)
        assert 300_000 <= r["growth_ppm"] <= 500_000
        assert r["n_iter"] == 2
    n_total = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_standing"] + r["n_new"] for r in rows) == n_total


def test_daily_increment_composition_semantics(spark):
    """The composed daily-increment pipeline's contracts: every funnel
    branch fires (a branch with zero fixture coverage gates nothing —
    gate drops, ledger dups, the mirror-redelivery stream dups, and a
    kept majority), the counters tie out to the streamed total, the
    kept docs are exactly the new-batch vectors the index admitted, the
    mirror wave is sized by its deterministic rule, and the retrain
    threshold splits the cells with the graded drift increasing in cell
    id (the shared maintenance machinery's contract surviving the
    composition)."""
    from polkadot_etl_spark.queries.corpus_ext import (
        INCR_DOCS,
        INCR_MIN_SRC,
        INCR_MIRROR_MOD,
        INCR_MIRROR_REM,
        IVF_MAINT_RETRAIN_PPM,
        corpus_daily_increment_replay,
    )
    from polkadot_etl_spark.sources.tables import load_table

    rows = sorted(
        corpus_daily_increment_replay(spark, SF_DIR).collect(),
        key=lambda r: r["cell"],
    )
    assert [r["cell"] for r in rows] == [0, 1, 2, 3, 4]
    r0 = rows[0]
    for branch in ("n_gate_dropped", "n_dup_ledger", "n_dup_stream", "n_kept"):
        assert r0[branch] > 0, f"funnel branch {branch} has no fixture signal"
    assert r0["n_streamed"] == (
        r0["n_gate_dropped"] + r0["n_dup_ledger"] + r0["n_dup_stream"] + r0["n_kept"]
    )
    # the admitted new batch IS the kept set
    assert sum(r["n_new"] for r in rows) == r0["n_kept"]
    # the mirror wave's deterministic size: one redelivery per batch doc
    # with doc_id % MOD == REM
    import pyspark.sql.functions as F

    d = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") < INCR_DOCS)
    src_n = F.regexp_extract("source", r"([0-9]+)$", 1).cast("int")
    batch = d.where(src_n >= INCR_MIN_SRC)
    n_batch = batch.count()
    n_mirror = batch.where(
        F.col("doc_id") % INCR_MIRROR_MOD == INCR_MIRROR_REM
    ).count()
    assert n_mirror > 0
    assert r0["n_streamed"] == n_batch + n_mirror
    # maintenance contracts survive the composition
    drifts = [r["drift_ppm"] for r in rows]
    assert drifts == sorted(drifts) and len(set(drifts)) == 5, drifts
    assert {r["retrain"] for r in rows} == {True, False}
    for r in rows:
        assert r["retrain"] == (r["drift_ppm"] >= IVF_MAINT_RETRAIN_PPM)
        assert r["n_standing"] > 0 and r["n_new"] > 0


def test_cms_heavy_hitters_one_sided_error_and_signal(spark):
    """The CMS contracts: the estimate is NEVER below the exact count
    (the one-sided-error guarantee), the fixture width forces a real
    collision mix (both zero and positive overestimates occur — an
    audit where no counter collides prices nothing, and one where every
    counter collides can't show the min-over-rows working), and the
    candidate set is exactly the deterministic top-N."""
    from polkadot_etl_spark.queries.corpus_ext import (
        CMS_TOPN,
        cms_heavy_hitters,
    )

    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == CMS_TOPN
    overs = [r["overestimate"] for r in rows]
    assert all(o >= 0 for o in overs), "CMS under-estimated — sketch math broken"
    assert any(o > 0 for o in overs), "no collision signal — audit is vacuous"
    assert any(o == 0 for o in overs), "every counter collides — width too small"
    for r in rows:
        assert r["cms_estimate"] == r["exact_count"] + r["overestimate"]
        assert r["overestimate_ppm"] == r["overestimate"] * 1_000_000 // r["exact_count"]


def test_snm_pair_set_invariant_under_underfull_partitions(spark):
    """The r12 ADVICE regime: with many more shuffle partitions than the
    key space comfortably fills (64 partitions on the sf0.001 corpus),
    sampled range partitions are routinely under-full or empty — ghosts
    must CHAIN across boundaries (each partition sees the W globally-next
    rows wherever they live) or pairs spanning two boundaries drop. The
    pair set must equal the single-partition (trivially global) run's."""
    from polkadot_etl_spark.queries.corpus_ext import sorted_neighborhood_dedup

    def pairs(n_shuffle):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
        try:
            rows = sorted_neighborhood_dedup(spark, SF_DIR).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return sorted(tuple(r) for r in rows)

    wide, single = pairs(64), pairs(1)
    assert wide == single
    assert len(single) > 0


def test_snm_multipass_attribution_and_consistency(spark):
    """Multi-pass SNM: pass 1 must reproduce the single-pass pair set
    exactly (same verdict integers under normalized pair identity), the
    suffix key must contribute unique pairs (the measured recall gain
    the docstring quotes), the keys must also overlap somewhere (a
    fully disjoint union would mean the passes see different corpora),
    and the pair-identity Exchange must not carry vocab arrays."""
    import re

    from polkadot_etl_spark.queries import corpus_ext as cx

    multi = {
        (r.doc_a, r.doc_b): r
        for r in QUERIES["snm_multipass_dedup"].build(spark, SF_DIR).collect()
    }
    single = QUERIES["sorted_neighborhood_dedup"].build(spark, SF_DIR).collect()
    single_pairs = set()
    for r in single:
        lo, hi = sorted((r.doc_a, r.doc_b))
        single_pairs.add((lo, hi))
        m = multi[(lo, hi)]
        assert m.in_pass1, (lo, hi)
        assert (m.n_inter, m.n_union) == (r.n_inter, r.n_union), (lo, hi)
    pass1 = {k for k, m in multi.items() if m.in_pass1}
    assert pass1 == single_pairs, "pass 1 != single-pass pair set"
    assert any(m.in_pass2 and not m.in_pass1 for m in multi.values()), (
        "suffix key added nothing — the multi-pass gain is vacuous"
    )
    assert any(m.in_pass1 and m.in_pass2 for m in multi.values())
    for m in multi.values():
        assert m.doc_a < m.doc_b
        assert m.jaccard_ppm >= cx.SNM_MIN_PPM
        assert m.in_pass1 or m.in_pass2
    plan = (
        QUERIES["snm_multipass_dedup"]
        .build(spark, SF_DIR)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # formatted mode puts Exchange keys on the detail block's Arguments
    # line — split the detail section into per-node blocks
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    pair_exchanges = [
        b
        for b in blocks
        if re.match(r"\(\d+\) Exchange", b) and "hashpartitioning(lo" in b
    ]
    assert pair_exchanges, "pair-identity exchange missing"
    assert not any("vocab" in b for b in pair_exchanges), pair_exchanges
