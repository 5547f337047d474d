"""operators/pagerank.py — the integer power iteration must match an
independent Python fixed-point model exactly (same floors, same teleport),
stay partition-invariant, and handle receive-only (dangling-source) nodes."""

from __future__ import annotations

from polkadot_etl_spark.operators.pagerank import pagerank

SCALE = 1_000_000_000_000


def _model(edges, iters, scale=SCALE, d_num=85, d_den=100, redistribute=False):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    rank = {n: scale for n in nodes}
    base = scale * (d_den - d_num) // d_den
    deltas = []
    for _ in range(iters):
        extra = 0
        if redistribute:
            dang = sum(rank[n] for n in nodes if n not in outw)
            extra = (dang * d_num) // (d_den * len(nodes))
        contrib = {n: 0 for n in nodes}
        for s, d, w in edges:
            contrib[d] += (rank[s] * d_num * w) // (d_den * outw[s])
        new_rank = {n: base + extra + contrib[n] for n in nodes}
        deltas.append(sum(abs(new_rank[n] - rank[n]) for n in nodes))
        rank = new_rank
    return rank, deltas


EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("c", "a", 5),
    ("c", "b", 1),
    ("a", "d", 2),  # d receives but never links out (dangling node)
]


def _spark_ranks(spark, edges, iters, repartition=None, **kw):
    df = spark.createDataFrame(edges, "src STRING, dst STRING, w LONG")
    if repartition:
        df = df.repartition(repartition)
    return {r["d"]: r["rank"] for r in pagerank(df, iters=iters, **kw).collect()}


def test_matches_python_integer_model_exactly(spark):
    got = _spark_ranks(spark, EDGES, iters=4)
    assert got == _model(EDGES, iters=4)[0]


def test_dangling_node_receives_but_leaks(spark):
    got = _spark_ranks(spark, EDGES, iters=3)
    model, _ = _model(EDGES, iters=3)
    # d has no out-edges: its rank is teleport + inbound, and the total
    # mass is strictly below n*scale (leak is the documented semantics)
    assert got["d"] == model["d"] > SCALE * 15 // 100
    assert sum(got.values()) < 4 * SCALE


def test_partition_invariance(spark):
    assert _spark_ranks(spark, EDGES, iters=4, repartition=7) == _spark_ranks(
        spark, EDGES, iters=4, repartition=1
    )


def test_zero_iterations_is_uniform_init(spark):
    got = _spark_ranks(spark, EDGES, iters=0)
    assert set(got.values()) == {SCALE}


def test_damping_pair_is_respected(spark):
    got = _spark_ranks(spark, EDGES, iters=2, d_num=50, d_den=100)
    assert got == _model(EDGES, iters=2, d_num=50, d_den=100)[0]


def test_return_dims_shares_materialized_tables(spark):
    ranks, nodes, outw = pagerank(
        spark.createDataFrame(EDGES, "src STRING, dst STRING, w LONG"),
        iters=2,
        return_dims=True,
    )
    assert {r["d"] for r in nodes.collect()} == {"a", "b", "c", "d"}
    assert {r["src"]: r["ow"] for r in outw.collect()} == {"a": 6, "b": 2, "c": 6}
    assert {r["d"]: r["rank"] for r in ranks.collect()} == _model(EDGES, iters=2)[0]


def test_delta_accounting_matches_model_and_decays(spark):
    """return_deltas measures Σ|Δrank| per iteration in fixed-point
    units — exactly the model's sequence, and on this graph the tail
    decays (the measurement that justifies an iteration count)."""
    df = spark.createDataFrame(EDGES, "src STRING, dst STRING, w LONG")
    ranks, deltas = pagerank(df, iters=5, return_deltas=True)
    model_rank, model_deltas = _model(EDGES, iters=5)
    assert deltas == model_deltas
    assert len(deltas) == 5
    assert {r["d"]: r["rank"] for r in ranks.collect()} == model_rank
    # convergence is visible in the measured tail, not assumed
    assert deltas[-1] < deltas[0] // 10


def test_dangling_redistribution_is_integer_exact(spark):
    """redistribute_dangling: each round the danglings' damped mass is
    split equally (integer floor). Ranks match the extended model
    bit-for-bit and total mass is conserved up to the documented floor
    residuals (< |V| units per round + per-edge floors), vs the default
    leak of d's whole damped rank each round."""
    df = spark.createDataFrame(EDGES, "src STRING, dst STRING, w LONG")
    ranks, deltas = pagerank(df, iters=3, return_deltas=True, redistribute_dangling=True)
    model_rank, model_deltas = _model(EDGES, iters=3, redistribute=True)
    got = {r["d"]: r["rank"] for r in ranks.collect()}
    assert got == model_rank
    assert deltas == model_deltas
    leak_default = 4 * SCALE - sum(_model(EDGES, iters=3)[0].values())
    leak_redist = 4 * SCALE - sum(got.values())
    assert leak_redist < leak_default // 100  # the leak class is gone
    # partition invariance holds for the redistribution path too
    got7 = {
        r["d"]: r["rank"]
        for r in pagerank(df.repartition(7), iters=3, redistribute_dangling=True).collect()
    }
    assert got7 == got


def test_scale_and_damping_grid_matches_model(spark):
    """Fixed-point grid: small scales and unusual damping pairs all
    match the model exactly (the floor arithmetic has no
    scale-dependent shortcuts)."""
    for scale, d_num, d_den in [(10**6, 85, 100), (10**9, 1, 2), (10**12, 99, 100)]:
        got = _spark_ranks(spark, EDGES, iters=3, scale=scale, d_num=d_num, d_den=d_den)
        want, _ = _model(EDGES, iters=3, scale=scale, d_num=d_num, d_den=d_den)
        assert got == want, (scale, d_num, d_den)


def test_non_ansi_session_rejected(spark):
    """ADVICE r7: under non-ANSI configs the rank*d_num*w product wraps
    silently on int64 overflow — the operator must refuse to run."""
    import pytest

    df = spark.createDataFrame(EDGES, "src STRING, dst STRING, w LONG")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(ValueError, match="ansi"):
            pagerank(df, iters=1)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
