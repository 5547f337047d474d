"""operators/pagerank.py — the integer power iteration must match an
independent Python fixed-point model exactly (same floors, same teleport),
stay partition-invariant, and handle receive-only (dangling-source) nodes."""

from __future__ import annotations

from polkadot_etl_spark.operators.pagerank import pagerank

SCALE = 1_000_000_000_000


def _model(edges, iters, scale=SCALE, d_num=85, d_den=100):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    rank = {n: scale for n in nodes}
    base = scale * (d_den - d_num) // d_den
    for _ in range(iters):
        contrib = {n: 0 for n in nodes}
        for s, d, w in edges:
            contrib[d] += (rank[s] * d_num * w) // (d_den * outw[s])
        rank = {n: base + contrib[n] for n in nodes}
    return rank


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
    assert got == _model(EDGES, iters=4)


def test_dangling_node_receives_but_leaks(spark):
    got = _spark_ranks(spark, EDGES, iters=3)
    model = _model(EDGES, iters=3)
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
    assert got == _model(EDGES, iters=2, d_num=50, d_den=100)


def test_return_dims_shares_materialized_tables(spark):
    ranks, nodes, outw = pagerank(
        spark.createDataFrame(EDGES, "src STRING, dst STRING, w LONG"),
        iters=2,
        return_dims=True,
    )
    assert {r["d"] for r in nodes.collect()} == {"a", "b", "c", "d"}
    assert {r["src"]: r["ow"] for r in outw.collect()} == {"a": 6, "b": 2, "c": 6}
    assert {r["d"]: r["rank"] for r in ranks.collect()} == _model(EDGES, iters=2)
