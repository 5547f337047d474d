"""Weighted PageRank over an edge list — link-analysis centrality for
crawl-quality priors (Common Crawl publishes host/domain ranks; quality
pipelines consume them when weighting sources). Beyond-reference,
first-class per the build brief; the third iterative operator family
beside k-means (operators/kmeans.py) and connected components
(operators/graph.py).

Determinism contract: ALL-INTEGER fixed-point arithmetic. Ranks start at
``scale`` (default 10^12) per node; each iteration an edge (u→v, weight
w) contributes floor(rank(u) * d_num * w / (d_den * outw(u))) and every
node receives the teleport term floor(scale * (d_den - d_num) / d_den).
No float ever exists, so the result is bit-identical across engines,
partitionings, and iteration-internal orderings — the same discipline
that makes kmeans/CC oracle-checkable.

Semantics notes:
- damping is the integer pair (d_num, d_den) = (85, 100) by default;
- dangling nodes (no out-edges) LEAK their mass by default, as in the
  simplified power iteration most rank publications use; pass
  ``redistribute_dangling=True`` for the integer-exact standard
  treatment — each iteration the danglings' summed rank is damped and
  split equally, every node receiving
  floor(dangling_mass * d_num / (d_den * |V|)) on top of the teleport
  term (the floor residual, < |V| fixed-point units per iteration, is
  the only remaining leak);
- floor division loses ≤1 unit per edge per round: at scale=10^12 the
  relative error is ~1e-12 · |E|/|V| — irrelevant for ranking, and the
  determinism it buys is the point;
- ``return_deltas=True`` measures convergence instead of assuming it:
  per-iteration Σ|rank_t − rank_{t-1}| in fixed-point units (the recall-
  audit discipline applied to the iteration count — callers justify
  ``iters`` with the measured tail, not a guess).

Scale notes (100 TB):
- each iteration is ONE src-keyed join (edges × ranks, co-partitioned
  with the out-weight dim) + ONE dst-keyed aggregate — the canonical
  iterative-DataFrame shape; the key partitioning is reusable across
  rounds;
- the edge table and the two per-iteration dims (out-weights, node
  roster) must be materialized ONCE — pass checkpoint=True (default) to
  cut lineage exactly like the CC loop, or the unrolled plan re-runs
  the graph build per consumer (measured ~10s → ~2.2s at sf0.01 on the
  domain_pagerank query);
- delta accounting / dangling redistribution force one bounded driver
  round-trip per iteration (a 1-row aggregate — the kmeans-centroid
  class of driver state) and a per-iteration rank checkpoint so the
  loop stays O(iters), not O(iters²); the default path stays fully
  lazy with zero driver round-trips;
- overflow: the contribution product rank·d_num·w must stay < 2^63.
  The operator REQUIRES an ANSI session (spark.sql.ansi.enabled=true,
  Spark 4's default) so an overflow fails loudly with an
  ArithmeticException instead of wrapping into silently wrong ranks —
  callers with hot edges (w > ~10^5 at the default scale) should
  pre-aggregate or lower ``scale``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 4,
    scale: int = DEFAULT_SCALE,
    d_num: int = 85,
    d_den: int = 100,
    checkpoint: bool = True,
    return_dims: bool = False,
    return_deltas: bool = False,
    redistribute_dangling: bool = False,
):
    """Run ``iters`` integer power iterations over ``edges``.

    ``edges`` must have columns (src, dst, w) with positive integer
    weights and no self-loops. Returns (d, rank) — one row per node
    (union of srcs and dsts), rank in fixed-point ``scale`` units.
    With ``return_dims=True`` the return is (ranks, nodes, outw) so
    callers needing the node roster / out-weights for their own output
    reuse the SAME materialized dims instead of re-deriving them (the
    dims are eagerly checkpointed here either way — recomputing them
    caller-side doubles the rollup and union-distinct work). With
    ``return_deltas=True`` a list of per-iteration Σ|Δrank| (fixed-point
    units, one entry per iteration) is appended as the LAST element of
    the return tuple.
    """
    ansi = str(edges.sparkSession.conf.get("spark.sql.ansi.enabled", "true"))
    if ansi.lower() != "true":
        raise ValueError(
            "pagerank requires spark.sql.ansi.enabled=true: under non-ANSI"
            " configs the rank*d_num*w product wraps silently on int64"
            " overflow and ranks are wrong with no error"
        )
    if checkpoint:
        edges = edges.localCheckpoint(eager=True)
    # the two dims are consumed by EVERY iteration — always materialize
    # them (they are |V|-row tables; callers passing checkpoint=False
    # have already materialized edges themselves)
    outw = (
        edges.groupBy("src")
        .agg(F.sum("w").cast("long").alias("ow"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("d"))
        .union(edges.select(F.col("dst").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("d", F.lit(scale).cast("long").alias("rank"))
    base = scale * (d_den - d_num) // d_den
    # per-iteration driver round-trips (1-row aggregates) need the rank
    # lineage cut each round or iteration t re-executes rounds 1..t-1
    eager_rounds = return_deltas or redistribute_dangling
    n_nodes = nodes.count() if redistribute_dangling else None
    deltas: list[int] = []
    for _ in range(iters):
        extra = 0
        if redistribute_dangling:
            # dangling mass = rank held by nodes with no out-edges;
            # damped and split equally (integer floor — the residual,
            # < |V| units, is the only remaining leak)
            dang = (
                ranks.join(outw, ranks["d"] == outw["src"], "left_anti")
                .agg(F.sum("rank").alias("ds"))
                .collect()[0]["ds"]
            )
            extra = ((dang or 0) * d_num) // (d_den * n_nodes)
        contribs = (
            edges.join(ranks, edges["src"] == ranks["d"])
            .join(outw, "src")
            .select(
                "dst",
                F.expr(f"(rank * {d_num} * w) div ({d_den} * ow)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("cs"))
        )
        new_ranks = nodes.join(contribs, nodes["d"] == contribs["dst"], "left").select(
            "d",
            (
                F.lit(base + extra).cast("long") + F.coalesce(F.col("cs"), F.lit(0))
            ).alias("rank"),
        )
        if eager_rounds:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if return_deltas:
            prev = ranks.select(F.col("d"), F.col("rank").alias("__prev"))
            deltas.append(
                new_ranks.join(prev, "d")
                .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias("dl"))
                .collect()[0]["dl"]
            )
        ranks = new_ranks
    out: tuple = (ranks,)
    if return_dims:
        out = (ranks, nodes, outw)
    if return_deltas:
        out = (*out, deltas)
    return out if len(out) > 1 else ranks
