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
- dangling nodes (no out-edges) are NOT redistributed — their mass
  leaks, as in the simplified power iteration most rank publications
  use; with per-page edge derivation every node normally has out-edges;
- floor division loses ≤1 unit per edge per round: at scale=10^12 the
  relative error is ~1e-12 · |E|/|V| — irrelevant for ranking, and the
  determinism it buys is the point.

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
- overflow headroom: rank ≤ ~|V|·scale after convergence-ish rounds and
  the contribution product rank·d_num·w must stay < 2^63 — callers with
  hot edges (w > ~10^5 at the default scale) should pre-aggregate or
  lower ``scale``.
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
):
    """Run ``iters`` integer power iterations over ``edges``.

    ``edges`` must have columns (src, dst, w) with positive integer
    weights and no self-loops. Returns (d, rank) — one row per node
    (union of srcs and dsts), rank in fixed-point ``scale`` units.
    With ``return_dims=True`` returns (ranks, nodes, outw) so callers
    needing the node roster / out-weights for their own output reuse
    the SAME materialized dims instead of re-deriving them (the dims
    are eagerly checkpointed here either way — recomputing them caller-
    side doubles the rollup and union-distinct work).
    """
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
    for _ in range(iters):
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
        ranks = nodes.join(contribs, nodes["d"] == contribs["dst"], "left").select(
            "d",
            (F.lit(base).cast("long") + F.coalesce(F.col("cs"), F.lit(0))).alias(
                "rank"
            ),
        )
    if return_dims:
        return ranks, nodes, outw
    return ranks
