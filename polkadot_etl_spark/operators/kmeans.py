"""Iterative k-means (Lloyd's algorithm) over embedding columns.

Completes the vector-quantization family: ``ivf_centroid_update``
(queries/llmdata.py) is ONE assign+update step and ``semdedup_prune``
uses literal seeds; real corpus clustering (SemDeDup's k≈√N cells, IVF
coarse-quantizer training) needs the loop driven to convergence.

Spark shape per round — the same discipline as the one-step version:

- ASSIGN is zero-shuffle: the k×dim centroids live on the driver
  (bounded state, exactly the reference-scale of an in-process model)
  and inline as literal score expressions, so the nearest-centroid
  argmax is pure generated column code. Scores build as ONE SQL string:
  composing k×dim terms through the Column API costs thousands of py4j
  round-trips (measured ~4 s/round at k=8, dim=64 — see
  ivf_centroid_update's note).
- UPDATE is the one unavoidable shuffle: posexplode to (cid, dim) with
  map-side partial sums — k × dim × n_partitions rows cross the wire
  regardless of corpus size. Component means are exact decimal sums
  divided once (engine-stable).
- CONVERGENCE compares consecutive centroid matrices on the driver;
  with exact-decimal means, identical memberships reproduce identical
  doubles, so a stable partition terminates with shift == 0.0 — no
  epsilon needed for the common case.

Nearest-centroid uses the squared-L2 decomposition
argmin ||x-c||² = argmax (x·c − ||c||²/2): only the dot product touches
the row, the −||c||²/2 constant folds into the literal. Ties break to
the LOWEST cid (total order, reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _score_array_sql(vec_col: str, centroids: list[list[float]]) -> str:
    """array(named_struct(score, x·c_j − ||c_j||²/2, negcid, -j) ...) as
    ONE SQL string — literals via CAST('repr' AS DOUBLE) (strtod,
    correctly rounded), flat left-associated term chains."""
    structs = []
    for j, c in enumerate(centroids):
        dot = " + ".join(
            f"CAST({vec_col}[{i}] AS DOUBLE) * CAST('{float(v)!r}' AS DOUBLE)"
            for i, v in enumerate(c)
        )
        half_norm = sum(float(v) * float(v) for v in c) / 2.0
        structs.append(
            f"named_struct('score', ({dot}) - CAST('{half_norm!r}' AS DOUBLE),"
            f" 'negcid', {-j})"
        )
    return "array(" + ", ".join(structs) + ")"


def assign_nearest(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """df + a ``cid`` column: index of the nearest centroid (squared-L2,
    lowest-cid tie-break). Zero shuffle. The assignment is its OWN
    projection — fused into a downstream Generate, the k×dim score
    expression would re-evaluate once per exploded element (measured
    4.4 s vs 0.8 s at sf0.1, see ivf_centroid_update)."""
    scores = F.expr(_score_array_sql(vec_col, centroids))
    return df.select("*", (-F.array_max(scores)["negcid"]).cast("int").alias("cid"))


def _update_centroids(assigned: DataFrame, vec_col: str, k: int, dim: int) -> list[list[float]]:
    rows = (
        assigned.select("cid", F.posexplode(vec_col).alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("double").cast("decimal(38,10)")).cast("string").cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    out = [[0.0] * dim for _ in range(k)]
    for r in rows:
        out[r.cid][r.pos] = r.m
    return out


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 0.0,
) -> tuple[DataFrame, list[list[float]], int]:
    """Lloyd's loop to convergence. Init = the k lowest-id vectors
    (deterministic, like the one-step IVF seeds). Returns (assignments
    DataFrame with the final ``cid`` column, centroids, iterations run).

    Each round costs one corpus scan + one (cid, dim)-keyed shuffle; the
    k×dim centroid state rides the driver — at 100 TB that is the same
    bounded-model shape as broadcasting any trained quantizer."""
    seed_rows = sorted(
        df.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(k).collect(),
        key=lambda r: r[0],
    )
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    centroids = [[float(v) for v in r[1]] for r in seed_rows]
    dim = len(centroids[0])
    it = 0
    for it in range(1, max_iter + 1):
        assigned = assign_nearest(df, centroids, vec_col)
        new_centroids = _update_centroids(assigned, vec_col, k, dim)
        shift = max(
            abs(a - b) for ca, cb in zip(new_centroids, centroids) for a, b in zip(ca, cb)
        )
        centroids = new_centroids
        if shift <= tol:
            break
    return assign_nearest(df, centroids, vec_col), centroids, it
