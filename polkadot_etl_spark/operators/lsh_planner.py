"""MinHash-LSH band planning — choose (bands b, rows r) for a TARGET
Jaccard threshold instead of hard-coding them (the r7 verdict's
"parameterize bands/rows" ask, as a driver-side planning utility like
the JDBC partition planner).

Theory (Leskovec/Rajaraman/Ullman ch. 3): a pair with Jaccard s collides
in at least one band with probability P(s) = 1 - (1 - s^r)^b — an
S-curve whose inflection sits near t*(b, r) = (1/b)^(1/r). Planning =
pick the (b, r) with b*r <= n_hashes whose t* lands closest to the
requested threshold; the residual false-positive / false-negative mass
on either side is then a MEASURABLE property (integrated here with a
fixed deterministic grid — the measure-don't-assume discipline), not an
assumption.

Everything here is bounded driver math (no DataFrame); the chosen (b, r)
parameterizes the minhash queries' band construction. The repo's
fixture configuration (N_BANDS=4, one minhash per band — b=4, r=1,
t* = 0.25) is pinned against this planner in tests/test_lsh_planner.py.
"""

from __future__ import annotations

_GRID = 1000  # fixed integration grid — deterministic across platforms


def collision_probability(s: float, b: int, r: int) -> float:
    """P(candidate | Jaccard s) under b bands of r rows."""
    if not (0.0 <= s <= 1.0):
        raise ValueError(f"jaccard s={s} outside [0, 1]")
    _validate(b, r)
    return 1.0 - (1.0 - s ** r) ** b


def curve_threshold(b: int, r: int) -> float:
    """The S-curve's characteristic threshold t* = (1/b)^(1/r)."""
    _validate(b, r)
    return (1.0 / b) ** (1.0 / r)


def false_rates(threshold: float, b: int, r: int) -> "tuple[float, float]":
    """(fp_mass, fn_mass): the integrated collision probability BELOW
    the threshold (work wasted verifying non-pairs, assuming uniform s)
    and the integrated miss probability AT OR ABOVE it (true pairs the
    bands never propose). Fixed-grid midpoint integration, normalized
    by each region's width — deterministic, comparable across (b, r)."""
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold={threshold} outside (0, 1)")
    _validate(b, r)
    below = [collision_probability((i + 0.5) * threshold / _GRID, b, r)
             for i in range(_GRID)]
    width_hi = 1.0 - threshold
    above = [1.0 - collision_probability(threshold + (i + 0.5) * width_hi / _GRID, b, r)
             for i in range(_GRID)]
    return sum(below) / _GRID, sum(above) / _GRID


def plan_bands(threshold: float, n_hashes: int) -> "tuple[int, int]":
    """The (b, r) with b*r <= n_hashes whose t* sits nearest the target
    threshold; ties break toward LOWER false-negative mass (dedup's
    costly error is the miss — a false positive only wastes a verify),
    then toward fewer hashes, then more bands (total order, so the plan
    is deterministic)."""
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold={threshold} outside (0, 1)")
    if n_hashes < 1:
        raise ValueError(f"n_hashes={n_hashes} < 1")
    candidates = []
    for r in range(1, n_hashes + 1):
        for b in range(1, n_hashes // r + 1):
            candidates.append((abs(curve_threshold(b, r) - threshold), b, r))
    # the fn-mass integration only matters for ties on the primary
    # |t* - threshold| key — compute it lazily for the tied front only
    best_dist = min(c[0] for c in candidates)
    tied = [c for c in candidates if c[0] == best_dist]
    best = None
    for dist, b, r in tied:
        _, fn = false_rates(threshold, b, r) if len(tied) > 1 else (0.0, 0.0)
        key = (fn, b * r, -b)
        if best is None or key < best[0]:
            best = (key, (b, r))
    return best[1]


def _validate(b: int, r: int) -> None:
    if b < 1 or r < 1:
        raise ValueError(f"bands={b}, rows={r}: both must be >= 1")
