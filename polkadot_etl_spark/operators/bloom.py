"""Distributed Bloom filter as a PARTITIONED bit array — the
O(k-bits-per-key) membership ledger a crawl frontier / daily dedup needs
(beyond-reference, first-class per the build brief).

Unlike Spark's built-in ``DataFrame.stat.bloomFilter`` (which aggregates
the whole filter onto the driver), the filter here is a DataFrame of
(word, wval) rows — word id = bit position div ``word_bits``, value =
bit_or of the members' bits — so the BUILD is distributed, the ledger is
an ordinary table, and probing is an ordinary keyed join. The position
space of the hash family is 16^``nibbles`` (window width in md5 hex
chars per position; default 3 → 4096 for fixture-visible fill, 6 →
16.7M positions for crawl-frontier scale, ``nibbles=8`` → 2^32);
``m_bits`` is validated to a power-of-two divisor of that space —
widening the window scales m without changing the plan shape. AQE
broadcasts the ledger while it is small and falls back to a shuffle
join when it is not; no code change.

Hash functions: k bit positions per key derived from non-overlapping
md5 nibble windows (the engine-portable hex→int used across the repo),
reduced mod ``m_bits``. The Bloom guarantee (no false negatives) is a
structural property of bit_or + identical probe positions; the
false-positive rate is a function of fill and must be MEASURED, not
assumed — the bloom_dedup_membership registry query reports it against
exact truth, and the property test here pins the no-false-negative side
under hypothesis-generated key sets (both the default and the widened
family, vs an independent Python bit model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 512
DEFAULT_WORD_BITS = 32
DEFAULT_OFFSETS = (1, 9, 17)  # md5 window start offsets → k=3 positions
DEFAULT_NIBBLES = 3  # hex chars per position window (16^3 = 4096 positions)
_MD5_HEX_LEN = 32


def bloom_positions_expr(
    col: str,
    m_bits: int = DEFAULT_M_BITS,
    offsets: tuple[int, ...] = DEFAULT_OFFSETS,
    nibbles: int = DEFAULT_NIBBLES,
) -> str:
    """Spark SQL array of k bit positions for the md5-hex column ``col``.

    Each position is a ``4*nibbles``-bit integer assembled from
    ``nibbles`` consecutive hex chars via instr arithmetic, reduced mod
    ``m_bits``. Pure column math — computed map-side, one md5 per row
    upstream. ``nibbles`` caps at 15 so the position value stays inside
    int64 (16^15 < 2^63)."""
    if not (1 <= nibbles <= 15):
        raise ValueError(f"nibbles={nibbles}: must be in [1, 15] (int64 positions)")
    space = 16 ** nibbles
    if not (0 < m_bits <= space and space % m_bits == 0):
        raise ValueError(
            f"m_bits={m_bits}: the {nibbles}-nibble position space is"
            f" {space} — m_bits must be a power-of-two divisor of it"
            " (a larger m would silently never set the high bits, and a"
            " non-divisor would bias positions low); widen `nibbles` to"
            " scale m"
        )
    bad = [o for o in offsets if o < 1 or o + nibbles - 1 > _MD5_HEX_LEN]
    if bad:
        # an offset whose window runs past the 32-char digest makes
        # substring return '' so instr(...)-1 yields -1 terms — build
        # and probe stay consistent but the filter silently degenerates
        raise ValueError(
            f"offsets {bad}: each {nibbles}-char window must fit the"
            f" {_MD5_HEX_LEN}-char md5 hex (1 <= o <= {_MD5_HEX_LEN - nibbles + 1})"
        )
    offs = ", ".join(str(o) for o in offsets)
    # coefficients as BIGINT literals: at nibbles >= 8 the 16^(n-1)
    # coefficient still fits INT but (15 * coeff) does not — an INT*INT
    # plan under ANSI throws ARITHMETIC_OVERFLOW (caught by the grid
    # sweep in tests/test_bloom.py)
    terms = " + ".join(
        f"(instr('0123456789abcdef', substring({col}, o + {j}, 1)) - 1)"
        f" * {16 ** (nibbles - 1 - j)}L"
        for j in range(nibbles)
    )
    return f"transform(array({offs}), o -> ({terms}) % {m_bits}L)"


def bloom_build(
    keys: DataFrame,
    key_col: str = "h",
    m_bits: int = DEFAULT_M_BITS,
    word_bits: int = DEFAULT_WORD_BITS,
    offsets: tuple[int, ...] = DEFAULT_OFFSETS,
    nibbles: int = DEFAULT_NIBBLES,
) -> DataFrame:
    """Fold md5-hex keys into (word, wval) ledger rows — one bit_or
    aggregate per word; the only shuffle is the word-keyed groupBy."""
    return (
        keys.select(
            F.explode(
                F.expr(bloom_positions_expr(key_col, m_bits, offsets, nibbles))
            ).alias("pos")
        )
        .groupBy(F.expr(f"pos div {word_bits}").alias("word"))
        .agg(F.bit_or(F.expr(f"shiftleft(1L, pos % {word_bits})")).alias("wval"))
    )


def bloom_probe(
    probes: DataFrame,
    words: DataFrame,
    key_col: str = "h",
    m_bits: int = DEFAULT_M_BITS,
    word_bits: int = DEFAULT_WORD_BITS,
    offsets: tuple[int, ...] = DEFAULT_OFFSETS,
    nibbles: int = DEFAULT_NIBBLES,
) -> DataFrame:
    """Per probe row: ``bloom_maybe`` = all k bits set in the ledger.

    Probe rows must carry an md5-hex ``key_col``; every other column is
    preserved through the k-position explode + word-keyed left join +
    bool_and regroup (internal columns are __bloom_-prefixed so caller
    columns named ``word``/``pos``/``hit`` pass through untouched). No
    broadcast hint — AQE sizes the ledger side."""
    reserved = {"__bloom_pos", "__bloom_word", "__bloom_wval", "__bloom_hit"}
    clash = reserved & set(probes.columns)
    if clash:
        raise ValueError(f"probe columns collide with internals: {sorted(clash)}")
    carry = [c for c in probes.columns]
    exploded = probes.select(
        *carry,
        F.explode(
            F.expr(bloom_positions_expr(key_col, m_bits, offsets, nibbles))
        ).alias("__bloom_pos"),
    ).withColumn("__bloom_word", F.expr(f"__bloom_pos div {word_bits}"))
    ledger = words.select(
        F.col("word").alias("__bloom_word"), F.col("wval").alias("__bloom_wval")
    )
    hit = (F.col("__bloom_wval").isNotNull()) & (
        F.expr(f"__bloom_wval & shiftleft(1L, __bloom_pos % {word_bits})") != 0
    )
    return (
        exploded.join(ledger, "__bloom_word", "left")
        .select(*carry, hit.alias("__bloom_hit"))
        .groupBy(*carry)
        .agg(F.bool_and("__bloom_hit").alias("bloom_maybe"))
    )
