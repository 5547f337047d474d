"""Distributed Bloom filter as a PARTITIONED bit array — the
O(k-bits-per-key) membership ledger a crawl frontier / daily dedup needs
(beyond-reference, first-class per the build brief).

Unlike Spark's built-in ``DataFrame.stat.bloomFilter`` (which aggregates
the whole filter onto the driver), the filter here is a DataFrame of
(word, wval) rows — word id = bit position div ``word_bits``, value =
bit_or of the members' bits — so the BUILD is distributed and the filter
itself can be arbitrarily large (m/word_bits rows), stored as a table,
and probed with an ordinary keyed join. AQE broadcasts it while it is
small and falls back to a shuffle join when it is not; no code change.

Hash functions: k bit positions per key derived from non-overlapping
md5 nibble triples (the engine-portable hex→int used across the repo),
reduced mod ``m_bits``. The Bloom guarantee (no false negatives) is a
structural property of bit_or + identical probe positions; the
false-positive rate is a function of fill and must be MEASURED, not
assumed — the bloom_dedup_membership registry query reports it against
exact truth, and the property test here pins the no-false-negative side
under hypothesis-generated key sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 512
DEFAULT_WORD_BITS = 32
DEFAULT_OFFSETS = (1, 9, 17)  # md5 nibble-triple offsets → k=3 positions


def bloom_positions_expr(
    col: str, m_bits: int = DEFAULT_M_BITS, offsets: tuple[int, ...] = DEFAULT_OFFSETS
) -> str:
    """Spark SQL array of k bit positions for the md5-hex column ``col``.

    Each position is a 12-bit integer assembled from three hex nibbles
    via instr arithmetic, reduced mod ``m_bits``. Pure column math —
    computed map-side, one md5 per row upstream."""
    offs = ", ".join(str(o) for o in offsets)
    return (
        f"transform(array({offs}), o -> ("
        f" (instr('0123456789abcdef', substring({col}, o, 1)) - 1) * 256"
        f" + (instr('0123456789abcdef', substring({col}, o + 1, 1)) - 1) * 16"
        f" + (instr('0123456789abcdef', substring({col}, o + 2, 1)) - 1)"
        f") % {m_bits})"
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "h",
    m_bits: int = DEFAULT_M_BITS,
    word_bits: int = DEFAULT_WORD_BITS,
    offsets: tuple[int, ...] = DEFAULT_OFFSETS,
) -> DataFrame:
    """Fold md5-hex keys into (word, wval) ledger rows — one bit_or
    aggregate per word; the only shuffle is the word-keyed groupBy."""
    return (
        keys.select(
            F.explode(F.expr(bloom_positions_expr(key_col, m_bits, offsets))).alias(
                "pos"
            )
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
) -> DataFrame:
    """Per probe row: ``bloom_maybe`` = all k bits set in the ledger.

    Probe rows must carry an md5-hex ``key_col``; every other column is
    preserved through the k-position explode + word-keyed left join +
    bool_and regroup. No broadcast hint — AQE sizes the ledger side."""
    carry = [c for c in probes.columns]
    exploded = probes.select(
        *carry,
        F.explode(F.expr(bloom_positions_expr(key_col, m_bits, offsets))).alias(
            "pos"
        ),
    ).withColumn("word", F.expr(f"pos div {word_bits}"))
    hit = (F.col("wval").isNotNull()) & (
        F.expr(f"wval & shiftleft(1L, pos % {word_bits})") != 0
    )
    return (
        exploded.join(words, "word", "left")
        .select(*carry, hit.alias("hit"))
        .groupBy(*carry)
        .agg(F.bool_and("hit").alias("bloom_maybe"))
    )
