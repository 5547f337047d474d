"""operators/bloom.py — the distributed Bloom ledger must match an
independent Python bit-array model exactly (build words, probe verdicts)
and uphold the structural no-false-negative guarantee on any key set."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from polkadot_etl_spark.operators.bloom import (
    DEFAULT_M_BITS,
    DEFAULT_OFFSETS,
    DEFAULT_WORD_BITS,
    bloom_build,
    bloom_probe,
)

_HEX = "0123456789abcdef"


def _positions(h: str, m_bits: int = DEFAULT_M_BITS) -> list[int]:
    return [
        (
            _HEX.index(h[o - 1]) * 256
            + _HEX.index(h[o]) * 16
            + _HEX.index(h[o + 1])
        )
        % m_bits
        for o in DEFAULT_OFFSETS
    ]


def _model_words(keys: list[str]) -> dict[int, int]:
    words: dict[int, int] = {}
    for k in keys:
        for pos in _positions(k):
            w = pos // DEFAULT_WORD_BITS
            words[w] = words.get(w, 0) | (1 << (pos % DEFAULT_WORD_BITS))
    return words


def _model_maybe(h: str, words: dict[int, int]) -> bool:
    return all(
        (words.get(pos // DEFAULT_WORD_BITS, 0) >> (pos % DEFAULT_WORD_BITS)) & 1
        for pos in _positions(h)
    )


def _md5s(lo: int, hi: int) -> list[str]:
    return [hashlib.md5(str(i).encode()).hexdigest() for i in range(lo, hi)]


def test_build_matches_python_bit_model(spark):
    keys = _md5s(0, 200)
    df = spark.createDataFrame([(k,) for k in keys], "h STRING")
    got = {r["word"]: r["wval"] for r in bloom_build(df).collect()}
    assert got == _model_words(keys)


def test_probe_no_false_negatives_and_matches_model(spark):
    member_keys = _md5s(0, 150)
    probe_keys = _md5s(100, 300)  # 50 members + 150 non-members
    members = spark.createDataFrame([(k,) for k in member_keys], "h STRING")
    probes = spark.createDataFrame(
        [(i, k) for i, k in enumerate(probe_keys)], "pid INT, h STRING"
    )
    words = bloom_build(members)
    got = {
        r["h"]: r["bloom_maybe"]
        for r in bloom_probe(probes, words).collect()
    }
    model = _model_words(member_keys)
    member_set = set(member_keys)
    for k in probe_keys:
        # exact agreement with the bit model (includes its false positives)
        assert got[k] == _model_maybe(k, model), k
        # structural guarantee: a member is NEVER reported absent
        if k in member_set:
            assert got[k], f"false negative for member {k}"


def test_probe_carries_extra_columns_through(spark):
    members = spark.createDataFrame([(h,) for h in _md5s(0, 10)], "h STRING")
    probes = spark.createDataFrame(
        [(1, "src9", _md5s(0, 1)[0])], "doc_id INT, source STRING, h STRING"
    )
    out = bloom_probe(probes, bloom_build(members))
    assert set(out.columns) == {"doc_id", "source", "h", "bloom_maybe"}
    row = out.collect()[0]
    assert (row["doc_id"], row["source"], row["bloom_maybe"]) == (1, "src9", True)


def test_partition_invariance(spark):
    keys = _md5s(0, 120)
    df1 = spark.createDataFrame([(k,) for k in keys], "h STRING").coalesce(1)
    df13 = spark.createDataFrame([(k,) for k in keys], "h STRING").repartition(13)
    w1 = {(r["word"], r["wval"]) for r in bloom_build(df1).collect()}
    w13 = {(r["word"], r["wval"]) for r in bloom_build(df13).collect()}
    assert w1 == w13


def test_probe_tolerates_caller_word_column(spark):
    """Internal probe columns are __bloom_-prefixed: a caller column
    named 'word' (or 'pos'/'hit') must pass through untouched instead of
    being clobbered into per-bit garbage groups."""
    members = spark.createDataFrame([(h,) for h in _md5s(0, 10)], "h STRING")
    probes = spark.createDataFrame(
        [("W1", _md5s(0, 1)[0]), ("W2", _md5s(500, 501)[0])],
        "word STRING, h STRING",
    )
    out = bloom_probe(probes, bloom_build(members)).collect()
    assert len(out) == 2  # one row per probe, not per bit
    got = {r["word"]: r["bloom_maybe"] for r in out}
    assert got["W1"] is True  # member


def test_probe_rejects_reserved_columns(spark):
    import pytest

    members = spark.createDataFrame([(h,) for h in _md5s(0, 5)], "h STRING")
    probes = spark.createDataFrame(
        [(1, _md5s(0, 1)[0])], "__bloom_pos INT, h STRING"
    )
    with pytest.raises(ValueError, match="collide"):
        bloom_probe(probes, bloom_build(members))


def test_m_bits_outside_position_space_rejected(spark):
    import pytest

    df = spark.createDataFrame([(h,) for h in _md5s(0, 5)], "h STRING")
    with pytest.raises(ValueError, match="position space"):
        bloom_build(df, m_bits=65536)  # would silently act as 4096
    with pytest.raises(ValueError, match="position space"):
        bloom_build(df, m_bits=1000)  # non-divisor would bias low
    bloom_build(df, m_bits=4096)  # the full space is fine
