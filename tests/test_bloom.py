"""operators/bloom.py — the distributed Bloom ledger must match an
independent Python bit-array model exactly (build words, probe verdicts)
and uphold the structural no-false-negative guarantee on any key set."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from polkadot_etl_spark.operators.bloom import (
    DEFAULT_M_BITS,
    DEFAULT_NIBBLES,
    DEFAULT_OFFSETS,
    DEFAULT_WORD_BITS,
    bloom_build,
    bloom_probe,
)

_HEX = "0123456789abcdef"


def _positions(
    h: str,
    m_bits: int = DEFAULT_M_BITS,
    offsets: tuple[int, ...] = DEFAULT_OFFSETS,
    nibbles: int = DEFAULT_NIBBLES,
) -> list[int]:
    return [
        sum(
            _HEX.index(h[o - 1 + j]) * 16 ** (nibbles - 1 - j)
            for j in range(nibbles)
        )
        % m_bits
        for o in offsets
    ]


def _model_words(
    keys: list[str],
    m_bits: int = DEFAULT_M_BITS,
    offsets: tuple[int, ...] = DEFAULT_OFFSETS,
    nibbles: int = DEFAULT_NIBBLES,
) -> dict[int, int]:
    words: dict[int, int] = {}
    for k in keys:
        for pos in _positions(k, m_bits, offsets, nibbles):
            w = pos // DEFAULT_WORD_BITS
            words[w] = words.get(w, 0) | (1 << (pos % DEFAULT_WORD_BITS))
    return words


def _model_maybe(
    h: str,
    words: dict[int, int],
    m_bits: int = DEFAULT_M_BITS,
    offsets: tuple[int, ...] = DEFAULT_OFFSETS,
    nibbles: int = DEFAULT_NIBBLES,
) -> bool:
    return all(
        (words.get(pos // DEFAULT_WORD_BITS, 0) >> (pos % DEFAULT_WORD_BITS)) & 1
        for pos in _positions(h, m_bits, offsets, nibbles)
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


def test_offsets_past_digest_end_rejected(spark):
    """A window running past the 32-char md5 hex makes substring return
    '' so instr(...)-1 yields -1 terms — skewed/negative positions with
    build and probe staying silently consistent. Must raise instead."""
    import pytest

    df = spark.createDataFrame([(h,) for h in _md5s(0, 5)], "h STRING")
    with pytest.raises(ValueError, match="window must fit"):
        bloom_build(df, offsets=(1, 9, 31))  # 31+3-1 = 33 > 32
    with pytest.raises(ValueError, match="window must fit"):
        bloom_build(df, offsets=(0, 9, 17))  # offsets are 1-based
    with pytest.raises(ValueError, match="window must fit"):
        # valid at 3 nibbles, overruns at 6
        bloom_build(df, m_bits=4096, offsets=(1, 15, 28), nibbles=6)
    bloom_build(df, offsets=(1, 9, 30))  # 30+3-1 = 32: exactly fits


def test_widened_family_matches_model_m_65536(spark):
    """The r7 scale gap: the 3-nibble family capped m at 4096 bits. The
    widened window (6 nibbles → 16.7M-position space) must build a
    m=65536 ledger bit-for-bit equal to the Python model and keep the
    no-false-negative guarantee."""
    kw = dict(m_bits=65536, offsets=(1, 9, 17), nibbles=6)
    member_keys = _md5s(0, 400)
    probe_keys = _md5s(300, 700)  # 100 members + 300 non-members
    members = spark.createDataFrame([(k,) for k in member_keys], "h STRING")
    words = bloom_build(members, **kw)
    model = _model_words(member_keys, **kw)
    got_words = {r["word"]: r["wval"] for r in words.collect()}
    assert got_words == model

    probes = spark.createDataFrame([(k,) for k in probe_keys], "h STRING")
    got = {
        r["h"]: r["bloom_maybe"]
        for r in bloom_probe(probes, words, **kw).collect()
    }
    member_set = set(member_keys)
    n_fp = 0
    for k in probe_keys:
        assert got[k] == _model_maybe(k, model, **kw), k
        if k in member_set:
            assert got[k], f"false negative for member {k}"
        elif got[k]:
            n_fp += 1
    # 400 keys * 3 bits into 65536 positions: fill ~1.8%, so expected FP
    # rate ~(0.018)^3 ≈ 6e-6 — with 300 non-member probes, false
    # positives should essentially never occur (vs 75 at m=512/sf0.01);
    # this pins that the widened space actually spreads the bits
    assert n_fp <= 1, f"{n_fp} false positives at 1.8% fill"


def test_position_family_grid_matches_model(spark):
    """Grid sweep over the (nibbles, m_bits, offsets) family — every
    valid configuration's Spark positions must equal the Python model
    bit-for-bit (the widened-window generalization holds across widths,
    not just the two widths the dedicated tests use)."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.operators.bloom import bloom_positions_expr

    keys = _md5s(0, 40)
    df = spark.createDataFrame([(k,) for k in keys], "h STRING")
    grid = [
        (1, 16, (1, 16, 32)),
        (2, 256, (1, 9, 17)),
        (3, 512, (1, 9, 17)),
        (4, 4096, (1, 9, 29)),       # windows touch the digest end
        (5, 2 ** 16, (2, 12, 28)),
        (6, 2 ** 20, (1, 9, 17)),
        (8, 2 ** 24, (1, 9, 25)),    # m smaller than the space
        (15, 2 ** 32, (1, 18, 18)),  # overlapping windows are legal
    ]
    for nibbles, m_bits, offsets in grid:
        got = {
            r["h"]: list(r["p"])
            for r in df.select(
                "h",
                F.expr(bloom_positions_expr("h", m_bits, offsets, nibbles)).alias("p"),
            ).collect()
        }
        for k in keys:
            want = _positions(k, m_bits, offsets, nibbles)
            assert got[k] == want, (nibbles, m_bits, offsets, k)


def test_widened_family_partition_invariance(spark):
    kw = dict(m_bits=2 ** 20, offsets=(2, 12, 22), nibbles=6)
    keys = _md5s(0, 150)
    df1 = spark.createDataFrame([(k,) for k in keys], "h STRING").coalesce(1)
    df11 = spark.createDataFrame([(k,) for k in keys], "h STRING").repartition(11)
    w1 = {(r["word"], r["wval"]) for r in bloom_build(df1, **kw).collect()}
    w11 = {(r["word"], r["wval"]) for r in bloom_build(df11, **kw).collect()}
    assert w1 == w11
    assert w1 == set(_model_words(keys, **kw).items())
