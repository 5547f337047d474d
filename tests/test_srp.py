"""operators/srp.py — the packed sign sketch and its Hamming distance
must match the pure-Python reference model exactly (every bit, every
word), and the construction must reject ragged configurations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polkadot_etl_spark.operators.srp import (
    DEFAULT_QUANT,
    model_hamming,
    model_words,
    srp_hamming_expr,
    srp_signs,
    srp_words_expr,
)


def _vectors(n: int, dims: int) -> list[list[float]]:
    # deterministic floats with negatives, fractions and exact zeros —
    # the sign-boundary cases floor-quantization must handle
    return [
        [((i * 31 + j * 17) % 41 - 20) / 7.0 for j in range(dims)]
        for i in range(n)
    ]


def test_words_match_python_model_exactly(spark):
    signs = srp_signs(64, 16, "test-salt")
    vecs = _vectors(40, 16)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vid INT, embedding ARRAY<DOUBLE>"
    )
    got = {
        r["vid"]: list(r["ws"])
        for r in df.select(
            "vid", F.expr(srp_words_expr("embedding", signs)).alias("ws")
        ).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == model_words(v, signs), f"vector {i}"


def test_hamming_matches_model_and_is_symmetric(spark):
    signs = srp_signs(96, 8, "hamm")
    vecs = _vectors(12, 8)
    words = [model_words(v, signs) for v in vecs]
    rows = [
        (i, j, words[i], words[j])
        for i in range(len(vecs))
        for j in range(len(vecs))
    ]
    df = spark.createDataFrame(
        rows, "i INT, j INT, a ARRAY<BIGINT>, b ARRAY<BIGINT>"
    )
    got = {
        (r["i"], r["j"]): r["h"]
        for r in df.select(
            "i", "j", F.expr(srp_hamming_expr("a", "b")).alias("h")
        ).collect()
    }
    for i in range(len(vecs)):
        for j in range(len(vecs)):
            assert got[(i, j)] == model_hamming(words[i], words[j])
            assert got[(i, j)] == got[(j, i)]
        assert got[(i, i)] == 0


def test_sign_boundary_is_exact_integer_decision(spark):
    """A dot of exactly 0 must set the bit (>= 0) in BOTH the model and
    the engine — the case float arithmetic would make engine-dependent
    and integer quantization pins."""
    signs = [[1, -1]] * 32  # one word; every plane the same hyperplane
    # x = (q, q) -> quantized dot = q*1 + q*(-1) = 0 exactly
    df = spark.createDataFrame([(1, [0.25, 0.25])], "vid INT, embedding ARRAY<DOUBLE>")
    got = df.select(F.expr(srp_words_expr("embedding", signs)).alias("ws")).head()["ws"]
    assert list(got) == [0xFFFFFFFF]
    assert model_words([0.25, 0.25], signs) == [0xFFFFFFFF]


def test_quant_changes_bits_only_through_the_model(spark):
    signs = srp_signs(32, 8, "q")
    v = _vectors(1, 8)[0]
    for quant in (10, DEFAULT_QUANT):
        df = spark.createDataFrame([(1, v)], "vid INT, embedding ARRAY<DOUBLE>")
        got = df.select(
            F.expr(srp_words_expr("embedding", signs, quant)).alias("ws")
        ).head()["ws"]
        assert list(got) == model_words(v, signs, quant)


def test_production_and_boundary_configs_match_model(spark):
    """The registry's production config (256 planes x 64 dims) and the
    md5 boundary (128 dims — one digest's full sign capacity) both
    match the model; extra dims beyond the plane width are ignored by
    the slice (a 96-dim embedding under 64-dim planes)."""
    for n_planes, dims, n_vec_dims in [(256, 64, 64), (32, 128, 128), (64, 64, 96)]:
        signs = srp_signs(n_planes, dims, "bound")
        vecs = _vectors(6, n_vec_dims)
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "vid INT, embedding ARRAY<DOUBLE>"
        )
        got = {
            r["vid"]: list(r["ws"])
            for r in df.select(
                "vid", F.expr(srp_words_expr("embedding", signs)).alias("ws")
            ).collect()
        }
        for i, v in enumerate(vecs):
            assert got[i] == model_words(v, signs), (n_planes, dims, i)


def test_config_validation():
    with pytest.raises(ValueError, match="multiple of 32"):
        srp_signs(100, 64)
    with pytest.raises(ValueError, match="sign bits"):
        srp_signs(64, 129)
    # deterministic: same salt -> same matrix; different salt -> different
    assert srp_signs(32, 8, "a") == srp_signs(32, 8, "a")
    assert srp_signs(32, 8, "a") != srp_signs(32, 8, "b")
