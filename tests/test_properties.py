"""Property-based tests (hypothesis) for the pure scalar layer — the
codecs must round-trip on arbitrary inputs, not just the fixture vectors.
No SparkSession involved: these run in milliseconds."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from polkadot_etl_spark.functions import scalars as sc
from polkadot_etl_spark.functions.evm import (
    _sponge_256,
    keccak256,
    rlp_decode,
    rlp_encode,
)
from polkadot_etl_spark.functions.multilocation import (
    interior_key,
    multilocation_from_interior_key,
)

# ---------------------------------------------------------------------------
# ss58
# ---------------------------------------------------------------------------


@given(pk=st.binary(min_size=32, max_size=32), prefix=st.integers(0, 16383))
@settings(max_examples=200, deadline=None)
def test_ss58_roundtrip_any_pubkey_any_prefix(pk, prefix):
    addr = sc.get_address("0x" + pk.hex(), prefix)
    assert sc.get_pubkey(addr) == "0x" + pk.hex()
    assert sc.ss58_prefix_of(addr) == prefix
    assert sc.valid_address(addr)


# ---------------------------------------------------------------------------
# keccak sponge ≡ FIPS-202 permutation (pad 0x06 ↔ hashlib.sha3_256)
# ---------------------------------------------------------------------------


@given(data=st.binary(max_size=600))
@settings(max_examples=200, deadline=None)
def test_sponge_equals_sha3_on_arbitrary_bytes(data):
    assert _sponge_256(data, 0x06) == hashlib.sha3_256(data).digest()


@given(data=st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_keccak_is_32_bytes_and_stable(data):
    d1, d2 = keccak256(data), keccak256(bytes(data))
    assert d1 == d2 and len(d1) == 32


# ---------------------------------------------------------------------------
# RLP
# ---------------------------------------------------------------------------

rlp_items = st.recursive(
    st.binary(max_size=70),
    lambda children: st.lists(children, max_size=6),
    max_leaves=25,
)


@given(item=rlp_items)
@settings(max_examples=200, deadline=None)
def test_rlp_roundtrip_arbitrary_nesting(item):
    assert rlp_decode(rlp_encode(item)) == item


# ---------------------------------------------------------------------------
# numeric codecs
# ---------------------------------------------------------------------------


@given(n=st.integers(0, 2**128 - 1))
@settings(max_examples=200, deadline=None)
def test_dechex_exact_u128(n):
    assert sc.dechex_to_int_str(hex(n)) == str(n)


@given(ts=st.integers(0, 99_999_999_998))
@settings(max_examples=100, deadline=None)
def test_inverted_ts_key_is_order_reversing(ts):
    assert sc.inverted_ts_key(ts + 1) < sc.inverted_ts_key(ts)


def test_inverted_ts_key_rejects_out_of_domain():
    """Found by hypothesis: beyond the fixed-width domain the key went
    negative and ordered wrong — now an explicit error."""
    import pytest

    with pytest.raises(ValueError):
        sc.inverted_ts_key(10**11)
    with pytest.raises(ValueError):
        sc.inverted_ts_key(-1)


# ---------------------------------------------------------------------------
# multilocation interior keys
# ---------------------------------------------------------------------------

_junctions = st.one_of(
    st.fixed_dictionaries({"parachain": st.integers(0, 4095)}),
    st.fixed_dictionaries({"generalIndex": st.integers(0, 10**6)}),
    st.fixed_dictionaries(
        {"generalKey": st.binary(min_size=1, max_size=8).map(lambda b: "0x" + b.hex())}
    ),
    st.fixed_dictionaries({"palletInstance": st.integers(0, 255)}),
)


@given(js=st.lists(_junctions, min_size=1, max_size=4), relay=st.sampled_from(["polkadot", "kusama"]))
@settings(max_examples=200, deadline=None)
def test_interior_key_roundtrip_arbitrary_junctions(js, relay):
    ml = {"parents": 1, "interior": {"X1": js[0]} if len(js) == 1 else {f"X{len(js)}": js}}
    key = interior_key(ml, relay)
    r2, ml2 = multilocation_from_interior_key(key)
    assert r2 == relay
    assert interior_key(ml2, relay) == key  # canonical fixed point


# ---------------------------------------------------------------------------
# multisig / sovereign / base58 / evm tx properties
# ---------------------------------------------------------------------------


@given(data=st.binary(max_size=80))
@settings(max_examples=200, deadline=None)
def test_b58_roundtrip(data):
    assert sc.b58decode(sc.b58encode(data)) == data


@given(
    pks=st.lists(st.binary(min_size=32, max_size=32), min_size=1, max_size=5, unique=True),
    threshold=st.integers(1, 5),
)
@settings(max_examples=100, deadline=None)
def test_multisig_order_insensitive(pks, threshold):
    """Any permutation of signatories yields the same multisig account."""
    hexes = ["0x" + p.hex() for p in pks]
    base = sc.compute_multisig(hexes, threshold)
    assert sc.compute_multisig(list(reversed(hexes)), threshold) == base
    assert base.startswith("0x") and len(base) == 66


@given(nonce=st.integers(0, 2**32 - 1), value=st.integers(0, 2**128), gas=st.integers(21000, 2**32))
@settings(max_examples=100, deadline=None)
def test_evm_tx_decode_roundtrip_fields(nonce, value, gas):
    from polkadot_etl_spark.functions.evm import decode_rlp_transaction, rlp_encode

    def be(n):
        return n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""

    tx = rlp_encode([be(nonce), be(10**9), be(gas), bytes.fromhex("ab" * 20),
                     be(value), b"\x01\x02\x03\x04\x05", b"\x25", b"\x11" * 32, b"\x22" * 32])
    d = decode_rlp_transaction(tx)
    assert d["nonce"] == nonce and d["gas"] == gas
    assert d["value"] == str(value)  # exact u256 round-trip as string
    assert d["selector"] == "0x01020304"


@given(raw=st.integers(0, 2**63 - 1), decimals=st.integers(0, 18))
@settings(max_examples=100, deadline=None)
def test_base_unit_scaling_consistent(raw, decimals):
    """to_base_unit inverts float_to_raw up to float precision."""
    amount = sc.to_base_unit(raw, decimals)
    back = sc.float_to_raw(amount, decimals)
    # float64 has 53 bits of mantissa; the round-trip is exact when raw
    # fits, and within 1 ulp of the scale otherwise
    assert abs(back - raw) <= max(1, raw // (1 << 52))


@given(period=st.sampled_from([4, 8, 16, 32, 64, 128, 256]), phase=st.integers(0, 255),
       current=st.integers(0, 10**7))
@settings(max_examples=100, deadline=None)
def test_lifetime_birth_not_after_current(period, phase, current):
    from hypothesis import assume

    phase = phase % period
    # a mortal extrinsic can't be observed before its own phase block —
    # current < phase is unreachable on a live chain
    assume(current >= phase)
    birth, death = sc.lifetime_birth_death(period, phase, current)
    assert birth <= current
    assert current < death  # still alive at the observation block
    assert death == birth + period
    assert birth % period == phase


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=24))
@settings(max_examples=200, deadline=None)
def test_bpe_encode_invariants(word):
    """BPE apply on arbitrary words: tokens concatenate back to the word
    (no characters created or destroyed), every token is either a single
    char or the product of a listed merge, and the fixpoint really is a
    fixpoint (no listed pair remains adjacent)."""
    from polkadot_etl_spark.queries.corpus_ext import _BPE_MERGES, bpe_encode_word

    merges = sorted(_BPE_MERGES)
    toks = bpe_encode_word(word, merges).split(" ")
    assert "".join(toks) == word
    products = {a + b for _, a, b in merges}
    assert all(len(t) == 1 or t in products for t in toks)
    s = " " + " ".join(toks) + " "
    assert not any(f" {a} {b} " in s for _, a, b in merges)


@given(
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=1, max_value=4),
    st.sampled_from([8, 16]),
    st.integers(min_value=1, max_value=192000),
)
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_any_shape(n_frames, n_ch, bits, rate):
    """encode_wav/decode_wav round-trip for arbitrary frame counts,
    channel counts, both bit widths, and any sample rate; 8-bit input
    restricted to its representable signed range."""
    import numpy as np

    from polkadot_etl_spark.multimodal.codecs import decode_wav, encode_wav

    rng = np.random.RandomState(n_frames * 31 + n_ch * 7 + bits + rate % 97)
    lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
    x = rng.randint(lo, hi, size=(n_frames, n_ch)).astype(np.int16)
    dec, got_rate = decode_wav(encode_wav(x, rate, bits=bits))
    assert got_rate == rate
    assert dec.shape == (n_frames, n_ch)
    assert (dec == x).all()


@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.integers(min_value=-(2**62), max_value=2**62).filter(lambda b: b != 0),
)
@settings(max_examples=300, deadline=None)
def test_trunc_div_matches_duckdb_integer_division(a, b):
    """_trunc_div (the Spark `div` model used by the power iteration's
    driver loop) must agree with DuckDB's `//` on every sign
    combination — the load-bearing parity behind bm25's idf, RM3's
    weights and embedding_top_pc_power's renormalization (verified
    empirically for -7//2 = -3; this pins the full contract)."""
    import duckdb

    from polkadot_etl_spark.queries.corpus_ext import _trunc_div

    got = _trunc_div(a, b)
    want = duckdb.sql(f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)").fetchone()[0]
    assert got == want, (a, b, got, want)
    # and the definition itself: truncation toward zero
    q = abs(a) // abs(b)
    assert abs(got) == q and (got == 0 or (got > 0) == ((a > 0) == (b > 0)))


@given(st.floats(min_value=0.05, max_value=0.95), st.integers(min_value=1, max_value=16))
@settings(max_examples=200, deadline=None)
def test_plan_bands_total_and_within_budget(threshold, n_hashes):
    """plan_bands returns a valid (b, r) for every (threshold, budget):
    b*r <= n_hashes, both >= 1, and the pick is deterministic (same
    inputs -> same plan) after the r9 lazy-tie refactor."""
    from polkadot_etl_spark.operators.lsh_planner import plan_bands

    b, r = plan_bands(threshold, n_hashes)
    assert b >= 1 and r >= 1 and b * r <= n_hashes
    assert (b, r) == plan_bands(threshold, n_hashes)
