"""Native vs Arrow multilocation-codec cross-check.

plans/xcmgar.py carries TWO forms of the interior-key codec: the total
Arrow form (_loc_info, json.loads + interior_key per row) and the r7
native pure-column form (native_loc_cols — zero Python, zero extra
Exchange). The native form's contract: IDENTICAL output on its
documented scope (scalar-junction multilocations — everything the gar
parsers emit) and NULL key outside it. These tests pin both halves of
that contract; if the native form ever silently diverges from the
Python semantics, the gar registry hashes would move — this catches it
at the operator level first.
"""

from __future__ import annotations

from pyspark.sql import functions as F


ZOO = [
    # (multilocation, relay) — the scalar-junction zoo: every shape the
    # gar parsers emit plus the edge cases the Python codec defines
    ('{"parents":1,"interior":{"X2":[{"Parachain":2600},{"GeneralIndex":5}]}}', "polkadot"),
    ('{"parents":1,"interior":{"X1":{"Parachain":2600}}}', "kusama"),
    # V1 X1-as-array + whitespace (manual-registration literals)
    ('{"parents": 1, "interior": {"X1": [{"Parachain": 2007}]}}', "kusama"),
    ('{"parents":0,"interior":{"Here":null}}', "polkadot"),
    ('{"parents":0,"interior":{"here":null}}', None),  # null relay -> polkadot
    ('{"parents":1,"interior":{"X3":[{"Parachain":1000},{"PalletInstance":50},{"GeneralIndex":1984}]}}', "polkadot"),
    # mixed-case variant + junction names; string-valued generalKey
    ('{"parents":1,"interior":{"x2":[{"PARACHAIN":2000},{"GeneralKey":"0x0001"}]}}', "polkadot"),
    ('{"parents":1,"interior":{"X2":[{"Parachain":2000},{"OnlyChild":null}]}}', "polkadot"),
    ('{"parents":1}', "polkadot"),                 # no interior -> '~here'
    ('{"parents":1,"interior":{}}', "polkadot"),   # empty interior -> '~here'
    ('not json', "polkadot"),                      # invalid -> null
    ('{"parents":1,"interior":{"X1":{"Bogus":1}}}', "polkadot"),  # unknown -> null
    ('{"parents":1,"interior":{"X1":{"GeneralKey":"0x00abCDef"}}}', ""),  # '' relay
    ('[1,2]', "polkadot"),                         # non-object root -> null
    ('{"parents":1,"interior":{"X0":[]}}', "polkadot"),  # X0 -> '~[]'
    # variant/junction-count mismatch: neither codec validates arity
    ('{"parents":1,"interior":{"X2":[{"Parachain":2000}]}}', "polkadot"),
    (None, "polkadot"),
]

OUT_OF_SCOPE = [
    # object-valued junction: the Arrow codec canonicalizes the nested
    # dict with sorted keys; the native form must refuse (NULL key),
    # never emit an unsorted approximation
    ('{"parents":1,"interior":{"X1":{"AccountId32":{"network":"Any","key":"0xab"}}}}', "polkadot"),
]


def _both(spark, rows):
    from polkadot_etl_spark.plans.xcmgar import _loc_info, native_loc_cols

    df = spark.createDataFrame(rows, "multilocation string, relay_chain string")
    nat = {
        r.multilocation: (r.xcm_interior_key, r.origin_para_id, r.n_junctions)
        for r in native_loc_cols(df).collect()
    }
    arrow = {
        r.multilocation: (r.a.xcm_interior_key, r.a.origin_para_id, r.a.n_junctions)
        for r in df.select(
            "multilocation",
            _loc_info(F.col("multilocation"), F.col("relay_chain")).alias("a"),
        ).collect()
    }
    return nat, arrow


def test_native_codec_matches_arrow_on_scalar_zoo(spark):
    nat, arrow = _both(spark, ZOO)
    for ml, _ in ZOO:
        assert nat[ml] == arrow[ml], f"native/arrow diverge on {ml!r}: {nat[ml]} vs {arrow[ml]}"


def test_native_codec_refuses_object_valued_junctions(spark):
    nat, arrow = _both(spark, OUT_OF_SCOPE)
    (ml, _), = OUT_OF_SCOPE
    assert arrow[ml][0] == 'polkadot~[{"accountId32":{"key":"0xab","network":"Any"}}]'
    assert nat[ml] == (None, None, None), (
        "out-of-scope junction must NULL, not approximate: " + str(nat[ml])
    )


def test_registry_identical_under_both_codecs(spark):
    """build_xcm_asset_registry(codec='native') must produce exactly the
    rows of the default Arrow form on a parser-shaped registration set
    — the operator-level guarantee behind the gar queries' unchanged
    hashes."""
    from polkadot_etl_spark.plans.xcmgar import build_xcm_asset_registry

    regs = spark.createDataFrame(
        [
            ("polkadot", 2004, "42", "xcDOT", "dot", 10,
             '{"parents":0,"interior":{"Here":null}}', None, "onchain"),
            ("polkadot", 0, "0", "DOT", "dot", 10,
             '{"parents":0,"interior":{"here":null}}', None, "native"),
            ("polkadot", 1000, "1984", "USDT", "tether", 6,
             '{"parents":1,"interior":{"X3":[{"Parachain":1000},{"PalletInstance":50},{"GeneralIndex":1984}]}}',
             None, "onchain"),
            ("polkadot", 2034, "5", "xcUSDT", "tether", 6,
             '{"parents":1,"interior":{"X3":[{"Parachain":1000},{"PalletInstance":50},{"GeneralIndex":1984}]}}',
             None, "onchain"),
            ("kusama", 2007, "SDN", "SDN", "shiden", 18,
             '{"parents": 1, "interior": {"X1": [{"Parachain": 2007}]}}', None, "manual"),
        ],
        "relay_chain string, para_id int, currency_id string, symbol string,"
        " name string, decimals int, multilocation string,"
        " xc_contract_address string, source string",
    )
    a = sorted(map(tuple, build_xcm_asset_registry(regs, codec="arrow").collect()))
    n = sorted(map(tuple, build_xcm_asset_registry(regs, codec="native").collect()))
    assert a == n
    assert len(a) == 3  # DOT(here) canonical para 0, USDT conf 2, SDN


def test_native_codec_rejects_reserved_output_columns(spark):
    """A caller DataFrame already carrying a codec output column would
    silently produce duplicate/ambiguous columns after the explode —
    native_loc_cols must refuse (same contract as bloom_probe)."""
    import pytest

    from polkadot_etl_spark.plans.xcmgar import native_loc_cols

    for clash in ("__nloc", "xcm_interior_key", "origin_para_id", "n_junctions"):
        df = spark.createDataFrame(
            [("{}", "polkadot", 1)],
            f"multilocation string, relay_chain string, `{clash}` int",
        )
        with pytest.raises(ValueError, match=clash):
            native_loc_cols(df)


def test_expr_cache_isolated_per_knob_and_context(spark):
    """r14 (VERDICT #4): corpus-independent expression trees are memoized
    per (SparkContext, site). Two parser instances whose knobs differ
    must NOT share a tree; the same site must hit the cache (same Column
    object) on re-entry; and plans built from cached trees must equal
    freshly-built ones."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.plans import garparsers as gp

    entries = spark.createDataFrame(
        [('["7"]', '{"symbol":"xcFOO","name":"Foo","decimals":7}')],
        "key_args string, value string",
    )
    gar = gp.GarParser().parse_gar(entries)
    loc = spark.createDataFrame(
        [(7, '{"parents":1,"interior":{"X1":{"Parachain":7}}}')],
        "asset_id long, multilocation string",
    )
    # strip vs no-strip parsers share gated_dim but not gated_out
    stripped = gp.ShadowGarParser()._gated_registrations(loc, gar, "onchain")
    plain = gp.CalamariGarParser()._gated_registrations(loc, gar, "onchain")
    assert stripped.collect()[0]["symbol"] == "FOO"  # ^xc stripped
    assert plain.collect()[0]["symbol"] == "xcFOO"  # kept verbatim
    # cache hit: same site returns the SAME Column objects
    c1 = gp._expr_cache(("parse_gar", gp.GarParser), lambda: None)
    c2 = gp._expr_cache(("parse_gar", gp.GarParser), lambda: None)
    assert c1 is not None and c1 is c2
    # cached-vs-fresh plan equality: a fresh uncached build of the same
    # select yields the same analyzed plan
    fresh = entries.select(
        gp._cleaned_asset_id(F.get_json_object("key_args", "$[0]")).alias(
            "asset_id"
        )
    )
    cached = gp.GarParser().parse_gar(entries).select("asset_id")
    assert [r["asset_id"] for r in cached.collect()] == [
        r["asset_id"] for r in fresh.collect()
    ]
