

def test_multilocation_derivative_reference_vector():
    """The XCM DescendOrigin derivative account must reproduce the
    reference's inline vector (xcmtransact.js:1222-1224)."""
    from polkadot_etl_spark.plans.xcmtransact import multilocation_derivative

    d20, d32 = multilocation_derivative(
        1000, "0x44236223ab4291b93eed10e4b511b37a398dee55"
    )
    assert d20 == "0x5c27c4bb7047083420eddff9cddac4a0a120b45c"
    assert d32 == (
        "0x5c27c4bb7047083420eddff9cddac4a0a120b45c"
        "dfa7831175e442b8f14391aa"
    )
    # 32-byte (AccountId32) payloads take the AccountId32 arm
    d20b, _ = multilocation_derivative(1000, "0x" + "11" * 32)
    assert d20b.startswith("0x") and len(d20b) == 42


def test_pubkey_ascii_name_vectors(spark):
    """paraTool.pubKeyHex2ASCII parity: prefix gate, zero-strip, the
    little-endian ':<id>' tail, and NULL for ordinary pubkeys."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.plans.snapshots import pubkey_ascii_name

    rows = [
        ("0x70617261d4070000000000000000000000000000000000000000000000000000", "para:2004"),
        ("0x6d6f646c70792f747273727900000000000000000000000000000000000000", "modlpy/trsry"),
        ("0x7369626ce803000000000000000000000000000000000000000000000000", "sibl:1000"),
        ("0xc30aa287059cd2bdd121662e18c200b4698ff6fa452b79f70ac63a40a3a690ee", None),
        ("0x706172", None),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], "pk string")
    got = [r.n for r in df.select(pubkey_ascii_name(F.col("pk")).alias("n")).collect()]
    assert got == [e for _, e in rows]
