

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
