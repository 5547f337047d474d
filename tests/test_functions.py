"""Scalar-zoo correctness: public test vectors + round-trips, plus
Arrow-UDF integration on a DataFrame."""

from __future__ import annotations

import pytest

from polkadot_etl_spark.functions import scalars as sc

ALICE_PK = "0xd43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d"
ALICE_GENERIC = "5GrwvaEF5zXb26Fz9rcQpDWS57CtERHpNehXCPcNoHGKutQY"  # prefix 42


class TestSS58:
    def test_known_vector_alice(self):
        assert sc.get_address(ALICE_PK, 42) == ALICE_GENERIC
        assert sc.get_pubkey(ALICE_GENERIC) == ALICE_PK

    @pytest.mark.parametrize("prefix", [0, 2, 42, 137, 2004, 8888])
    def test_roundtrip_prefixes(self, prefix):
        pk = "0x" + "ab" * 32
        addr = sc.get_address(pk, prefix)
        assert sc.get_pubkey(addr) == pk
        assert sc.ss58_prefix_of(addr) == prefix

    def test_checksum_rejected(self):
        bad = ALICE_GENERIC[:-1] + ("R" if ALICE_GENERIC[-1] != "R" else "S")
        assert not sc.valid_address(bad)
        assert sc.valid_address(ALICE_GENERIC)


class TestHashing:
    def test_xxhash64_empty(self):
        assert sc.xxhash64(b"") == 0xEF46DB3751D8E999  # canonical xxh64 vector

    def test_twox128_substrate_prefixes(self):
        # The two most famous Substrate storage-key prefixes.
        assert sc.twox_128(b"System") == "26aa394eea5630e07c48ae0c9558cef7"
        assert sc.twox_128(b"Account") == "b99d880ec681799c0cf30e8886371da9"

    def test_blake2_256(self):
        assert (
            sc.blake2_256(b"").hex()
            == "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8"
        )
        assert sc.blake2_256_from_hex("0x00").startswith("0x")


class TestAccounts:
    def test_sovereign_account(self):
        # b'para' ++ u32le(2004) zero-padded — Moonbeam's relay sovereign.
        assert (
            sc.sovereign_account(2004)
            == "0x70617261d4070000000000000000000000000000000000000000000000000000"
        )

    def test_multisig_deterministic_and_order_insensitive(self):
        a, b = "0x" + "11" * 32, "0x" + "22" * 32
        assert sc.compute_multisig([a, b], 2) == sc.compute_multisig([b, a], 2)
        assert sc.compute_multisig([a, b], 2) != sc.compute_multisig([a, b], 1)


class TestNumerics:
    def test_dechex(self):
        assert sc.dechex_to_int("0xff") == 255
        assert sc.dechex_to_int("123") == 123
        # u128-scale value survives exactly (JS reference needs BigInt)
        big = "0x" + "f" * 32
        assert sc.dechex_to_int_str(big) == str(2**128 - 1)

    def test_reverse_endian(self):
        assert sc.reverse_endian("0x0102") == "0x0201"

    def test_base_unit(self):
        assert sc.to_base_unit(1_500_000_000_000, 10) == 150.0
        assert sc.float_to_raw(150.0, 10) == 1_500_000_000_000


class TestLifetime:
    def test_mortal_era(self):
        birth, death = sc.lifetime_birth_death(64, 5, 1000)
        assert birth % 64 == 5 % 64 or birth % 64 == 5
        assert birth <= 1000 < birth + 64 or death == birth + 64
        # immortal-period sanity: birth+period == death always
        assert death - birth == 64


class TestKeys:
    def test_inverted_ts_key_sorts_descending(self):
        k1, k2 = sc.inverted_ts_key(1000), sc.inverted_ts_key(2000)
        assert k2 < k1  # newer ts → lexicographically smaller key

    def test_ts_to_log_dt_hr(self):
        assert sc.ts_to_log_dt_hr(1704067200) == ("2024-01-01", 0)


def test_udfs_on_dataframe(spark):
    """Arrow-batched codec UDFs round-trip on a DataFrame."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.functions.udfs import u_get_address, u_get_pubkey

    df = spark.createDataFrame([(ALICE_PK,), ("0x" + "cd" * 32,)], ["pubkey"])
    out = (
        df.withColumn("ss58", u_get_address(42)(F.col("pubkey")))
        .withColumn("back", u_get_pubkey(F.col("ss58")))
        .collect()
    )
    for row in out:
        assert row.back == row.pubkey
    assert out[0].ss58 == ALICE_GENERIC


# ---------------------------------------------------------------------------
# EVM primitives (F5): keccak-256 / RLP / selectors — public test vectors
# ---------------------------------------------------------------------------


class TestEvmPrimitives:
    def test_keccak_vectors(self):
        from polkadot_etl_spark.functions.evm import keccak256

        assert (
            keccak256(b"").hex()
            == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
        )
        assert (
            keccak256(b"abc").hex()
            == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
        )
        # famous Ethereum constants: empty-trie root, empty-ommers hash
        from polkadot_etl_spark.functions.evm import rlp_encode

        assert (
            keccak256(rlp_encode(b"")).hex()
            == "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421"
        )
        assert (
            keccak256(rlp_encode([])).hex()
            == "1dcc4de8dec75d7aab85b567b6ccd41ad312451b948a7413f0a142fd40d49347"
        )

    def test_sponge_matches_sha3_for_all_block_boundaries(self):
        """Same permutation + absorb loop as FIPS-202: with pad 0x06 the
        sponge must equal hashlib.sha3_256 for every length around the
        136-byte rate boundary (validates multi-block absorb and the
        pad_len==1 edge independently of the keccak vectors)."""
        import hashlib

        from polkadot_etl_spark.functions.evm import _sponge_256

        for n in [0, 1, 134, 135, 136, 137, 200, 271, 272, 273, 500]:
            data = bytes(range(256))[: n % 256] + b"\xab" * max(0, n - 256)
            data = (b"\x5c" * n)[:n] if not data else data[:n]
            assert _sponge_256(data, 0x06) == hashlib.sha3_256(data).digest(), n

    def test_selector_and_topics(self):
        from polkadot_etl_spark.functions.evm import (
            TRANSFER_TOPIC,
            compute_selector,
            event_topic,
        )

        assert compute_selector("transfer(address,uint256)") == "0xa9059cbb"
        assert compute_selector("balanceOf(address)") == "0x70a08231"
        assert TRANSFER_TOPIC == (
            "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
        )
        assert event_topic("Transfer(address,address,uint256)") == TRANSFER_TOPIC

    def test_rlp_roundtrip_and_tx_decode(self):
        from polkadot_etl_spark.functions.evm import (
            decode_rlp_transaction,
            rlp_decode,
            rlp_encode,
        )

        for item in [b"", b"\x01", b"dog", [b"cat", b"dog"], [b"", [b"a", [b"bb"]]], b"x" * 60]:
            assert rlp_decode(rlp_encode(item)) == item
        assert rlp_encode(b"dog").hex() == "83646f67"
        tx = rlp_encode(
            [
                b"\x09",
                (20 * 10**9).to_bytes(5, "big"),
                (21000).to_bytes(3, "big"),
                bytes.fromhex("35" * 20),
                (10**18).to_bytes(8, "big"),
                b"",
                b"\x25",
                bytes.fromhex("11" * 32),
                bytes.fromhex("22" * 32),
            ]
        )
        d = decode_rlp_transaction(tx)
        assert d["nonce"] == 9 and d["gas"] == 21000
        assert d["chain_id"] == 1  # EIP-155: v=0x25 → chain 1
        assert d["value"] == str(10**18)  # exact u256 as string

    def test_classify_log_column(self, spark):
        from polkadot_etl_spark.functions.evm import TRANSFER_TOPIC, classify_evm_log_col

        df = spark.createDataFrame(
            [
                ([TRANSFER_TOPIC, "0x1", "0x2"],),
                ([TRANSFER_TOPIC, "0x1", "0x2", "0x3"],),
                (["0xdead"],),
            ],
            "topics: array<string>",
        )
        got = [r[0] for r in df.select(classify_evm_log_col("topics".__str__() and df.topics)).collect()]
        assert got == ["erc20_transfer", "erc721_transfer", None]


class TestAbiDecode:
    """ABI parameter decode (F5 full): selector constants must equal the
    reference's published literals (ethTool.js:241-312) and the column
    decoders must invert a known-good encode."""

    def test_selector_constants_match_reference_literals(self):
        from polkadot_etl_spark.functions.evm import (
            ERC20_SELECTORS,
            ERC721_SELECTORS,
            ERC1155_SELECTORS,
            SWAP_V2_TOPIC,
        )

        assert ERC20_SELECTORS == {
            "transfer": "0xa9059cbb",
            "transferFrom": "0x23b872dd",
            "approve": "0x095ea7b3",
        }
        assert ERC721_SELECTORS["safeTransferFrom"] == "0x42842e0e"
        assert ERC721_SELECTORS["safeTransferFromData"] == "0xb88d4fde"
        assert ERC1155_SELECTORS["safeTransferFrom"] == "0xf242432a"
        assert ERC1155_SELECTORS["safeBatchTransferFrom"] == "0x2eb2c2d6"
        # UniswapV2 Swap topic, public constant
        assert SWAP_V2_TOPIC == (
            "0xd78ad95fa46c994b6551d0da85fc275fe613ce37657fb8d5e3d130840159d822"
        )

    @staticmethod
    def _w(value: int) -> str:
        return f"{value:064x}"

    def test_calldata_decode_vectors(self, spark):
        from polkadot_etl_spark.functions.evm import decode_token_calldata

        to = 0x5AAEB6053F3E94C9B9A09F33669435E7EF1BEAED
        frm = 0xDEADBEEF
        big = 123456789012345678901234567890  # > 2^63, < 1e38: exact decimal
        rows = [
            ("t20", "0xa9059cbb" + self._w(to) + self._w(10**6)),
            ("tf20", "0x23b872dd" + self._w(frm) + self._w(to) + self._w(big)),
            ("t721", "0x42842e0e" + self._w(frm) + self._w(to) + self._w(77)),
            ("t1155", "0xf242432a" + self._w(frm) + self._w(to) + self._w(5) + self._w(900)),
            ("junk", "0xdeadbeef" + self._w(1)),
        ]
        df = spark.createDataFrame(rows, "k: string, data: string")
        got = {
            r.k: r
            for r in df.select("k", decode_token_calldata(df.data).alias("d")).select("k", "d.*").collect()
        }
        assert got["t20"].method == "transfer" and got["t20"].standard == "erc20"
        assert got["t20"].to_addr == "0x" + f"{to:040x}"
        assert int(got["t20"].amount_raw) == 10**6
        assert got["tf20"].from_addr == "0x" + f"{frm:040x}"
        assert int(got["tf20"].amount_raw) == big  # exact above 2^63
        assert got["t721"].standard == "erc721" and int(got["t721"].token_id) == 77
        assert got["t1155"].standard == "erc1155"
        assert int(got["t1155"].token_id) == 5 and int(got["t1155"].amount_raw) == 900
        assert got["junk"].method is None

    def test_log_decode_vectors(self, spark):
        from polkadot_etl_spark.functions.evm import (
            SWAP_V2_TOPIC,
            SWAP_V3_TOPIC,
            TRANSFER_TOPIC,
            decode_transfer_log,
        )

        pad = lambda a: "0x" + f"{a:064x}"  # noqa: E731
        w = self._w
        rows = [
            ("erc20", [TRANSFER_TOPIC, pad(0xA1), pad(0xB2)], "0x" + w(500)),
            ("erc721", [TRANSFER_TOPIC, pad(0xA1), pad(0xB2), pad(42)], "0x"),
            (
                "univ2",
                [SWAP_V2_TOPIC, pad(0xA1), pad(0xB2)],
                "0x" + w(11) + w(0) + w(0) + w(33),
            ),
            (
                "univ3",
                [SWAP_V3_TOPIC, pad(0xA1), pad(0xB2)],
                # amount0 = -7 (two's complement), amount1 = +9
                "0x" + f"{(1 << 256) - 7:064x}" + w(9),
            ),
        ]
        df = spark.createDataFrame(rows, "k: string, topics: array<string>, data: string")
        got = {
            r.k: r
            for r in df.select("k", decode_transfer_log(df.topics, df.data).alias("d"))
            .select("k", "d.*")
            .collect()
        }
        assert got["erc20"].kind == "erc20_transfer" and int(got["erc20"].amount_raw) == 500
        assert got["erc20"].from_addr == "0x" + f"{0xA1:040x}"
        assert got["erc721"].kind == "erc721_transfer" and int(got["erc721"].token_id) == 42
        assert got["univ2"].kind == "univ2_swap"
        assert (got["univ2"].amount0_in, got["univ2"].amount1_out) == (11.0, 33.0)
        assert got["univ3"].amount0_in == -7.0 and got["univ3"].amount1_in == 9.0

    def test_decorate_txn_fee_math(self, spark):
        """decorateTxn economics (ethTool.js:841-918): legacy fee =
        gasUsed·gasPrice; 1559 burned = gasUsed·effectiveGasPrice with the
        published baseFee re-derived from gasPrice − maxPriorityFee."""
        from polkadot_etl_spark.functions.evm import decorate_txn

        tx_schema = (
            "hash: string, block_hash: string, block_number: long, "
            "transaction_index: int, from_addr: string, to_addr: string, "
            "chain_id: long, nonce: long, tx_type: int, value: double, "
            "gas: long, gas_price: long, max_fee_per_gas: long, "
            "max_priority_fee_per_gas: long, input: string"
        )
        gwei = 10**9
        txns = spark.createDataFrame(
            [
                ("0x1", "0xb", 1, 0, "0xa", "0xb", 1284, 0, 0, float(10**18),
                 21000, 50 * gwei, None, None, "0x"),
                ("0x2", "0xb", 1, 1, "0xa", "0xc", 1284, 1, 2, 0.0,
                 100000, 60 * gwei, 80 * gwei, 2 * gwei, "0xa9059cbb" + "00" * 64),
            ],
            tx_schema,
        )
        receipts = spark.createDataFrame(
            [
                ("0x1", 1, 21000, 21000, 50 * gwei, None),
                ("0x2", 1, 90000, 111000, 58 * gwei, None),
            ],
            "hash: string, status: int, gas_used: long, cumulative_gas_used: long, "
            "effective_gas_price: long, contract_address: string",
        )
        got = {r.transaction_hash: r for r in decorate_txn(txns, receipts).collect()}
        legacy = got["0x1"]
        assert legacy.fee == pytest.approx(21000 * 50 * gwei / 1e18)
        assert legacy.burned_fee == 0.0  # no 1559 fields → baseFee0 = 0
        assert legacy.base_fee_per_gas == pytest.approx(50.0)  # gasPrice − 0 prio
        e1559 = got["0x2"]
        assert e1559.fee == pytest.approx(90000 * 60 * gwei / 1e18)
        assert e1559.burned_fee == pytest.approx(90000 * 58 * gwei / 1e18)
        assert e1559.txn_saving == pytest.approx((80 - 58) * gwei * 90000 / 1e18)
        # gasPrice (60) >= baseFee0 (58) → published baseFee = 60 − 2 = 58
        assert e1559.base_fee_per_gas == pytest.approx(58.0)
        assert e1559.selector == "0xa9059cbb"


class TestMultilocation:
    def test_interior_key_roundtrip(self):
        from polkadot_etl_spark.functions.multilocation import (
            interior_key,
            multilocation_from_interior_key,
            para_id_of,
        )

        here = {"parents": 0, "interior": {"Here": None}}
        assert interior_key(here, "polkadot") == "polkadot~here"
        _, back = multilocation_from_interior_key("polkadot~here")
        assert back["interior"] == {"Here": None}

        # V1 X1 bare junction and X2 array normalize to the same key style
        x1 = {"parents": 1, "interior": {"X1": {"Parachain": 2000}}}
        k1 = interior_key(x1, "kusama")
        assert k1 == 'kusama~[{"parachain":2000}]'
        x2 = {"parents": 1, "interior": {"X2": [{"Parachain": 2000},
                                                {"GeneralKey": "0x0001"}]}}
        k2 = interior_key(x2)
        assert k2 == 'polkadot~[{"parachain":2000},{"generalKey":"0x0001"}]'
        relay, ml = multilocation_from_interior_key(k2)
        assert relay == "polkadot" and ml["interior"]["X2"][0] == {"parachain": 2000}
        # the key is stable under re-encoding (total canonical form)
        assert interior_key(ml) == k2
        assert para_id_of(x2) == 2000 and para_id_of(here) is None

    def test_unknown_junction_rejected(self):
        import pytest as _pytest

        from polkadot_etl_spark.functions.multilocation import interior_key

        with _pytest.raises(ValueError):
            interior_key({"interior": {"X1": {"Bogus": 1}}})


class TestUniV3Math:
    def test_sqrt_price_identity(self):
        # sqrtPriceX96 = 2^96 → ratio exactly 1.0; same-decimals → price 1
        assert sc.sqrt_price_x96_to_price(1 << 96, 18, 18) == 1.0
        # USDC(6)/WETH(18) style decimal gap
        p = sc.sqrt_price_x96_to_price(1 << 96, 6, 18)
        assert abs(p - 1e-12) < 1e-24

    def test_tick_price(self):
        assert sc.tick_to_price(0, 18, 18) == 1.0
        # tick 6931 ≈ doubling (1.0001^6931 ≈ 2.0000...)
        assert abs(sc.tick_to_price(6931, 18, 18) - 2.0) < 0.001
        # consistency: price(tick) == sqrt_price(sqrt(1.0001^tick)·2^96)
        import math
        t = 1200
        sp = int(math.sqrt(1.0001**t) * (1 << 96))
        assert abs(sc.tick_to_price(t, 8, 8) - sc.sqrt_price_x96_to_price(sp, 8, 8)) < 1e-6


class TestEvmDynamicArrays:
    def test_log_uint_array_batch_vector(self, spark):
        """TransferBatch head-tail layout: heads 0x40/0xa0, length-prefixed
        tails (erc1155 TransferBatch, ethTool.js:314)."""
        from pyspark.sql import functions as F

        from polkadot_etl_spark.functions.evm import log_uint_array

        def w(v):
            return f"{v:064x}"

        big = 2**80 + 7  # needs multi-limb reconstruction
        data = "0x" + w(0x40) + w(0xA0) + w(2) + w(5) + w(big) + w(2) + w(9) + w(10)
        df = spark.createDataFrame([(data,)], "data: string")
        ids = df.select(log_uint_array(F.col("data"), 0).alias("a")).first().a
        vals = df.select(log_uint_array(F.col("data"), 1).alias("a")).first().a
        assert [int(x) for x in ids] == [5, big]
        assert [int(x) for x in vals] == [9, 10]

    def test_log_uint_array_empty_and_short(self, spark):
        """n == 0 must give [], truncated data must give NULL (not an
        ANSI error, not a descending-sequence artifact)."""
        from pyspark.sql import functions as F

        from polkadot_etl_spark.functions.evm import log_uint_array

        def w(v):
            return f"{v:064x}"

        empty = "0x" + w(0x20) + w(0)          # tail with len 0
        short = "0x" + w(0x20) + w(3) + w(1)   # claims 3, carries 1
        df = spark.createDataFrame([(empty, short)], "e: string, s: string")
        row = df.select(
            log_uint_array(F.col("e"), 0).alias("e"),
            log_uint_array(F.col("s"), 0).alias("s"),
        ).first()
        assert row.e == []
        assert row.s is None

    def test_evmtransfers_drops_non_transfers(self, spark):
        """Approval/unknown logs must not produce evmtransfers rows."""
        from pyspark.sql import functions as F

        from polkadot_etl_spark.functions.evm import APPROVAL_TOPIC, TRANSFER_TOPIC
        from polkadot_etl_spark.plans.evm import evmtransfers_table

        pad = "0x" + "0" * 44 + "a" * 20
        logs = spark.createDataFrame(
            [
                ("0xc1", [TRANSFER_TOPIC, pad, pad], "0x" + f"{77:064x}", "0xt1", 0),
                ("0xc1", [APPROVAL_TOPIC, pad, pad], "0x" + f"{88:064x}", "0xt2", 1),
                ("0xc1", ["0x" + "ab" * 32], "0x", "0xt3", 2),
            ],
            "address: string, topics: array<string>, data: string, "
            "transaction_hash: string, log_index: int",
        ).select("*", F.lit(None).cast("timestamp").alias("block_time"),
                 F.lit(1).alias("block_number"), F.lit(None).cast("string").alias("block_hash"))
        rows = evmtransfers_table(logs).collect()
        assert len(rows) == 1
        assert rows[0].transfer_type == "erc20" and rows[0].value == "77"


class TestEvmAddressMapping:
    def test_pubkey_h160_roundtrips(self):
        """Truncation + zero-pad conventions (paraTool.js:517-539)."""
        from polkadot_etl_spark.functions.scalars import (
            h160_to_mapped_pubkey,
            h160_to_pubkey,
            pubkey_to_h160,
        )

        pk = "0x" + "ab" * 20 + "00" * 12
        h = pubkey_to_h160(pk)
        assert h == "0x" + "ab" * 20
        assert h160_to_pubkey(h) == pk
        # Frontier HashedAddressMapping: blake2_256('evm:' ++ h160)
        import hashlib

        want = hashlib.blake2b(b"evm:" + bytes.fromhex("ab" * 20), digest_size=32)
        assert h160_to_mapped_pubkey(h) == "0x" + want.hexdigest()

    def test_users_table(self, spark):
        from polkadot_etl_spark.plans.feeds import users_table

        acc = spark.createDataFrame(
            [("0x" + "11" * 32,), ("0x" + "22" * 32,)], "account_pubkey: string"
        )
        rows = {r.id: r for r in users_table(acc).collect()}
        r1 = rows["0x" + "11" * 32]
        assert r1.evm_address == "0x" + "11" * 20
        assert r1.ss58_address and not r1.ss58_address.startswith("0x")
        from polkadot_etl_spark.functions.scalars import get_pubkey

        assert get_pubkey(r1.ss58_address) == r1.id
