"""EVM-side decode primitives (SURVEY §2.10 F5 — reference
substrate/ethTool.js: keccak256 :1046, computeSelector :219,
decodeRLPTransaction :927, ERC20/721/1155 log classification :237-330).

No external eth libraries exist in this environment, so the two
primitives everything rests on — keccak-256 and RLP — are implemented
here from their public specifications (Keccak-f[1600] sponge per the
Keccak reference / FIPS-202 pre-standard padding 0x01; RLP per the
Ethereum yellow paper appendix B). Pure functions over bytes; Spark use
is via pandas UDFs (vectorized, map-side only).
"""

from __future__ import annotations

from typing import Any

# ---------------------------------------------------------------------------
# keccak-256 (legacy Keccak padding 0x01, NOT sha3-256's 0x06)
# ---------------------------------------------------------------------------

_KECCAK_ROUNDS = 24
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_MASK = (1 << 64) - 1


def _rotl64(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state: list[list[int]]) -> None:
    for rnd in range(_KECCAK_ROUNDS):
        # theta
        c = [state[x][0] ^ state[x][1] ^ state[x][2] ^ state[x][3] ^ state[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl64(state[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                state[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        state[0][0] ^= _RC[rnd]


def _sponge_256(data: bytes, pad_byte: int) -> bytes:
    """Keccak sponge, 256-bit output. pad_byte 0x01 → legacy Keccak
    (Ethereum); 0x06 → FIPS-202 SHA3 — the latter lets tests validate
    this exact permutation + absorb loop against hashlib.sha3_256."""
    rate = 136  # (1600 - 2*256) / 8
    state = [[0] * 5 for _ in range(5)]
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    if pad_len == 1:
        padded += bytes([pad_byte | 0x80])
    else:
        padded += bytes([pad_byte]) + b"\x00" * (pad_len - 2) + b"\x80"
    for block_off in range(0, len(padded), rate):
        for i in range(rate // 8):
            lane = int.from_bytes(padded[block_off + 8 * i : block_off + 8 * i + 8], "little")
            state[i % 5][i // 5] ^= lane
        _keccak_f(state)
    out = bytearray()
    for i in range(rate // 8):
        out += state[i % 5][i // 5].to_bytes(8, "little")
        if len(out) >= 32:
            break
    return bytes(out[:32])


def keccak256(data: bytes) -> bytes:
    """keccak-256 digest (Ethereum variant: multi-rate padding 0x01)."""
    return _sponge_256(data, 0x01)


def keccak256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = bytes.fromhex(data[2:] if data.startswith("0x") else data)
    return "0x" + keccak256(data).hex()


def compute_selector(signature: str) -> str:
    """4-byte ABI selector: keccak256('transfer(address,uint256)')[:4]
    (reference ethTool.js:219)."""
    return "0x" + keccak256(signature.encode()).hex()[:8]


def event_topic(signature: str) -> str:
    """32-byte event topic0 hash for an event signature."""
    return "0x" + keccak256(signature.encode()).hex()


# ---------------------------------------------------------------------------
# RLP (yellow paper appendix B)
# ---------------------------------------------------------------------------


def rlp_decode(data: bytes) -> Any:
    """Decode one RLP item (bytes or nested list of bytes)."""
    item, rest = _rlp_decode_one(memoryview(data))
    if rest:
        raise ValueError(f"trailing bytes after RLP item: {len(rest)}")
    return item


def _rlp_decode_one(data: memoryview) -> tuple[Any, memoryview]:
    if not data:
        raise ValueError("empty RLP input")
    b0 = data[0]
    if b0 <= 0x7F:  # single byte literal
        return bytes(data[:1]), data[1:]
    if b0 <= 0xB7:  # short string
        n = b0 - 0x80
        return bytes(data[1 : 1 + n]), data[1 + n :]
    if b0 <= 0xBF:  # long string
        ln = b0 - 0xB7
        n = int.from_bytes(data[1 : 1 + ln], "big")
        return bytes(data[1 + ln : 1 + ln + n]), data[1 + ln + n :]
    if b0 <= 0xF7:  # short list
        n = b0 - 0xC0
        return _rlp_decode_list(data[1 : 1 + n]), data[1 + n :]
    ln = b0 - 0xF7  # long list
    n = int.from_bytes(data[1 : 1 + ln], "big")
    return _rlp_decode_list(data[1 + ln : 1 + ln + n]), data[1 + ln + n :]


def _rlp_decode_list(data: memoryview) -> list[Any]:
    out = []
    while data:
        item, data = _rlp_decode_one(data)
        out.append(item)
    return out


def rlp_encode(item: Any) -> bytes:
    """Encode bytes / nested lists of bytes as RLP."""
    if isinstance(item, (bytes, bytearray)):
        b = bytes(item)
        if len(b) == 1 and b[0] <= 0x7F:
            return b
        return _rlp_len(len(b), 0x80) + b
    payload = b"".join(rlp_encode(x) for x in item)
    return _rlp_len(len(payload), 0xC0) + payload


def _rlp_len(n: int, offset: int) -> bytes:
    if n <= 55:
        return bytes([offset + n])
    nb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([offset + 55 + len(nb)]) + nb


# ---------------------------------------------------------------------------
# Legacy transaction decode (reference decodeRLPTransaction, ethTool.js:927)
# ---------------------------------------------------------------------------

_B = lambda b: int.from_bytes(b, "big") if b else 0  # noqa: E731


def decode_rlp_transaction(raw: bytes | str) -> dict[str, Any]:
    """Decode a legacy (pre-EIP-1559) RLP transaction into typed fields
    with the keccak tx hash; typed envelopes (0x01/0x02) decode their
    inner payload fields where layout-compatible."""
    if isinstance(raw, str):
        raw = bytes.fromhex(raw[2:] if raw.startswith("0x") else raw)
    tx_type = 0
    body = raw
    if raw and raw[0] in (0x01, 0x02):  # typed-envelope (EIP-2930/1559)
        tx_type = raw[0]
        body = raw[1:]
    fields = rlp_decode(body)
    if tx_type == 2:  # EIP-1559: chainId,nonce,maxPrio,maxFee,gas,to,value,data,...
        chain_id, nonce, _prio, gas_price, gas, to, value, data = fields[:8]
    elif tx_type == 1:  # EIP-2930: chainId,nonce,gasPrice,gas,to,value,data,...
        chain_id, nonce, gas_price, gas, to, value, data = fields[:7]
    else:
        nonce, gas_price, gas, to, value, data = fields[:6]
        v = _B(fields[6]) if len(fields) > 6 else 0
        chain_id = (v - 35) // 2 if v >= 35 else None  # EIP-155
    return {
        "hash": "0x" + keccak256(raw).hex(),
        "type": tx_type,
        "chain_id": _B(chain_id) if isinstance(chain_id, bytes) else chain_id,
        "nonce": _B(nonce),
        "gas_price": _B(gas_price),
        "gas": _B(gas),
        "to": "0x" + to.hex() if to else None,
        "value": str(_B(value)),  # u256-safe: exact decimal string
        "data": "0x" + data.hex(),
        "selector": "0x" + data[:4].hex() if len(data) >= 4 else None,
    }


# ERC-20/721 log classification (reference ethTool.js:237-330): the
# Transfer(address,address,uint256) topic is shared; ERC-721 emits it with
# 4 topics (tokenId indexed), ERC-20 with 3 (amount in data).
TRANSFER_TOPIC = event_topic("Transfer(address,address,uint256)")
APPROVAL_TOPIC = event_topic("Approval(address,address,uint256)")
TRANSFER_SINGLE_TOPIC = event_topic(
    "TransferSingle(address,address,address,uint256,uint256)"
)


def classify_evm_log(topics: list[str]) -> str | None:
    if not topics:
        return None
    t0 = topics[0].lower()
    if t0 == TRANSFER_TOPIC:
        return "erc721_transfer" if len(topics) == 4 else "erc20_transfer"
    if t0 == APPROVAL_TOPIC:
        return "erc721_approval" if len(topics) == 4 else "erc20_approval"
    if t0 == TRANSFER_SINGLE_TOPIC:
        return "erc1155_transfer_single"
    return None


# ---------------------------------------------------------------------------
# ABI parameter decode (reference ethTool.js:237-330 selector surface,
# decodeTransactionInput; UniswapV2/V3 Swap parse per tools/udfs.sql:1-130).
#
# Calldata/log data are '0x…' hex strings; every decode below is pure
# substring + conv arithmetic on JVM-side columns — no Python in the hot
# path, whole-stage-codegen friendly. uint256 comes out three ways:
#   - exact DECIMAL(38,0) (overflows > ~1e38 become NULL, the BigQuery
#     NUMERIC semantics the reference stores raw amounts with)
#   - double (lossy, for USD-style math)
#   - low-64 bigint (safe when the domain is known small)
# ---------------------------------------------------------------------------

# 4-byte selectors, equal to the reference's published literals
# (ethTool.js:241-249, :270-282, :305-312) — asserted in tests. The
# canonical signature strings are exported too (the JSON-LD export
# emits byteSignature AND canonicalSignature; deriving both from ONE
# dict keeps them drift-free).
ERC20_SIGNATURES = {
    "transfer": "transfer(address,uint256)",
    "transferFrom": "transferFrom(address,address,uint256)",
    "approve": "approve(address,uint256)",
}
ERC20_SELECTORS = {
    m: compute_selector(sig) for m, sig in ERC20_SIGNATURES.items()
}  # 0xa9059cbb / 0x23b872dd / 0x095ea7b3
ERC721_SELECTORS = {
    "safeTransferFrom": compute_selector("safeTransferFrom(address,address,uint256)"),  # 0x42842e0e
    "safeTransferFromData": compute_selector(
        "safeTransferFrom(address,address,uint256,bytes)"
    ),  # 0xb88d4fde
}
ERC1155_SELECTORS = {
    "safeTransferFrom": compute_selector(
        "safeTransferFrom(address,address,uint256,uint256,bytes)"
    ),  # 0xf242432a
    "safeBatchTransferFrom": compute_selector(
        "safeBatchTransferFrom(address,address,uint256[],uint256[],bytes)"
    ),  # 0x2eb2c2d6
}

SWAP_V2_TOPIC = event_topic("Swap(address,uint256,uint256,uint256,uint256,address)")
SWAP_V3_TOPIC = event_topic("Swap(address,address,int256,int256,uint160,uint128,int24)")

_TWO64 = 18446744073709551616  # 2**64


def abi_word(data, i: int):
    """64-hex-char ABI word ``i`` of '0x'+selector-prefixed calldata."""
    from pyspark.sql import functions as F

    return F.substring(data, 11 + 64 * i, 64)


def log_word(data, i: int):
    """64-hex-char word ``i`` of '0x'-prefixed (selector-less) log data."""
    from pyspark.sql import functions as F

    return F.substring(data, 3 + 64 * i, 64)


def abi_address(word):
    """address = low 20 bytes of a 32-byte word."""
    from pyspark.sql import functions as F

    return F.concat(F.lit("0x"), F.lower(F.substring(word, 25, 40)))


def abi_uint_dec(word):
    """Exact uint256 → DECIMAL(38,0) via four 64-bit limbs; values beyond
    decimal(38) overflow to NULL (Spark non-ANSI), mirroring the
    reference's NUMERIC columns."""
    import decimal

    from pyspark.sql import functions as F

    two64 = F.lit(decimal.Decimal(_TWO64))
    out = None
    for i in range(4):
        limb = F.conv(F.substring(word, 1 + 16 * i, 16), 16, 10).cast("decimal(38,0)")
        out = limb if out is None else (out * two64 + limb).cast("decimal(38,0)")
    return out


def abi_uint_dbl(word):
    """uint256 → double (lossy above 2^53, never null)."""
    from pyspark.sql import functions as F

    out = F.lit(0.0)
    for i in range(4):
        limb = F.conv(F.substring(word, 1 + 16 * i, 16), 16, 10).cast("double")
        out = out * float(_TWO64) + limb
    return out


def abi_int_dbl(word):
    """int256 → double: two's complement decode (UniV3 Swap amounts are
    signed, tools/udfs.sql parse_…_event_Swap). The sign flip happens in
    EXACT decimal limb space — doing it in doubles (u − 2^256) would lose
    every magnitude below 2^203 to the 53-bit mantissa. |values| ≥ ~1e38
    overflow the decimal and come out NULL."""
    import decimal

    from pyspark.sql import functions as F

    two64 = F.lit(decimal.Decimal(_TWO64))
    max64 = F.lit(decimal.Decimal(_TWO64 - 1))
    pos, mag = None, None
    for i in range(4):
        limb = F.conv(F.substring(word, 1 + 16 * i, 16), 16, 10).cast("decimal(38,0)")
        inv = max64 - limb
        pos = limb if pos is None else (pos * two64 + limb).cast("decimal(38,0)")
        mag = inv if mag is None else (mag * two64 + inv).cast("decimal(38,0)")
    neg = F.substring(word, 1, 1).isin(
        "8", "9", "a", "b", "c", "d", "e", "f", "A", "B", "C", "D", "E", "F"
    )
    return F.when(neg, -(mag + F.lit(decimal.Decimal(1)))).otherwise(pos).cast("double")


def abi_uint64(word):
    """Low 64 bits as bigint — exact when the domain is known < 2^63."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(word, 49, 16), 16, 10).cast("bigint")


TRANSFER_BATCH_TOPIC = event_topic(
    "TransferBatch(address,address,address,uint256[],uint256[])"
)  # 0x4a39dc06… (the literal the reference pins, ethTool.js:314)


def log_array_base(data, head_slot: int):
    """Tail slot index of a dynamic ABI array: the head word at
    ``head_slot`` holds the tail's byte offset (offset/32 = slot).
    Materialize this as its own column before log_uint_array — inlining
    it into every element position blows the generated method past
    janino's 64 KB limit and drops the projection out of codegen."""
    return (abi_uint64(log_word(data, head_slot)) / 32).cast("int")


def log_uint_array(data, head_slot=None, base=None):
    """Decode a dynamic ``uint256[]`` from '0x'-prefixed log data as
    array<decimal(38,0)> — the ABI head-tail layout natively: the tail
    starts with a length word followed by the elements (TransferBatch's
    ids/values, ethTool.js erc1155ABI TransferBatch arm).

    Pass either ``head_slot`` (base derived inline — fine for one-off
    use) or a pre-materialized ``base`` column from log_array_base (the
    codegen-friendly form when decoding several arrays per row).

    All column-side: dynamic positions use column-position substring
    inside a transform over sequence(1, n) — no Python, no explode, no
    shuffle; NULL (not an error) when the data is too short."""
    import decimal

    from pyspark.sql import functions as F

    if base is None:
        base = log_array_base(data, head_slot)
    two64 = F.lit(decimal.Decimal(_TWO64))
    n = F.conv(
        F.substring(data, 3 + 64 * base + 48, 16), 16, 10
    ).cast("int")

    def elem(i):
        # element i (1-based) lives at slot base + i
        word = F.substring(data, 3 + 64 * (base + i), 64)
        out = None
        for k in range(4):
            limb = F.conv(F.substring(word, 1 + 16 * k, 16), 16, 10).cast("decimal(38,0)")
            out = limb if out is None else (out * two64 + limb).cast("decimal(38,0)")
        return out

    long_enough = F.length(data) >= 2 + 64 * (base + n + 1)
    empty = F.array().cast("array<decimal(38,0)>")
    # sequence(1, 0) would run DESCENDING — the n == 0 arm must short-circuit
    return F.when(n == 0, empty).when(
        (n > 0) & long_enough, F.transform(F.sequence(F.lit(1), n), elem)
    )


def decode_token_calldata(data):
    """ERC-20/721/1155 calldata → struct(standard, method, from, to,
    amount_raw DECIMAL(38,0), amount double, token_id DECIMAL(38,0)).

    Selector dispatch over the reference's detectERC20/721/1155 required
    lists (ethTool.js:237-330). 0x23b872dd transferFrom is shared by
    ERC-20 and ERC-721 — classified 'erc20' here; the third word doubles
    as amount/token_id exactly as in the shared Transfer topic. Unknown
    selector → NULL struct fields.

    Codegen note (r11 verdict: janino 64 KB): the when-chains pick word
    POSITIONS (one int chain feeding a single substring) rather than
    words, and the expensive limb decodes (abi_uint_dec/dbl) run ONCE
    on the picked word. Both halves matter: inlining a limb chain into
    every branch OR re-inlining a word-level when-chain into every limb
    reference (in-branch code is excluded from subexpression
    elimination) grows the generated method past janino's 64 KB limit
    and silently drops the whole stage out of codegen (measured: this
    struct alone generated 159 KB word-picked vs ~20 KB position-picked).
    """
    from pyspark.sql import functions as F

    sel = F.lower(F.substring(data, 1, 10))
    s = ERC20_SELECTORS, ERC721_SELECTORS, ERC1155_SELECTORS

    def chain(cases):
        out = None
        for cond_val, res in cases:
            out = F.when(cond_val, res) if out is None else out.when(cond_val, res)
        return out

    t20, tf20, a20 = s[0]["transfer"], s[0]["transferFrom"], s[0]["approve"]
    t721, t721d = s[1]["safeTransferFrom"], s[1]["safeTransferFromData"]
    t1155, tb1155 = s[2]["safeTransferFrom"], s[2]["safeBatchTransferFrom"]
    known_721 = [t721, t721d]
    known = [t20, tf20, a20, *known_721, t1155, tb1155]

    standard = chain(
        [
            (sel.isin(t20, tf20, a20), F.lit("erc20")),
            (sel.isin(*known_721), F.lit("erc721")),
            (sel.isin(t1155, tb1155), F.lit("erc1155")),
        ]
    )
    method = chain(
        [
            (sel == t20, F.lit("transfer")),
            (sel == tf20, F.lit("transferFrom")),
            (sel == a20, F.lit("approve")),
            (sel.isin(*known_721, t1155), F.lit("safeTransferFrom")),
            (sel == tb1155, F.lit("safeBatchTransferFrom")),
        ]
    )
    # POSITION picked per selector, ONE substring per logical word: a
    # null position yields a null word exactly like the old unmatched
    # when-chain, and the limb decode still runs once on the pick
    def picked(cases):
        pos = chain([(cond, F.lit(11 + 64 * i)) for cond, i in cases])
        return F.substring(data, pos, F.lit(64))

    from_word = picked([(sel.isin(tf20, *known_721, t1155, tb1155), 0)])
    to_word = picked(
        [(sel.isin(t20, a20), 0), (sel.isin(tf20, *known_721, t1155, tb1155), 1)]
    )
    amount_word = picked(
        [(sel.isin(t20, a20), 1), (sel == tf20, 2), (sel == t1155, 3)]
    )
    id_word = picked([(sel.isin(*known_721, t1155), 2)])

    return F.when(
        sel.isin(*known),
        F.struct(
            standard.alias("standard"),
            method.alias("method"),
            F.when(from_word.isNotNull(), abi_address(from_word)).alias("from_addr"),
            F.when(to_word.isNotNull(), abi_address(to_word)).alias("to_addr"),
            abi_uint_dec(amount_word).alias("amount_raw"),
            F.when(amount_word.isNotNull(), abi_uint_dbl(amount_word)).alias("amount"),
            abi_uint_dec(id_word).alias("token_id"),
        ),
    )


def decode_transfer_log(topics, data):
    """Transfer/TransferSingle/Swap event params → struct(kind, from,
    to, amount_raw, amount, token_id, amount0_in, amount1_in,
    amount0_out, amount1_out).

    ERC-20 Transfer: amount = data word 0 (3 topics). ERC-721 Transfer:
    tokenId = topic3 (4 topics, same topic0 — ethTool.js:253-254 comment).
    ERC-1155 TransferSingle: operator/from/to topics, (id, amount) data
    words. UniswapV2 Swap: 4 uint data words; V3 Swap: 2 signed words
    (tools/udfs.sql).
    """
    from pyspark.sql import functions as F

    t0 = F.lower(topics[0])
    n = F.size(topics)
    null_s = F.lit(None).cast("string")
    null_dec = F.lit(None).cast("decimal(38,0)")
    null_d = F.lit(None).cast("double")

    def addr(t):
        return F.concat(F.lit("0x"), F.lower(F.substring(t, 27, 40)))

    def out(kind, frm, to, raw_word, id_word, sw=None):
        sw = sw or [None] * 4
        return F.struct(
            F.lit(kind).alias("kind"),
            (frm if frm is not None else null_s).alias("from_addr"),
            (to if to is not None else null_s).alias("to_addr"),
            (abi_uint_dec(raw_word) if raw_word is not None else null_dec).alias("amount_raw"),
            (abi_uint_dbl(raw_word) if raw_word is not None else null_d).alias("amount"),
            (abi_uint_dec(id_word) if id_word is not None else null_dec).alias("token_id"),
            (sw[0] if sw[0] is not None else null_d).alias("amount0_in"),
            (sw[1] if sw[1] is not None else null_d).alias("amount1_in"),
            (sw[2] if sw[2] is not None else null_d).alias("amount0_out"),
            (sw[3] if sw[3] is not None else null_d).alias("amount1_out"),
        )

    return (
        F.when((t0 == TRANSFER_TOPIC) & (n == 4), out("erc721_transfer", addr(topics[1]), addr(topics[2]), None, F.substring(topics[3], 3, 64)))
        .when(t0 == TRANSFER_TOPIC, out("erc20_transfer", addr(topics[1]), addr(topics[2]), log_word(data, 0), None))
        .when(t0 == TRANSFER_SINGLE_TOPIC, out("erc1155_transfer_single", addr(topics[2]), addr(topics[3]), log_word(data, 1), log_word(data, 0)))
        .when(
            t0 == SWAP_V2_TOPIC,
            out("univ2_swap", addr(topics[1]), addr(topics[2]), None, None,
                [abi_uint_dbl(log_word(data, i)) for i in range(4)]),
        )
        .when(
            t0 == SWAP_V3_TOPIC,
            out("univ3_swap", addr(topics[1]), addr(topics[2]), None, None,
                [abi_int_dbl(log_word(data, 0)), abi_int_dbl(log_word(data, 1)), None, None]),
        )
    )


def decorate_txn(txns, receipts):
    """The full-txn decoration (reference ethTool.js:819-918 decorateTxn):
    join tx × receipt on the hash and derive the fee economics natively —
    fee = gasUsed·gasPrice, burnedFee = gasUsed·baseFee, txnSaving =
    (maxFee − baseFee)·gasUsed, with the reference's exact ordering quirk:
    burned/saving use the pre-adjustment baseFee (effectiveGasPrice when
    1559 fields are present, else 0) and the PUBLISHED baseFee is then
    re-derived as gasPrice − maxPriorityFee when gasPrice ≥ baseFee
    (:860-866). Ether/gwei scaling matches :841-842.

    Inputs carry numeric (already de-hexed) columns: txns(hash,
    block_hash, block_number, transaction_index, from_addr, to_addr,
    chain_id, nonce, tx_type, value, gas, gas_price, max_fee_per_gas,
    max_priority_fee_per_gas, input); receipts(hash, status, gas_used,
    cumulative_gas_used, effective_gas_price, contract_address).
    """
    from pyspark.sql import functions as F

    ether, gwei = 1e18, 1e9
    r = receipts.select(
        F.col("hash").alias("__rhash"),
        "status",
        "gas_used",
        "cumulative_gas_used",
        "effective_gas_price",
        "contract_address",
    )
    j = txns.join(r, txns.hash == r.__rhash, "inner").drop("__rhash")
    has1559 = F.col("max_priority_fee_per_gas").isNotNull()
    base_fee0 = F.when(has1559, F.col("effective_gas_price")).otherwise(F.lit(0.0)).cast("double")
    gas_price = F.coalesce(F.col("gas_price"), F.lit(0)).cast("double")
    gas_used = F.coalesce(F.col("gas_used"), F.lit(0)).cast("double")
    max_fee = F.coalesce(F.col("max_fee_per_gas"), F.lit(0)).cast("double")
    max_prio = F.coalesce(F.col("max_priority_fee_per_gas"), F.lit(0)).cast("double")
    base_fee_pub = F.when(gas_price >= base_fee0, gas_price - max_prio).otherwise(base_fee0)
    return j.select(
        "chain_id",
        F.col("hash").alias("transaction_hash"),
        "status",
        "block_hash",
        "block_number",
        "transaction_index",
        F.col("from_addr"),
        F.col("to_addr"),
        F.col("contract_address").alias("creates"),
        (F.col("value").cast("double") / ether).alias("value"),
        F.col("value").cast("decimal(38,0)").alias("value_raw"),
        F.col("tx_type"),
        (gas_used * gas_price / ether).alias("fee"),
        (gas_used * base_fee0 / ether).alias("burned_fee"),
        ((max_fee - base_fee0) * gas_used / ether).alias("txn_saving"),
        F.col("gas").alias("gas_limit"),
        F.col("gas_used").alias("gas_used"),
        F.col("cumulative_gas_used"),
        (max_fee / gwei).alias("max_fee_per_gas"),
        (max_prio / gwei).alias("max_priority_fee_per_gas"),
        (base_fee_pub / gwei).alias("base_fee_per_gas"),
        (F.col("effective_gas_price").cast("double") / gwei).alias("effective_gas_price"),
        (gas_price / gwei).alias("gas_price"),
        # exact wei-denominated integers (the gwei doubles above are the
        # reference's display units; round-tripping them back truncates)
        F.col("gas_price").cast("long").alias("gas_price_wei"),
        F.col("max_fee_per_gas").cast("long").alias("max_fee_per_gas_wei"),
        F.col("max_priority_fee_per_gas").cast("long").alias("max_priority_fee_per_gas_wei"),
        F.col("effective_gas_price").cast("long").alias("effective_gas_price_wei"),
        "nonce",
        F.col("input"),
        F.when(F.length("input") >= 10, F.lower(F.substring("input", 1, 10))).alias("selector"),
        # passthrough metadata (block_time / extrinsic ids / access_list)
        # survives decoration when the caller provides it
        *[c for c in ("block_time", "extrinsic_id", "extrinsic_hash", "access_list") if c in txns.columns],
    )


def classify_evm_log_col(topics):  # type: (Column) -> Column
    """Native column expression version of classify_evm_log — a when
    chain over topic0 + topic count, fully JVM-side (the BigQuery JS UDF
    parse_UniswapV3Pool_event_Swap class of work, reference
    tools/udfs.sql, stays out of Python entirely)."""
    from pyspark.sql import functions as F

    t0 = F.lower(topics[0])
    n = F.size(topics)
    return (
        F.when((t0 == TRANSFER_TOPIC) & (n == 4), "erc721_transfer")
        .when(t0 == TRANSFER_TOPIC, "erc20_transfer")
        .when((t0 == APPROVAL_TOPIC) & (n == 4), "erc721_approval")
        .when(t0 == APPROVAL_TOPIC, "erc20_approval")
        .when(t0 == TRANSFER_SINGLE_TOPIC, "erc1155_transfer_single")
    )
