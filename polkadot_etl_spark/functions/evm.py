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
