"""Pure-Python SCALE codec for the primitive ink!/substrate types.

Implements the public SCALE specification (substrate.dev codec docs):
little-endian fixed-width ints, compact/general integers, bool, options,
vectors/strings with compact length prefixes, and fixed-size byte arrays
(AccountId/H256/H160). This replaces the previous hard stub in
plans/wasm.py for every message whose argument types are primitive
(reference substrate/substrateetl.js:2097-2140 decodeWASMContractsCall —
there the polkadot.js ContractPromise does this decode from uploaded ink
metadata; here the registry carries the declared types).

Compound user types decode when their definitions are registered in a
TypeRegistry — the in-repo equivalent of the uploaded ink metadata the
reference reads (structs = field concatenation, enums = 1-byte variant
index + payload, tuples structurally).  An UNREGISTERED custom type is
the remaining honest boundary and still raises NotImplementedError.
"""

from __future__ import annotations

_UINTS = {"u8": 1, "u16": 2, "u32": 4, "u64": 8, "u128": 16}
_INTS = {"i8": 1, "i16": 2, "i32": 4, "i64": 8, "i128": 16}
_FIXED_HEX = {"AccountId": 32, "H256": 32, "Hash": 32, "H160": 20}
_ALIASES = {
    "Balance": "u128",
    "BlockNumber": "u32",
    "Moment": "u64",
    "bool": "bool",
    "str": "String",
}


class ScaleError(ValueError):
    pass


class TypeRegistry:
    """Custom compound type definitions — the shape ink! metadata
    declares (reference: polkadot.js Abi from uploaded contract metadata,
    substrateetl.js:2097-2140):

    - ``register_struct(name, [(field, type), ...])`` — SCALE structs
      are the plain concatenation of their fields;
    - ``register_enum(name, [(variant, [payload types]), ...])`` — a
      1-byte variant index followed by that variant's payload fields.

    Definitions may reference other registered types, primitives, and
    parametrics (Vec<T>, Option<T>, tuples) freely; cycles are the
    caller's responsibility exactly as in real metadata."""

    def __init__(self) -> None:
        self._defs: dict[str, tuple[str, list]] = {}

    def register_struct(self, name: str, fields: list[tuple[str, str]]) -> None:
        self._defs[name] = ("struct", list(fields))

    def register_enum(self, name: str, variants: list[tuple[str, list[str]]]) -> None:
        self._defs[name] = ("enum", list(variants))

    def get(self, name: str):
        return self._defs.get(name)


def _split_top(s: str) -> list[str]:
    """Split a type-argument list on top-level commas, respecting
    angle-bracket / paren / square-bracket nesting."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i].strip())
            start = i + 1
    tail = s[start:].strip()
    if tail:
        out.append(tail)
    return out


def decode_compact(data: bytes, offset: int = 0) -> tuple[int, int]:
    """Compact/general integer (SCALE spec §compact encoding)."""
    if offset >= len(data):
        raise ScaleError("compact: out of data")
    b0 = data[offset]
    mode = b0 & 0b11
    if mode == 0:
        return b0 >> 2, offset + 1
    if mode == 1:
        if offset + 2 > len(data):
            raise ScaleError("compact u16: out of data")
        return int.from_bytes(data[offset : offset + 2], "little") >> 2, offset + 2
    if mode == 2:
        if offset + 4 > len(data):
            raise ScaleError("compact u32: out of data")
        return int.from_bytes(data[offset : offset + 4], "little") >> 2, offset + 4
    n = (b0 >> 2) + 4
    if offset + 1 + n > len(data):
        raise ScaleError("compact big: out of data")
    return int.from_bytes(data[offset + 1 : offset + 1 + n], "little"), offset + 1 + n


def decode_value(type_name: str, data: bytes, offset: int = 0, types: "TypeRegistry | None" = None):
    """Decode one SCALE value; returns (python value, next offset).

    Supported: uN/iN, bool, AccountId/H256/H160 (→ 0x hex), Vec<u8>
    (→ 0x hex), String, Compact<T>, Option<T>, [u8; N], Vec<T>, tuples
    ``(A, B, ...)``, and any compound type registered in ``types``
    (struct → field dict, enum → {"variant": name, "values": [...]})."""
    t = _ALIASES.get(type_name, type_name).strip()

    if t in _UINTS:
        n = _UINTS[t]
        if offset + n > len(data):
            raise ScaleError(f"{t}: out of data")
        return int.from_bytes(data[offset : offset + n], "little"), offset + n
    if t in _INTS:
        n = _INTS[t]
        if offset + n > len(data):
            raise ScaleError(f"{t}: out of data")
        return int.from_bytes(data[offset : offset + n], "little", signed=True), offset + n
    if t == "bool":
        if offset >= len(data):
            raise ScaleError("bool: out of data")
        b = data[offset]
        if b not in (0, 1):
            raise ScaleError(f"bool: invalid byte {b:#x}")
        return bool(b), offset + 1
    if t in _FIXED_HEX:
        n = _FIXED_HEX[t]
        if offset + n > len(data):
            raise ScaleError(f"{t}: out of data")
        return "0x" + data[offset : offset + n].hex(), offset + n
    if t.startswith("Compact<") and t.endswith(">"):
        return decode_compact(data, offset)
    if t.startswith("Option<") and t.endswith(">"):
        if offset >= len(data):
            raise ScaleError("Option: out of data")
        if data[offset] == 0:
            return None, offset + 1
        if data[offset] != 1:
            raise ScaleError(f"Option: invalid tag {data[offset]:#x}")
        return decode_value(t[7:-1], data, offset + 1, types)
    if t in ("Vec<u8>", "Bytes"):
        ln, offset = decode_compact(data, offset)
        if offset + ln > len(data):
            raise ScaleError("Vec<u8>: out of data")
        return "0x" + data[offset : offset + ln].hex(), offset + ln
    if t == "String":
        ln, offset = decode_compact(data, offset)
        if offset + ln > len(data):
            raise ScaleError("String: out of data")
        return data[offset : offset + ln].decode("utf-8", errors="replace"), offset + ln
    if t.startswith("[u8;") and t.endswith("]"):
        n = int(t[4:-1].strip())
        if offset + n > len(data):
            raise ScaleError(f"{t}: out of data")
        return "0x" + data[offset : offset + n].hex(), offset + n
    if t.startswith("Vec<") and t.endswith(">"):
        inner = t[4:-1]
        ln, offset = decode_compact(data, offset)
        out = []
        for _ in range(ln):
            v, offset = decode_value(inner, data, offset, types)
            out.append(v)
        return out, offset
    if t.startswith("(") and t.endswith(")"):
        out = []
        for part in _split_top(t[1:-1]):
            v, offset = decode_value(part, data, offset, types)
            out.append(v)
        return out, offset
    d = types.get(t) if types is not None else None
    if d is not None:
        kind, body = d
        if kind == "struct":
            rec = {}
            for fname, ftype in body:
                rec[fname], offset = decode_value(ftype, data, offset, types)
            return rec, offset
        if offset >= len(data):
            raise ScaleError(f"{t}: enum out of data")
        idx = data[offset]
        offset += 1
        if idx >= len(body):
            raise ScaleError(f"{t}: enum variant {idx} out of range")
        vname, payload = body[idx]
        values = []
        for ftype in payload:
            v, offset = decode_value(ftype, data, offset, types)
            values.append(v)
        return {"variant": vname, "values": values}, offset
    raise NotImplementedError(
        f"SCALE decode of compound/custom type {type_name!r} requires ink metadata"
    )


def fixed_width(type_name: str) -> tuple[int, str] | None:
    """(byte width, render kind) when ``type_name`` is a fixed-width SCALE
    type, else None.  Kinds: 'uint' (LE unsigned int → decimal string),
    'bool' (one byte 00/01), 'hex' (fixed byte array → 0x-hex string).

    This classification powers the JVM fast path in
    plans/wasm.contractscall_table: a message whose args are ALL
    fixed-width decodes with pure column expressions (substring +
    byte-reverse + conv) — no Python worker at all.  Dynamic types
    (Vec, String, Compact, Option, signed ints) return None and keep the
    Arrow-batched UDF path."""
    t = _ALIASES.get(type_name, type_name).strip()
    if t in _UINTS:
        return _UINTS[t], "uint"
    if t == "bool":
        return 1, "bool"
    if t in _FIXED_HEX:
        return _FIXED_HEX[t], "hex"
    if t.startswith("[u8;") and t.endswith("]"):
        return int(t[4:-1].strip()), "hex"
    return None


def decode_args(
    arg_types: tuple[str, ...] | list[str],
    data: bytes,
    offset: int = 0,
    types: "TypeRegistry | None" = None,
) -> list:
    """Decode a message's argument list; raises ScaleError on truncated
    input and NotImplementedError on UNREGISTERED compound types."""
    out = []
    for t in arg_types:
        v, offset = decode_value(t, data, offset, types)
        out.append(v)
    if offset != len(data):
        raise ScaleError(f"{len(data) - offset} trailing bytes after args")
    return out
