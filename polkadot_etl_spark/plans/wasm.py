"""WASM/ink! contract-call decode (SURVEY §2.10 F6 — reference
substrate/substrateetl.js:2097-2140 decodeWASMContractsCall).

The reference resolves the contract's code hash to uploaded ink!
metadata, matches the 4-byte message selector, and SCALE-decodes the
arguments (polkadot.js ContractPromise.abi.decodeMessage). Here the
registry carries the declared argument types and the arguments are
SCALE-decoded by functions/scale.py — a from-spec pure-Python codec
covering every primitive ink type (uN/iN, bool, AccountId, Vec<u8>,
String, Compact<T>, Option<T>, fixed arrays). Only compound custom
types (user structs/enums), which genuinely require the uploaded ink
metadata, remain behind NotImplementedError.
"""

from __future__ import annotations

from dataclasses import dataclass

from polkadot_etl_spark.functions.scale import decode_args


@dataclass(frozen=True)
class InkMessage:
    label: str
    selector: str  # 0x + 4-byte hex
    arg_types: tuple[str, ...] = ()


class ContractRegistry:
    """code_hash → declared messages (the uploaded-metadata store)."""

    def __init__(self) -> None:
        self._by_hash: dict[str, dict[str, InkMessage]] = {}

    def register(self, code_hash: str, messages: list[InkMessage]) -> None:
        self._by_hash[code_hash.lower()] = {m.selector.lower(): m for m in messages}

    def decode_call(self, code_hash: str, data_hex: str) -> dict:
        """Match the selector of a contracts.call data payload and
        SCALE-decode the declared arguments (substrateetl.js:2104-2119).
        Compound custom arg types raise NotImplementedError (they need
        the uploaded ink metadata)."""
        data = data_hex[2:] if data_hex.startswith("0x") else data_hex
        selector = "0x" + data[:8].lower()
        msgs = self._by_hash.get(code_hash.lower(), {})
        m = msgs.get(selector)
        if m is None:
            return {"selector": selector, "label": None, "decoded": False}
        values = decode_args(m.arg_types, bytes.fromhex(data[8:]))
        return {
            "selector": selector,
            "label": m.label,
            "decoded": True,
            "args": dict(zip([f"arg{i}" for i in range(len(values))], values)),
        }
