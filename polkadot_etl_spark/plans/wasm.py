"""WASM/ink! contract-call decode (SURVEY §2.10 F6 — reference
substrate/substrateetl.js:2097-2140 decodeWASMContractsCall).

The reference resolves the contract's code hash to uploaded ink!
metadata, matches the 4-byte message selector, and SCALE-decodes the
arguments. The SCALE/metadata toolchain (`scale-codec` / `ink-metadata`)
is not available in this environment, so the decode step is STUBBED
behind the metadata registry: selector matching and dispatch — the
Spark-side plumbing — are real; argument decoding raises
NotImplementedError unless the message declares no arguments.
"""

from __future__ import annotations

from dataclasses import dataclass


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
        """Match the selector of a contracts.call data payload; decode
        args when trivially possible (none declared), else mark the row
        for the full SCALE path."""
        data = data_hex[2:] if data_hex.startswith("0x") else data_hex
        selector = "0x" + data[:8].lower()
        msgs = self._by_hash.get(code_hash.lower(), {})
        m = msgs.get(selector)
        if m is None:
            return {"selector": selector, "label": None, "decoded": False}
        if not m.arg_types:
            return {"selector": selector, "label": m.label, "decoded": True, "args": {}}
        raise NotImplementedError(
            "SCALE argument decode requires the ink metadata toolchain, "
            "which is not installed in this environment (stub boundary — "
            f"message {m.label} declares args {m.arg_types})"
        )
