"""XCM multilocation ↔ interior-key codec (SURVEY §2.8 — reference
substrate/paraTool.js: convert_multilocation_to_hex :1000,
convert_Multilocation_From_Hex :1069, interior-key V1↔V2 handling
:1345-1420).

The interior key is the reference's canonical string identity for an
XCM asset location: relay prefix + either "here" or the JSON of the
junction list with lower-camel junction names. Pure functions —
Spark-side use is a pandas UDF or driver-side dim building (the
xcmassetlog / xcmInteriorKey columns).
"""

from __future__ import annotations

import json
from typing import Any

# junction name canonicalization: SCALE/V1 PascalCase → camelCase
_JUNCTIONS = {
    "parachain": "parachain",
    "accountid32": "accountId32",
    "accountindex64": "accountIndex64",
    "accountkey20": "accountKey20",
    "palletinstance": "palletInstance",
    "generalindex": "generalIndex",
    "generalkey": "generalKey",
    "onlychild": "onlyChild",
    "globalconsensus": "globalConsensus",
}


def _canon_junction(j: dict[str, Any]) -> dict[str, Any]:
    if len(j) != 1:
        raise ValueError(f"junction must have exactly one key: {j}")
    (k, v), = j.items()
    ck = _JUNCTIONS.get(k.lower())
    if ck is None:
        raise ValueError(f"unknown junction: {k}")
    return {ck: v}


def _junction_list(interior: dict[str, Any]) -> list[dict[str, Any]] | None:
    """Interior {'Here': null} → None; {'X1': j} / {'Xn': [j...]} → list."""
    if not interior or any(k.lower() == "here" for k in interior):
        return None
    (k, v), = interior.items()
    if not k.lower().startswith("x"):
        raise ValueError(f"unknown interior: {k}")
    # V1 X1 carries a bare junction; X2+ carry arrays (paraTool.js:1345
    # normalizes both shapes)
    js = v if isinstance(v, list) else [v]
    return [_canon_junction(j) for j in js]


def interior_key(multilocation: dict[str, Any], relay: str = "polkadot") -> str:
    """Canonical interior key: '{relay}~here' for the relay asset, else
    '{relay}~' + compact JSON of the canonical junction list. Total
    function of the location → usable as a join/grouping key."""
    interior = multilocation.get("interior", multilocation.get("Interior", {}))
    js = _junction_list(interior)
    if js is None:
        return f"{relay}~here"
    return f"{relay}~" + json.dumps(js, sort_keys=True, separators=(",", ":"))


def multilocation_from_interior_key(key: str) -> tuple[str, dict[str, Any]]:
    """Inverse of interior_key: (relay, multilocation-with-V1-interior)."""
    relay, _, body = key.partition("~")
    if not body:
        raise ValueError(f"not an interior key: {key}")
    if body == "here":
        return relay, {"parents": 0, "interior": {"Here": None}}
    js = json.loads(body)
    if len(js) == 1:
        return relay, {"parents": 0, "interior": {"X1": js[0]}}
    return relay, {"parents": 0, "interior": {f"X{len(js)}": js}}


_NETWORKS = {"00": "Any", "02": "Polkadot", "03": "Kusama"}


def junction_from_hex(hex_str: str) -> dict[str, Any]:
    """Decode one precompile-encoded junction: 1 selector byte + payload
    (reference chains/moonbeam.js:205-289 convertMultilocationFromHex —
    the byte layout of the XCM-transactor precompile docs).

    0x00 Parachain(u32) · 0x01 AccountId32{key, network} ·
    0x02 AccountIndex64{index, network} · 0x03 AccountKey20{key, network}
    · 0x04 PalletInstance(u8) · 0x05 GeneralIndex(u128) ·
    0x06 GeneralKey(bytes) · 0x07 OnlyChild."""
    h = hex_str[2:] if hex_str.startswith("0x") else hex_str
    sel, body = h[:2], h[2:]

    def network(tail: str) -> Any:
        if tail[:2] == "01":
            return {"Named": tail[2:]}
        return _NETWORKS.get(tail[:2], "Any")

    if sel == "00":
        return {"parachain": int(body, 16)}
    if sel == "01":
        return {"accountId32": {"network": network(body[64:]), "key": "0x" + body[:64]}}
    if sel == "02":
        return {"accountIndex64": {"network": network(body[16:]), "index": int(body[:16], 16)}}
    if sel == "03":
        return {"accountKey20": {"network": network(body[40:]), "key": "0x" + body[:40]}}
    if sel == "04":
        return {"palletInstance": int(body, 16)}
    if sel == "05":
        return {"generalIndex": int(body, 16)}
    if sel == "06":
        return {"generalKey": "0x" + body}
    if sel == "07":
        return {"onlyChild": None}
    raise ValueError(f"unknown junction selector 0x{sel}")


def para_id_of(multilocation: dict[str, Any]) -> int | None:
    """First Parachain junction's id, if any (the chainIDDest derivation
    the xcm transfer matcher keys on)."""
    js = _junction_list(
        multilocation.get("interior", multilocation.get("Interior", {}))
    )
    for j in js or []:
        if "parachain" in j:
            return int(j["parachain"])
    return None
