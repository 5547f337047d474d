"""Decode-surface pipelines: call-tree flattening (F2) and transfer
extraction (F3) — the two transforms that turn raw extrinsics/events into
the published calls/transfers tables.

Reference behavior being reproduced:
- paramToCalls / recursive_batch_all (assetManager.js:1922-2040,
  indexer.js:3433-3608): one extrinsic → N call rows with path ids
  ("0", "0-0", "0-0-1"), root/leaf flags, fee only at the root, and only
  successful extrinsics produce calls (substrateetl.js:6403-6416).
- processFeedTransfer (indexer.js:6291, transfer pallets listed at :6334):
  balances:Transfer / tokens:Transfer / currencies:Transferred /
  assets:Transferred events → typed transfer rows with decimalized
  amounts and exact raw_amount.

Spark shape: the recursion is a vectorized pandas UDF producing
array<struct> which is exploded (the UDTF pattern, SURVEY F2); everything
downstream is native columns. At 100 TB the UDF touches each extrinsic
once, map-side, no shuffle.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_CALL_NODE = T.StructType(
    [
        T.StructField("call_id", T.StringType()),
        T.StructField("call_section", T.StringType()),
        T.StructField("call_method", T.StringType()),
        T.StructField("call_args", T.StringType()),
        T.StructField("root", T.BooleanType()),
        T.StructField("leaf", T.BooleanType()),
    ]
)

_NESTING_SECTIONS = {"utility", "sudo", "proxy", "multisig"}


def _walk(section: str, method: str, args: dict, call_id: str, out: list) -> None:
    children = []
    if section in _NESTING_SECTIONS:
        if isinstance(args.get("calls"), list):
            children = [c for c in args["calls"] if isinstance(c, dict)]
        elif isinstance(args.get("call"), dict):
            children = [args["call"]]
    out.append(
        {
            "call_id": call_id,
            "call_section": section,
            "call_method": method,
            "call_args": json.dumps(args, sort_keys=True),
            "root": call_id == "0",
            "leaf": not children,
        }
    )
    for i, child in enumerate(children):
        _walk(
            child.get("section", "unknown"),
            child.get("method", "unknown"),
            child.get("args", {}) if isinstance(child.get("args"), dict) else {},
            f"{call_id}-{i}",
            out,
        )


@pandas_udf(T.ArrayType(_CALL_NODE))
def _flatten_calls(section: pd.Series, method: pd.Series, params: pd.Series) -> pd.Series:
    # The flatten is a pure function of (section, method, params), and real
    # batch traffic repeats payloads heavily (airdrop/spam batches submit
    # the same call list thousands of times) — memoize per Arrow batch so
    # each distinct payload parses once. Bounded (payloads can be unique in
    # the worst case) and map-side only: no shuffle, unlike a
    # dedup-decode-join-back, so the worst case costs one dict probe.
    cache: dict = {}
    out = []
    for s, m, p in zip(section, method, params):
        key = (s, m, p)
        nodes = cache.get(key)
        if nodes is None:
            try:
                args = json.loads(p) if p else {}
                if not isinstance(args, dict):
                    args = {}
            except Exception:
                args = {}
            nodes = []
            _walk(s or "unknown", m or "unknown", args, "0", nodes)
            if len(cache) < 65536:
                cache[key] = nodes
        out.append(nodes)
    return pd.Series(out)


def calls_from_extrinsics(
    extrinsics: DataFrame, events: DataFrame, relay_chain: str, para_id: int
) -> DataFrame:
    """Flattened call tree, one row per (extrinsic, call path).

    Only successful extrinsics produce calls (substrateetl.js:6403): the
    success set comes from terminal system:ExtrinsicSuccess events. fee /
    weight / signer are attached at the root only (:6409-6416).
    """
    # No dropDuplicates on the success side: left_semi semantics already
    # ignore right-side multiplicity, and the dedup costs a full extra
    # aggregation exchange. shuffle_hash keeps the join from sorting both
    # sides on string ids — the success-id side (one id per successful
    # extrinsic of the chain-day) is the natural hash side and measured
    # ~2× faster than the default sort-merge at sf0.1.
    success = events.where(
        (F.col("section") == "system") & (F.col("method") == "ExtrinsicSuccess")
    ).select("extrinsic_id")
    ok = extrinsics.join(success.hint("shuffle_hash"), "extrinsic_id", "left_semi")
    # Fast path: sections that can't nest (everything but utility/sudo/
    # proxy/multisig) produce exactly one root+leaf node — build it with
    # native columns and keep the Python UDF off ~90% of rows. At 100 TB
    # the UDF then touches only the nesting minority, map-side.
    is_nesting = F.col("section").isin(*sorted(_NESTING_SECTIONS))
    simple_node = F.struct(
        F.lit("0").alias("call_id"),
        F.coalesce(F.col("section"), F.lit("unknown")).alias("call_section"),
        F.coalesce(F.col("method"), F.lit("unknown")).alias("call_method"),
        # pass-through of the original args JSON (the UDF path re-serializes
        # canonically only because it must round-trip through json.loads)
        F.coalesce(F.col("params"), F.lit("{}")).alias("call_args"),
        F.lit(True).alias("root"),
        F.lit(True).alias("leaf"),
    )
    simple = ok.where(~is_nesting).withColumn("node", simple_node)
    nested = ok.where(is_nesting).withColumn(
        "node", F.explode(_flatten_calls(F.col("section"), F.col("method"), F.col("params")))
    )
    exploded = simple.unionByName(nested)
    n = F.col("node")
    return exploded.select(
        F.lit(relay_chain).alias("relay_chain"),
        F.lit(para_id).alias("para_id"),
        F.concat_ws("-", F.lit(relay_chain), F.lit(str(para_id))).alias("id"),
        F.col("block_hash"),
        F.col("block_number"),
        F.col("block_time"),
        F.col("hash").alias("extrinsic_hash"),
        F.col("extrinsic_id"),
        F.col("section").alias("extrinsic_section"),
        F.col("method").alias("extrinsic_method"),
        n["call_id"].alias("call_id"),
        F.lit(None).cast("string").alias("call_index"),
        n["call_section"].alias("call_section"),
        n["call_method"].alias("call_method"),
        n["call_args"].alias("call_args"),
        F.lit(None).cast("string").alias("call_args_def"),
        n["root"].alias("root"),
        n["leaf"].alias("leaf"),
        F.when(n["root"], F.col("fee")).alias("fee"),
        F.when(n["root"], F.col("fee_usd")).alias("fee_usd"),
        F.when(n["root"], F.col("weight")).alias("weight"),
        F.col("signed"),
        F.col("signer_ss58"),
        F.col("signer_pub_key"),
        F.col("lifetime"),
    )


# Positional layouts of transfer-event data arrays (indexer.js:6334 pallets)
_TRANSFER_LAYOUT = {
    # (section, method): (from_idx, to_idx, value_idx, asset_idx|None)
    ("balances", "Transfer"): (0, 1, 2, None),
    ("tokens", "Transfer"): (1, 2, 3, 0),
    ("currencies", "Transferred"): (1, 2, 3, 0),
    ("assets", "Transferred"): (1, 2, 3, 0),
}


def transfers_from_events(
    events: DataFrame,
    native_symbol: str = "DOT",
    native_decimals: int = 10,
    ss58_prefix: int = 0,
) -> DataFrame:
    """Typed transfers from positional transfer-event payloads (F3 subset).

    data is a JSON array; positions differ per pallet. amount is
    decimalized; raw_amount keeps the exact integer as DECIMAL(38,0)
    (transfers.json:112 NUMERIC semantics).
    """
    arr = F.from_json(F.col("data"), T.ArrayType(T.StringType()))
    e = events.withColumn("d", arr)

    cases_from, cases_to, cases_val, cases_asset = None, None, None, None
    for (sec, meth), (fi, ti, vi, ai) in _TRANSFER_LAYOUT.items():
        cond = (F.col("section") == sec) & (F.col("method") == meth)
        cases_from = (F.when(cond, F.col("d")[fi]) if cases_from is None
                      else cases_from.when(cond, F.col("d")[fi]))
        cases_to = (F.when(cond, F.col("d")[ti]) if cases_to is None
                    else cases_to.when(cond, F.col("d")[ti]))
        cases_val = (F.when(cond, F.col("d")[vi]) if cases_val is None
                     else cases_val.when(cond, F.col("d")[vi]))
        asset_col = F.col("d")[ai] if ai is not None else F.lit(native_symbol)
        cases_asset = (F.when(cond, asset_col) if cases_asset is None
                       else cases_asset.when(cond, asset_col))

    is_transfer = F.concat_ws(":", F.col("section"), F.col("method")).isin(
        *[f"{s}:{m}" for s, m in _TRANSFER_LAYOUT]
    )
    raw = cases_val.try_cast("decimal(38,0)")
    from polkadot_etl_spark.functions.udfs import u_get_address

    enc = u_get_address(ss58_prefix)
    return (
        e.where(is_transfer)
        .select(
            "event_id",
            "section",
            "method",
            "extrinsic_id",
            "extrinsic_hash",
            "block_time",
            "block_number",
            "block_hash",
            enc(cases_from).alias("from_ss58"),
            cases_from.alias("from_pub_key"),
            enc(cases_to).alias("to_ss58"),
            cases_to.alias("to_pub_key"),
            cases_asset.alias("asset"),
            F.lit(None).cast("double").alias("price_usd"),
            F.lit(None).cast("double").alias("amount_usd"),
            cases_asset.alias("symbol"),
            F.lit(native_decimals).alias("decimals"),
            (raw.cast("double") / F.pow(F.lit(10.0), F.lit(native_decimals))).alias("amount"),
            raw.alias("raw_amount"),
        )
    )
