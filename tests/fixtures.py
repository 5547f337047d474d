"""Deterministic domain fixtures per FIXTURES.md — synthetic silver-layer
tables (blocks/extrinsics/events/balances/traces/xcm*/assetlog/stakings/
specversions) exercising every reference-specific semantic: nested call
trees (F2), transfer events (F3), noise rows (P3), day-diff account
lifecycle, band-matchable XCM pairs with ambiguity (J1/J2/W2), OHLCV grids
with liquidity ranks and gaps (A10/W3/J3/P2), LAG-able trace diffs (W1).

Seeded, referentially consistent: every event's extrinsic_id exists, every
block_number is contiguous per chain, timestamps step 12 s per block.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone
from decimal import Decimal

from polkadot_etl_spark.functions import scalars as sc
from polkadot_etl_spark.schemas import SCHEMAS

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
BLOCKS_PER_DAY = 40
N_DAYS = 3
CHAINS = [  # (para_id, relay_chain, first block number)
    (0, "polkadot", 1000),
    (2004, "polkadot", 5000),
]

ADDRS = [("0x" + f"{i:02x}" * 32) for i in range(1, 13)]  # pubkeys
SS58 = {pk: sc.get_address(pk, 0) for pk in ADDRS}


def _ts(day: int, block_in_day: int) -> datetime:
    return T0 + timedelta(days=day, seconds=12 * block_in_day)


def _naive(dt: datetime) -> datetime:
    return dt.replace(tzinfo=None)


def build_fixture_rows(seed: int = 42) -> dict[str, list[tuple]]:
    rng = random.Random(seed)
    blocks, blocks_raw, extrinsics, events, specversions = [], [], [], [], []
    balances, traces, stakings = [], [], []

    for para_id, relay, bn0 in CHAINS:
        spec = 100
        for day in range(N_DAYS):
            for i in range(BLOCKS_PER_DAY):
                bn = bn0 + day * BLOCKS_PER_DAY + i
                ts = _naive(_ts(day, i))
                bhash = "0xb" + f"{para_id:04x}{bn:08x}".ljust(62, "0")
                author = ADDRS[bn % 3]  # 3 distinct authors
                if para_id == 0 and bn in (1020, 1080):
                    spec += 1
                    specversions.append((spec, bn, bhash, ts, json.dumps({"specName": "polkadot"})))

                n_ext = 0
                evs_in_block = 0

                def add_event(section, method, data, ext_id, ext_hash, ev_idx):
                    nonlocal evs_in_block
                    events.append(
                        (
                            f"{bn}-{ext_id.split('-')[1]}-{ev_idx}",
                            section,
                            method,
                            json.dumps(data),
                            ext_id,
                            ext_hash,
                            ts,
                            bn,
                            bhash,
                            None,
                        )
                    )
                    evs_in_block += 1

                def add_ext(idx, section, method, params, signed, signer, ok=True, batch_calls=None):
                    nonlocal n_ext
                    ext_id = f"{bn}-{idx}"
                    ext_hash = "0xe" + f"{para_id:04x}{bn:08x}{idx:02x}".ljust(62, "0")
                    fee = round(rng.uniform(0.001, 0.2), 6) if signed else None
                    extrinsics.append(
                        (
                            ext_hash,
                            ext_id,
                            ts,
                            bn,
                            bhash,
                            json.dumps({"isImmortal": not signed}),
                            section,
                            method,
                            json.dumps(params),
                            fee,
                            None if fee is None else round(fee * 6.5, 8),
                            rng.randrange(10**6, 10**9),
                            signed,
                            SS58.get(signer) if signer else None,
                            signer,
                        )
                    )
                    n_ext += 1
                    # terminal success/failure event (substrateetl.js:6318-6326)
                    add_event(
                        "system",
                        "ExtrinsicSuccess" if ok else "ExtrinsicFailed",
                        [{"weight": {"refTime": rng.randrange(10**6, 10**8)}}],
                        ext_id,
                        ext_hash,
                        90 + idx,
                    )
                    return ext_id, ext_hash

                # 0: timestamp:set noise row (always, unsigned)
                add_ext(0, "timestamp", "set", {"now": int(ts.timestamp())}, False, None)
                # 1: paraInherent noise on relay
                if para_id == 0:
                    add_ext(1, "paraInherent", "enter", {}, False, None)

                # 2: balances transfer (signed) with its Transfer event
                frm = ADDRS[rng.randrange(len(ADDRS) // 2)]  # skewed senders
                to = ADDRS[rng.randrange(len(ADDRS))]
                raw = rng.randrange(10**9, 10**13)
                ext_id, ext_hash = add_ext(
                    2, "balances", "transfer", {"dest": to, "value": raw}, True, frm,
                    ok=(rng.random() > 0.1),
                )
                add_event("balances", "Transfer", [frm, to, raw], ext_id, ext_hash, 0)
                if i % 7 == 0:  # exact duplicate event within the block (A5)
                    add_event("balances", "Transfer", [frm, to, raw], ext_id, ext_hash, 0)

                # 3: utility:batch with nested calls (F2 call-tree fodder)
                if i % 3 == 0:
                    inner = {
                        "section": "balances",
                        "method": "transfer",
                        "args": {"dest": ADDRS[-1], "value": 777},
                    }
                    depth2 = {
                        "section": "utility",
                        "method": "batch",
                        "args": {"calls": [inner, {"section": "staking", "method": "bond",
                                                   "args": {"value": 5}}]},
                    }
                    batch = {"calls": [inner, depth2] if i % 6 == 0 else [inner]}
                    ext_id, ext_hash = add_ext(3, "utility", "batch", batch, True, ADDRS[3])
                    # tokens transfer event inside batches (multi-pallet transfers)
                    add_event("tokens", "Transfer", ["DOT", frm, to, raw // 2], ext_id, ext_hash, 1)

                blocks.append(
                    (
                        bhash,
                        "0xb" + f"{para_id:04x}{bn - 1:08x}".ljust(62, "0"),
                        bn,
                        "0x5" + "0" * 63,
                        "0x6" + "0" * 63,
                        ts,
                        SS58[author],
                        author,
                        spec,
                        bn + 10_000_000 if para_id else None,
                        None,
                        n_ext,
                        evs_in_block,
                        1,
                        2,
                    )
                )
                # bronze twin carrying the raw digest logs (1-3 per block)
                digest = [json.dumps({"preRuntime": ["0x61757261", f"0x{bn:016x}"]})]
                if bn % 2 == 0:
                    digest.append(json.dumps({"seal": ["0x61757261", f"0x{bn:08x}" + "00" * 28]}))
                if bn % 5 == 0:
                    digest.append(json.dumps({"consensus": ["0x66726f6e", "0x01"]}))
                blocks_raw.append(
                    (
                        bn,
                        bhash,
                        "0xb" + f"{para_id:04x}{bn - 1:08x}".ljust(62, "0"),
                        "0x5" + "0" * 63,
                        "0x6" + "0" * 63,
                        ts,
                        SS58[author],
                        author,
                        spec,
                        bn + 10_000_000 if para_id else None,
                        None,
                        digest,
                    )
                )

                # traces: System.Account diffs for 3 addresses, values change
                # every ~4 blocks (W1 LAG fodder)
                for t_idx, pk in enumerate(ADDRS[:3]):
                    step = bn // 4
                    reserved = float(100 + (step % 5) * 10 + t_idx)
                    pv = {
                        "consumers": step % 3,
                        "providers": 1,
                        "sufficients": 0,
                        "data": {"reserved": reserved},
                    }
                    traces.append(
                        (
                            relay, str(para_id), f"{relay}-{para_id}", "chain" + str(para_id),
                            f"{bn}-{t_idx}", f"{bn}-2", ts, bn, bhash,
                            "0x" + sc.twox_128(b"System") + sc.twox_128(b"Account") + pk[2:],
                            "0x" + "aa" * 16, "System", "Account", None, json.dumps(pv),
                            "DOT", 10, "DOT", "Polkadot", "native", None,
                            SS58[pk], pk, None,
                            float(1000 + bn % 7), reserved, 0.0,
                        )
                    )

        # daily balance snapshots: addresses rotate in (new) and out (reaped)
        for day in range(N_DAYS):
            ts = _naive(T0 + timedelta(days=day, hours=23))
            present = ADDRS[day : 8 + day]  # slides by one per day
            for pk in present:
                free_raw = 10**19 + day * 10**18 + int(pk[2:4], 16)  # > 2^63
                balances.append(
                    (
                        "DOT", SS58[pk], pk, ts, f"{relay}-{para_id}", "chain" + str(para_id),
                        "DOT", para_id,
                        free_raw / 1e10, free_raw / 1e10 * 6.5, str(free_raw),
                        5.0, 32.5, "50000000000",
                        0.0, 0.0, "0", 0.0, 0.0, "0",
                        6.5, day + 1,
                    )
                )

        # stakings: 2 eras/day, Nominators rows with pv.targets arrays (A8)
        for day in range(N_DAYS):
            ts = _naive(T0 + timedelta(days=day, hours=12))
            for era in (1000 + day * 2, 1001 + day * 2):
                for v_idx, val in enumerate(ADDRS[:3]):
                    stakings.append(
                        (
                            SS58[val], val, "staking", "ErasStakers", None,
                            bn0 + day * BLOCKS_PER_DAY, None, ts, era, None, False,
                            10000.0 + era + v_idx, 1000.0, 0.1, None,
                            100 * (v_idx + 1), None, 50000.0, 600, None,
                            None, None, None, None, None, None, None, None,
                            json.dumps([SS58[a] for a in ADDRS[3:6]]), None,
                        )
                    )
                for nom in ADDRS[3:7]:
                    targets = [SS58[a] for a in ADDRS[: 2 + (int(nom[2:4], 16) % 2)]]
                    stakings.append(
                        (
                            SS58[nom], nom, "staking", "Nominators", None,
                            bn0 + day * BLOCKS_PER_DAY, None, ts, era, era - 10, False,
                            None, None, None, None, None, None, 50000.0, 600, None,
                            None, None, None, None, None, None, None, None,
                            json.dumps(targets), json.dumps({"targets": targets}),
                        )
                    )

    # ---- XCM fixtures (chain 0 → 2004 and back) ---------------------------
    xcmmessages, xcmtransfer, destcand = [], [], []
    base_sent = 15_000_000
    base_ts = int(T0.timestamp())
    for k in range(40):
        mh = "0x" + f"{k:064x}"
        s_sent = base_sent + k * 10
        s_ts = base_ts + k * 600
        lag = k % 6  # 0..5; >4 → unmatchable out-of-band pair
        src = (mh, 1000 + k, 0, 0, 2004, "hrmp" if k % 2 else "dmp", "polkadot",
               s_sent, s_ts, s_ts, None, 0, json.dumps({"hrmp": k}), None, None, None)
        dst = (mh, 5000 + k, 1, 0, 2004, "hrmp" if k % 2 else "dmp", "polkadot",
               s_sent + lag, s_ts + lag * 6, None, s_ts + lag * 6, 0,
               json.dumps({"hrmp": k}), None, None, None)
        xcmmessages.append(src)
        xcmmessages.append(dst)
        if k % 5 == 0:  # duplicate dest observation over consecutive blocks (U3)
            xcmmessages.append(dst[:1] + (5001 + k,) + dst[2:])
        if k % 7 == 0:  # ambiguous second candidate, farther in time (W2 tie-break)
            xcmmessages.append(
                (mh, 5002 + k, 1, 0, 2004, "hrmp" if k % 2 else "dmp", "polkadot",
                 s_sent + min(lag + 2, 4), s_ts + 60, None, s_ts + 60, 0,
                 json.dumps({"hrmp": k}), None, None, None)
            )

        # transfer-level: sent amount vs received+fee (J2 confidence)
        amt = 10**12 + k * 10**9
        fee = 10**8 + (k % 3) * 10**7
        xcmtransfer.append(
            ("0xe" + f"{k:063x}", f"{1000 + k}-2", 0, 0, 0, 2004, 1000 + k,
             SS58[ADDRS[k % 5]], SS58[ADDRS[(k + 1) % 12]], "DOT", "polkadot",
             Decimal(amt), amt / 1e10 * 6.5, s_ts, s_sent, mh, 0, 0)
        )
        if lag <= 4:
            exact = k % 3 != 1  # mix exact and inexact matches
            recv = amt - fee if exact else amt - fee - (k % 11) * 10**6
            destcand.append(
                (2004, mh, s_sent + lag, s_ts + lag * 6, 5000 + k,
                 Decimal(recv), Decimal(fee), SS58[ADDRS[11]], f"{5000 + k}-0-1", 0, 0,
                 f"{5000 + k}-0-0", f"{5000 + k}-0", SS58[ADDRS[k % 5]])
            )
    # stray candidate with no source
    destcand.append(
        (2004, "0x" + "ee" * 32, base_sent + 999, base_ts + 99999, 9999,
         Decimal(5 * 10**11), Decimal(10**8), SS58[ADDRS[11]], "9999-0-1", 0, 0, "9999-0-0",
         "9999-0", SS58[ADDRS[0]])
    )

    # ---- assetlog: 2 assets × 7 days × 300 s grid with gaps + ranks -------
    assetlog = []
    for asset, chain_id in (("DOT", 0), ("GLMR", 2004)):
        price = 6.5 if asset == "DOT" else 0.3
        for step in range(7 * 288):  # 7 days of 5-min buckets
            its = base_ts + step * 300
            if step % 37 == 11:  # gaps → as-of must look back (J3)
                continue
            price *= 1 + (rng.random() - 0.5) * 0.01
            for liquid in ([1] if step % 3 else [1, 2]):  # extra rank rows (W3)
                p = price * (1 + 0.001 * (liquid - 1))
                assetlog.append(
                    (asset, chain_id, "coingecko" if liquid == 1 else "onchain",
                     its, p, 1e6, 1e9,
                     p * 0.99, p * 1.01, p * 0.999, p * 1.001,
                     None, None, None, None, None, liquid)
                )

    return {
        "blocks": blocks,
        "blocks_raw": blocks_raw,
        "extrinsics": extrinsics,
        "events": events,
        "specversions": specversions,
        "balances": balances,
        "traces": traces,
        "stakings": stakings,
        "xcmmessages": xcmmessages,
        "xcmtransfer": xcmtransfer,
        "xcmtransferdestcandidate": destcand,
        "assetlog": assetlog,
    }


def write_fixtures(spark, out_dir: str) -> dict[str, str]:
    """Materialize fixture tables as parquet readable by Spark AND DuckDB."""
    paths = {}
    for name, rows in build_fixture_rows().items():
        df = spark.createDataFrame(rows, SCHEMAS[name])
        path = f"{out_dir}/{name}.parquet"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths
