"""The integrated chain-day dump — the reference's core product.

``dump_substrateetl`` (reference substrate/substrateetl.js:6171-6596) turns
one chain-day of raw blocks into ALL published tables in one idempotent
unit: blocks, extrinsics, events, calls, transfers, logs (silver), plus the
blocklog gold row with its gap audit.  This module is the Spark-first
composition of the same unit:

- logs: one row per digest log, log_id = "{bn}-{logIndex}"
  (substrateetl.js:6462-6473; schema substrate/schema/substrateetl/logs.json)
- calls/transfers: plans.decode (paramToCalls / processFeedTransfer)
- published blocks: header fields + child-table counts
  (substrateetl.js:6293-6309: extrinsic_count/event_count/transfer_count)
- validity filters before publish: events need data+section+method+event_id,
  extrinsics need string section/method (substrateetl.js:6480-6497)
- gap audit: block numbers missing from [bnStart, bnEnd] are flagged for
  re-crawl (substrateetl.js:6519-6529 found[]/crawlBlock=1)
- blocklog: (logDT, startBN, endBN, numBlocks, loaded, loadedMissingBlocks)
  upsert plus the per-day account/fee metrics of update_blocklog
  (substrateetl.js:6573-6596, :9369-9428)

Scale shape: every silver table is a narrow projection/explode of its
input — no shuffle except the per-day aggregates that build blocklog
(tiny, one row per chain-day) and the success semi-join inside
calls_from_extrinsics (key = extrinsic_id, the natural co-location key).
A re-run of one day overwrites exactly that day's partitions
(write_day_partitioned → dynamic partition overwrite), which is the
reference's `bq load --replace '$tbl$YYYYMMDD'` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polkadot_etl_spark.plans.decode import calls_from_extrinsics, transfers_from_events
from polkadot_etl_spark.sources.tables import write_day_partitioned


def _day_filter(df: DataFrame, log_dt: str | None, time_col: str = "block_time") -> DataFrame:
    """Restrict to one chain-day (minLogDT <= t <= maxLogDT,
    substrateetl.js:6190-6192). log_dt=None keeps every day — the same
    pipeline then backfills all days, partitioned by log_dt."""
    if log_dt is None:
        return df
    return df.where(F.to_date(F.col(time_col)) == F.lit(log_dt).cast("date"))


def logs_from_blocks(blocks_raw: DataFrame) -> DataFrame:
    """Silver logs table: hdr.digest.logs → one row per log with
    log_id = "{blockNumber}-{logIndex}" (substrateetl.js:6462-6473).
    posexplode keeps the digest order as the log index — map-side only,
    no shuffle."""
    pos = F.posexplode("digest_logs").alias("log_index", "log")
    return (
        blocks_raw.where(F.col("digest_logs").isNotNull())
        .select("number", "hash", "block_time", pos)
        .select(
            F.concat_ws("-", F.col("number"), F.col("log_index")).alias("log_id"),
            F.col("hash").alias("block_hash"),
            F.col("block_time"),
            F.col("number").alias("block_number"),
            F.col("log"),
        )
    )


def published_blocks(
    blocks_raw: DataFrame, extrinsics: DataFrame, events: DataFrame, transfers: DataFrame
) -> DataFrame:
    """Published blocks = header fields + counts derived from the child
    tables (substrateetl.js:6293-6309 builds the counts while scanning the
    block; deriving them from the published children keeps the two
    consistent by construction). Counts join on block_number — with AQE the
    three tiny per-block aggregates broadcast."""

    def _cnt(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(F.col("block_number").alias("__bn")).agg(F.count(F.lit(1)).alias(name))

    b = blocks_raw
    for child, name in (
        (extrinsics, "extrinsic_count"),
        (events, "event_count"),
        (transfers, "transfer_count"),
    ):
        c = _cnt(child, name)
        b = b.join(c, b.number == c.__bn, "left").drop("__bn")
    return b.select(
        "hash",
        "parent_hash",
        "number",
        "state_root",
        "extrinsics_root",
        "block_time",
        "author_ss58",
        "author_pub_key",
        "spec_version",
        "relay_block_number",
        "relay_state_root",
        F.coalesce("extrinsic_count", F.lit(0)).cast("int").alias("extrinsic_count"),
        F.coalesce("event_count", F.lit(0)).cast("int").alias("event_count"),
        F.coalesce("transfer_count", F.lit(0)).cast("int").alias("transfer_count"),
        F.lit(0).alias("trace_count"),
    )


def gap_audit(blocks: DataFrame, number_col: str = "number") -> DataFrame:
    """Explicit missing block numbers per day — the rows the reference
    marks crawlBlock=1 for (substrateetl.js:6519-6529). Scope is ONE
    chain (dump_substrateetl runs per chainID); callers filter multi-chain
    bronze first. Requires the chain's property that a day's blocks are
    contiguous in [bnStart, bnEnd]; the per-day sequence explode is
    bounded by blocks/day (~14k at 6s blocks), so this stays a small
    map-side expansion even at 100 TB total history."""
    day = blocks.groupBy(F.to_date("block_time").alias("log_dt")).agg(
        F.min(number_col).alias("bn_start"), F.max(number_col).alias("bn_end")
    )
    expected = day.select(
        "log_dt", F.explode(F.sequence("bn_start", "bn_end")).alias("block_number")
    )
    present = blocks.select(
        F.to_date("block_time").alias("log_dt"), F.col(number_col).alias("block_number")
    )
    return expected.join(present, ["log_dt", "block_number"], "left_anti")


def blocklog_gold(
    blocks: DataFrame,
    extrinsics: DataFrame,
    events: DataFrame,
    calls: DataFrame,
    transfers: DataFrame,
    logs: DataFrame,
) -> DataFrame:
    """Gold blocklog row per chain-day (substrateetl.js:6573-6596 insert +
    :9369-9428 update_blocklog metrics): block range, gap count, table
    cardinalities, fee/signer metrics, and the loaded flag that only goes
    green when no block is missing. Six tiny per-day aggregates joined on
    log_dt — each input is touched once with a map-side partial agg.

    ``blocks`` only needs (number, block_time): pass the RAW blocks frame,
    not the published one — the published frame embeds three child-count
    joins that the per-day min/max/count here would silently re-execute
    (published blocks are a 1:1 projection of raw, so the stats are
    identical either way)."""
    day = lambda df, col="block_time": df.groupBy(F.to_date(col).alias("log_dt"))  # noqa: E731

    b = day(blocks).agg(
        F.min("number").alias("start_bn"),
        F.max("number").alias("end_bn"),
        F.count(F.lit(1)).alias("num_blocks"),
    )
    e = day(extrinsics).agg(
        F.count(F.lit(1)).alias("num_extrinsics"),
        F.count(F.when(F.col("signed"), 1)).alias("num_signed_extrinsics"),
        F.countDistinct(F.when(F.col("signed"), F.col("signer_pub_key"))).alias(
            "num_active_signers"
        ),
        F.sum(F.when(F.col("signed"), F.col("fee")).cast("decimal(38,10)"))
        .cast("string")
        .cast("double")
        .alias("fees"),
    )
    ev = day(events).agg(F.count(F.lit(1)).alias("num_events"))
    ca = day(calls).agg(F.count(F.lit(1)).alias("num_calls"))
    tr = day(transfers).agg(F.count(F.lit(1)).alias("num_transfers"))
    lg = day(logs).agg(F.count(F.lit(1)).alias("num_logs"))

    out = b
    for other in (e, ev, ca, tr, lg):
        out = out.join(other, "log_dt", "left")
    missing = F.col("end_bn") - F.col("start_bn") + 1 - F.col("num_blocks")
    return out.select(
        "log_dt",
        "start_bn",
        "end_bn",
        "num_blocks",
        missing.alias("num_missing"),
        F.coalesce("num_extrinsics", F.lit(0)).alias("num_extrinsics"),
        F.coalesce("num_signed_extrinsics", F.lit(0)).alias("num_signed_extrinsics"),
        F.coalesce("num_active_signers", F.lit(0)).alias("num_active_signers"),
        F.col("fees"),
        F.coalesce("num_events", F.lit(0)).alias("num_events"),
        F.coalesce("num_calls", F.lit(0)).alias("num_calls"),
        F.coalesce("num_transfers", F.lit(0)).alias("num_transfers"),
        F.coalesce("num_logs", F.lit(0)).alias("num_logs"),
        (missing == 0).alias("loaded"),
    )


def dump_day(
    blocks_raw: DataFrame,
    extrinsics: DataFrame,
    events: DataFrame,
    relay_chain: str = "polkadot",
    para_id: int = 0,
    log_dt: str | None = None,
    native_symbol: str = "DOT",
    native_decimals: int = 10,
    ss58_prefix: int = 0,
    chain_id: int | None = None,
    share_bronze: bool = False,
) -> dict[str, DataFrame]:
    """One chain-day of bronze → every published table + gold, the unit of
    (re)processing (dump_substrateetl, substrateetl.js:6171-6596).

    When ``chain_id`` is given, the per-chain parser plugin is resolved
    and supplies the native-token config AND the transfer semantics —
    e.g. acala's per-asset decimalization, moonbeam's 18-decimal native —
    exactly like indexer.js:6697-6755 setup_chainParser runs before any
    processing. The explicit keyword config remains for chains with no
    registered parser.

    ``share_bronze=True`` materializes the day-filtered bronze frames once
    (eager localCheckpoint) before fan-out. Spark does not share common
    subplans across the branches of one plan, so without it every derived
    table re-executes the bronze read+parse — ~6 redundant passes when the
    caller materializes blocklog (which folds in all six silvers). The
    default stays lazy for callers that pick a single output table, where
    Catalyst's column pruning into one scan is the better plan.

    Returns {blocks, extrinsics, events, calls, transfers, logs, blocklog,
    gap_audit}. Frames are lazy unless share_bronze — callers pick which
    to materialize or hand the dict to write_dump() for the idempotent
    partition-replace publish."""
    braw = _day_filter(blocks_raw, log_dt)
    ext = _day_filter(extrinsics, log_dt)
    ev = _day_filter(events, log_dt)

    # validity gates before publishing (substrateetl.js:6480-6497)
    ev_pub = ev.where(
        F.col("data").isNotNull()
        & F.col("section").isNotNull()
        & F.col("method").isNotNull()
        & F.col("event_id").isNotNull()
    )
    ext_pub = ext.where(F.col("section").isNotNull() & F.col("method").isNotNull())

    if share_bronze:
        braw = braw.localCheckpoint(eager=True)
        ext_pub = ext_pub.localCheckpoint(eager=True)
        ev_pub = ev_pub.localCheckpoint(eager=True)

    calls = calls_from_extrinsics(ext_pub, ev_pub, relay_chain, para_id)
    if chain_id is not None:
        from polkadot_etl_spark.plans.chains import get_parser

        transfers = get_parser(chain_id).transfers(ev_pub)
    else:
        transfers = transfers_from_events(
            ev_pub,
            native_symbol=native_symbol,
            native_decimals=native_decimals,
            ss58_prefix=ss58_prefix,
        )
    logs = logs_from_blocks(braw)
    blocks = published_blocks(braw, ext_pub, ev_pub, transfers)
    # gold's block stats come from RAW blocks: the published frame embeds
    # three child-count joins whose results gold never reads, and Spark
    # has no rule to eliminate an unused left join — aggregating braw
    # keeps those joins out of the gold plan entirely.
    gold = blocklog_gold(braw, ext_pub, ev_pub, calls, transfers, logs)
    return {
        "blocks": blocks,
        "extrinsics": ext_pub,
        "events": ev_pub,
        "calls": calls,
        "transfers": transfers,
        "logs": logs,
        "blocklog": gold,
        "gap_audit": gap_audit(braw),
    }


def write_dump(tables: dict[str, DataFrame], base_path: str) -> None:
    """Publish a dump_day result set day-partitioned with dynamic partition
    overwrite — re-running a day replaces exactly that day in every table
    (the reference's `bq load --replace` + blocklog upsert,
    substrateetl.js:6553-6580)."""
    for name in ("blocks", "extrinsics", "events", "calls", "transfers", "logs"):
        write_day_partitioned(
            tables[name],
            f"{base_path}/{name}",
            time_col="block_time",
            cluster_by=["block_number"] if name != "blocks" else ["number"],
        )
