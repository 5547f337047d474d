"""Dune connector surface — the three ways the reference touches Dune:

- RESULT PULLS: `api.dune.com/api/v1/query/<id>/results/csv?limit=N`
  with the X-Dune-API-Key header (substrate/dune.js:9-19 fetchData;
  the same endpoint assethublog.js ingests — see the
  `assethub_price_log` registry query for that parse);
- FRESHNESS MONITORING: four pulled feeds (stakings/ingestions/
  snapshots/balances) become per-chain staleness checks against
  per-feed thresholds with a Slack alert (dune.js:21-159) —
  `staleness_report` is that logic as a DataFrame op (driver-gated via
  the `dune_freshness_alerts` registry query);
- CSV UPLOADS: POST /api/v1/table/upload/csv with a
  {table_name, description, is_private, data} payload
  (test/dune_upload.js:16-30) — `upload_payload` builds the exact
  body; the HTTP POST itself is environment (no network here), the
  same partial-by-environment pattern as sources/jdbc.py and
  sources/bigquery.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-feed staleness thresholds in HOURS (dune.js): ingestions > 3
# (:60), snapshots > 27 (:84), balances > 25 (:108); stakings is
# per-chain — kusama > 24, polkadot > 72 — and ONLY those two chains
# alert (:32-36).
FEED_THRESHOLDS_HOURS = {
    "ingestions": 3,
    "snapshots": 27,
    "balances": 25,
}
STAKINGS_THRESHOLDS_HOURS = {"kusama": 24, "polkadot": 72}


def dune_result_csv_url(query_id: int, limit: int = 1000) -> str:
    """dune.js:24 / assethublog.js:25 result-pull URL."""
    return f"https://api.dune.com/api/v1/query/{query_id}/results/csv?limit={limit}"


def upload_payload(
    table_name: str, description: str, csv_text: str, is_private: bool = False
) -> dict:
    """test/dune_upload.js:22-27 upload body, byte-for-byte fields."""
    return {
        "table_name": table_name,
        "description": description,
        "is_private": is_private,
        "data": csv_text,
    }


def _hours_stale(last_block_time: Column, as_of: Column) -> Column:
    """Math.round((now - blockTime) / 3600000) (dune.js:31) — half-up
    rounding of the hour difference, identical for the positive lags
    the monitor sees."""
    return F.round(
        (F.unix_timestamp(as_of) - F.unix_timestamp(last_block_time)) / 3600.0, 0
    ).cast("long")


def staleness_report(feeds: DataFrame, as_of: str) -> DataFrame:
    """(feed, chain_id, last_block_time) → alert rows.

    Reference rules (dune.js get_slow*):
    - hours = round((as_of − last_block_time) / 1h);
    - stakings: ONLY kusama (> 24 h) and polkadot (> 72 h) can alert —
      any other chain in that feed never does (:32-36);
    - ingestions / snapshots / balances: one flat threshold each;
    - NULL last_block_time rows are skipped (:30 `if (lastBlockTime)`);
    - the alert message keeps the reference's two formats:
      '<chain> (<N> hrs)' for stakings/ingestions, '<chain> (<N> hours
      old)' for snapshots/balances (:33 vs :85).

    ``as_of`` replaces the reference's wall-clock `currentTime`
    (dune.js:5) so the check is deterministic/replayable — production
    passes the scheduler tick. Pure column math, zero shuffle."""
    hours = _hours_stale(F.col("last_block_time"), F.lit(as_of).cast("timestamp"))
    thr = F.when(
        F.col("feed") == "stakings",
        F.when(F.col("chain_id") == "kusama", F.lit(24))
        .when(F.col("chain_id") == "polkadot", F.lit(72)),
    )
    for feed, h in FEED_THRESHOLDS_HOURS.items():
        thr = thr.when(F.col("feed") == feed, F.lit(h))
    msg = F.when(
        F.col("feed").isin("stakings", "ingestions"),
        F.concat(F.col("chain_id"), F.lit(" ("), F.col("hours_stale").cast("string"), F.lit(" hrs)")),
    ).otherwise(
        F.concat(
            F.col("chain_id"), F.lit(" ("), F.col("hours_stale").cast("string"),
            F.lit(" hours old)"),
        )
    )
    return (
        feeds.where(F.col("last_block_time").isNotNull())
        .select("feed", "chain_id", hours.alias("hours_stale"), thr.alias("__thr"))
        .where(F.col("__thr").isNotNull() & (F.col("hours_stale") > F.col("__thr")))
        .select("feed", "chain_id", "hours_stale", msg.alias("message"))
    )
