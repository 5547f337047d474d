"""JVM-native Column helpers — the fast path of the expression zoo.

These stay inside whole-stage codegen (no Python): decimal scaling, time
bucketing, descending row keys, JSON field access. Reference counterparts
noted per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_base_unit(raw: Column, decimals: Column | int) -> Column:
    """raw u128 (decimal/long) → float amount = raw / 10^decimals
    (paraTool.toBaseUnit, :214). Stays decimal until the final division."""
    d = F.lit(decimals) if isinstance(decimals, int) else decimals
    return (raw.cast("decimal(38,0)") / F.pow(F.lit(10.0), d)).cast("double")


def ts_to_log_dt(ts: Column) -> Column:
    """epoch-seconds → 'YYYY-MM-DD' UTC (paraTool.ts_to_logDT_hr, :1463)."""
    return F.date_format(F.timestamp_seconds(ts), "yyyy-MM-dd")


def log_dt_hr(ts: Column) -> tuple[Column, Column]:
    t = F.timestamp_seconds(ts)
    return F.date_format(t, "yyyy-MM-dd"), F.hour(t)


def inverted_ts_key(ts: Column) -> Column:
    """Zero-padded (MAX-ts) descending key (paraTool.js:581-594) — export
    compatibility only; Spark sorts natively."""
    return F.lpad((F.lit(99999999999) - ts.cast("long")).cast("string"), 11, "0")


def json_field(col: Column, path: str) -> Column:
    """JSON scalar access — the engine-side JSON_EXTRACT_SCALAR
    (docs/AccountAnalytics.md:17-20)."""
    return F.get_json_object(col, f"$.{path}")


def parse_section_method(sm: Column) -> tuple[Column, Column]:
    """'section:method' → (section, method) (paraTool.parseSectionMethod)."""
    return F.split(sm, ":").getItem(0), F.split(sm, ":").getItem(1)


def is_transfer_event(section: Column, method: Column) -> Column:
    """Transfer-event classifier (paraTool.is_transfer_event, :483;
    transfer pallets per indexer.js:6334)."""
    sm = F.concat_ws(":", section, method)
    return sm.isin(
        "balances:Transfer",
        "currencies:Transferred",
        "assets:Transferred",
        "tokens:Transfer",
    )
