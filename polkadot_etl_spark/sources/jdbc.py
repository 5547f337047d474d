"""MySQL/JDBC read planning (SURVEY §2.1 S3).

The reference reads its MySQL hot tables with hand-written point/range
SQL (paraTool.pool queries over keyed tables: xcmtransfer by sourceTS
range, chain by chainID point, address rows by prefix).  The Spark-first
equivalent is spark.read.jdbc with an explicit PARTITION PLAN so a range
read fans out across executors instead of funneling through one
connection:

- numeric/temporal keys → stride partitioning (the same semantics as
  Spark's JDBCRelation.columnPartition: N contiguous strides, first/last
  unbounded so rows outside the sampled [lo, hi] are still captured);
- point reads and IN-lists → one predicate per key (each predicate
  becomes one partition);
- day ranges → one predicate per day, matching the reference's
  per-logDT dump queries (substrateetl.js dump_* WHERE sourceTS >=
  UNIX_TIMESTAMP(DATE(...)) AND < next day).

No database ships in this environment, so the *planner* is the tested
surface (pure functions below); `read_jdbc_partitioned` is the thin
spark.read.jdbc binding that consumes it unchanged on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stride_predicates(
    column: str, lower: int, upper: int, num_partitions: int
) -> list[str]:
    """Contiguous stride WHERE clauses covering the whole key line.

    Mirrors Spark's JDBCRelation.columnPartition semantics: strides split
    [lower, upper); the FIRST partition is open below (captures rows
    under the sampled lower bound, including NULLs via IS NULL) and the
    LAST is open above — the sampled bounds never silently drop rows.
    Every key matches exactly one predicate.
    """
    if num_partitions <= 1 or lower >= upper:
        return [f"1=1"]
    n = min(num_partitions, max(upper - lower, 1))
    stride = (upper - lower) // n
    bounds = [lower + i * stride for i in range(1, n)]
    preds = []
    prev: int | None = None
    for b in bounds:
        if prev is None:
            preds.append(f"{column} < {b} OR {column} IS NULL")
        else:
            preds.append(f"{column} >= {prev} AND {column} < {b}")
        prev = b
    preds.append(f"{column} >= {prev}")
    return preds


def point_predicates(column: str, keys: list) -> list[str]:
    """One partition per point key (the reference's point reads: chain by
    chainID, account by address).  String keys are quoted with doubled
    single quotes (no driver-side interpolation of untrusted text beyond
    that — keys come from our own dims)."""

    def fmt(k):
        if isinstance(k, str):
            escaped = k.replace("'", "''")
            return f"'{escaped}'"
        return str(k)

    return [f"{column} = {fmt(k)}" for k in keys]


def day_range_predicates(column: str, start_day: str, n_days: int) -> list[str]:
    """One partition per day over an epoch-seconds column — the
    reference's per-logDT dump query shape (WHERE ts >= UNIX_TIMESTAMP(
    DATE(d)) AND ts < UNIX_TIMESTAMP(DATE_ADD(d, INTERVAL 1 DAY)))."""
    import datetime

    d0 = datetime.date.fromisoformat(start_day)
    epoch = datetime.date(1970, 1, 1)
    preds = []
    for i in range(n_days):
        lo = ((d0 - epoch).days + i) * 86400
        preds.append(f"{column} >= {lo} AND {column} < {lo + 86400}")
    return preds


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
_DERBY_SEEDED: dict[tuple[str, str], str] = {}  # (sf_dir, table) -> jdbc url


def derby_seeded_url(
    spark: SparkSession, df: DataFrame, sf_dir: str, table: str
) -> str:
    """Seed an embedded Apache Derby database with ``df`` through
    spark's OWN JDBC sink and return the url for reading it back — the
    sandbox-local stand-in for the reference's live MySQL (substrate/
    polkaholicDB.js): no database server ships in this environment, but
    the Derby jars ship inside pyspark itself, so BOTH halves of the
    JDBC binding (DataFrameWriter.jdbc -> Derby -> spark.read.jdbc with
    an explicit partition plan) execute for real. Embedded Derby lives
    inside the driver JVM — fine on local[N] where executors share it;
    on a real cluster this helper is test scaffolding and the url
    points at the actual MySQL/Postgres instead.

    Seeding happens once per (process, sf_dir, table); derby.system.home
    is pointed at the scratch dir BEFORE the first connection so
    derby.log never lands in the repo."""
    key = (sf_dir, table)
    if key not in _DERBY_SEEDED:
        import os
        import tempfile

        base = tempfile.mkdtemp(prefix="spark_derby_")
        spark._jvm.java.lang.System.setProperty("derby.system.home", base)
        url = f"jdbc:derby:{os.path.join(base, 'db')};create=true"
        df.write.jdbc(
            url=url, table=table, mode="overwrite",
            properties={"driver": DERBY_DRIVER},
        )
        _DERBY_SEEDED[key] = url
    return _DERBY_SEEDED[key]


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str],
    properties: dict | None = None,
) -> DataFrame:
    """spark.read.jdbc with an explicit partition plan: each predicate
    becomes one partition/connection. Planner output from the functions
    above feeds straight in; JVM-side the filters also push into the
    remote query (PushedFilters), so the DB does the pruning."""
    return spark.read.jdbc(
        url=url, table=table, predicates=predicates, properties=properties or {}
    )
