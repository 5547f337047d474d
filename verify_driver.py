"""Local simulation of the external correctness gate.

Builds a PLAIN SparkSession exactly like the driver does (not
polkadot_etl_spark.session — the guard under test is that load_table
force-resets the session timezone and nanos handling itself), runs every
query in the driver's 50-slot window (or --all / an explicit name list)
against the DuckDB oracle at --sf-dir, and prints one PASS/FAIL line per
query using the same canonical comparison as tests/conftest.py.

--tz lets you probe a non-UTC driver session (e.g. America/Los_Angeles),
which catches date-bucketing queries that forgot the UTC guard.

Usage:
    python verify_driver.py                        # window @ sf0.01
    python verify_driver.py --all                  # whole registry
    python verify_driver.py --tz America/Los_Angeles
    python verify_driver.py audit_row_counts bpe_encode_vocab
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="explicit query names (default: the 50-slot window)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true", help="run the whole registry")
    ap.add_argument("--tz", default=None, help="driver session timezone override")
    ap.add_argument(
        "--shuffle-partitions",
        default="32",
        help="partition-invariance probe: results must not depend on "
        "parallelism (pair with SPARK_GRAFT_CPUS=8 for the local[8] sweep)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", args.shuffle_partitions)
        .config("spark.ui.enabled", "false")
    )
    if args.tz:
        b = b.config("spark.sql.session.timeZone", args.tz)
    spark = b.getOrCreate()

    import duckdb

    import __spark_entry__ as entrymod

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from conftest import normalize_frame

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    n = len(entrymod.entry(spark).collect())
    print(f"entry: {n} rows {'PASS' if n > 0 else 'FAIL'}")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = args.names or (sorted(qs) if args.all else list(qs)[:50])
    fails: list[str] = []
    t0 = time.time()
    for name in names:
        try:
            spdf = qs[name](spark, args.sf_dir).toPandas()
            if name not in osql:
                print(f"  {name}: no_oracle rows={len(spdf)}")
                continue
            ok = normalize_frame(spdf) == normalize_frame(con.execute(osql[name]).df())
        except Exception as ex:  # surface the query name with its error
            ok = False
            print(f"  {name}: ERROR {ex}")
        if not ok:
            fails.append(name)
            print(f"  {name}: FAIL")
        else:
            print(f"  {name}: PASS rows={len(spdf)}")
    print(
        f"{len(names)} queries in {time.time() - t0:.1f}s — "
        + ("ALL PASS" if not fails else f"FAILS: {fails}")
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
