"""Every registry query runs on Spark AND on the DuckDB oracle; results
must match exactly (row count, schema, canonicalized values) — the local
mirror of the driver's CORRECTNESS gate. Queries without oracle SQL get a
rows-materialize smoke check."""

from __future__ import annotations

import pytest

from polkadot_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR, compare_frames

NAMES = sorted(QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, oracle, name):
    spec = QUERIES[name]
    sdf = spec.build(spark, SF_DIR)
    spdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spdf) >= 0  # rows-only smoke: materializes without error
        return
    opdf = oracle.execute(spec.oracle).df()
    compare_frames(spdf, opdf, name)


@pytest.mark.parametrize(
    "name",
    [n for n in NAMES if n not in {"anti_join_no_urgent", "gap_detection", "duplicate_detection"}],
)
def test_query_nonempty(spark, name):
    """Queries must exercise real data — empty results would make the
    oracle gate vacuous. (Audit-style queries that legitimately find
    nothing at tiny SF are exempted.)"""
    spec = QUERIES[name]
    assert spec.build(spark, SF_DIR).limit(1).count() >= 1, f"{name} returned no rows"


def test_approx_distinct_within_tolerance(spark):
    """The HLL sketch must land within 5% of the exact count. The
    registry row now hash-gates (exact, within_5pct) — the raw estimate
    stays pinned HERE at the same tolerance, since the boolean alone
    can't show how close the sketch actually lands."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.queries import QUERIES
    from polkadot_etl_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "events")
    raw = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    for r in raw.collect():
        assert abs(r.approx_users - r.exact_users) <= max(1, 0.05 * r.exact_users), r
    rows = QUERIES["approx_distinct_users"].build(spark, SF_DIR).collect()
    assert rows and all(r.within_5pct for r in rows)


def test_ss58_codec_roundtrip_invariant(spark):
    """The VALUES oracle pins totals/length bounds; pin the per-address
    invariant here: every derived pubkey round-trips through ss58 for
    every prefix (count equality is necessary but not sufficient for
    per-row equality, which the VALUES oracle can't see)."""
    from polkadot_etl_spark.queries import QUERIES

    rows = QUERIES["ss58_codec_roundtrip"].build(spark, SF_DIR).collect()
    assert {r.prefix for r in rows} == {0, 2, 42}
    for r in rows:
        assert r.n_total == r.n_roundtrip_ok > 0, r


def test_documents_corpus_is_ascii(oracle):
    """The image_dhash_dedup / audio_energy_hash_dedup oracles compare
    DuckDB code points (unicode(substr(...))) against Spark UTF-8 bytes
    (encode(text,'utf-8')) — equivalent only while the corpus is ASCII.
    Pin that property so a generator change surfaces here, not as a
    silent hash divergence."""
    (n,) = oracle.execute(
        "SELECT count(*) FROM documents WHERE text != ''"
        " AND octet_length(encode(text)) != length(text)"
    ).fetchone()
    assert n == 0, f"{n} non-ASCII documents break the byte==codepoint oracles"


def test_approx_percentile_rank_interval_semantics(spark):
    """The GK rank-error card's local contract (the oracle pins the
    booleans TRUE; this pins that the Spark-side interval math is the
    tie-correct form and the tolerances are the documented n/100 + 1):
    recompute the rank interval of the sketch values directly and
    compare with the query's verdicts."""
    from pyspark.sql import functions as F

    from polkadot_etl_spark.queries import QUERIES
    from polkadot_etl_spark.sources.tables import load_table

    out = {
        r["l_returnflag"]: r
        for r in QUERIES["approx_percentile_rank_error"].build(spark, SF_DIR).collect()
    }
    l = load_table(spark, SF_DIR, "lineitem")
    ap = {
        r["l_returnflag"]: r["ap"]
        for r in l.groupBy("l_returnflag")
        .agg(F.percentile_approx("l_extendedprice", [0.5, 0.95], 100).alias("ap"))
        .collect()
    }
    for flag, row in out.items():
        assert row["p50_within_tol"] and row["p95_within_tol"], row
        n = row["n"]
        vals = [
            x["l_extendedprice"]
            for x in l.where(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        ]
        for q, v in ((0.5, ap[flag][0]), (0.95, ap[flag][1])):
            lo = sum(1 for x in vals if x < v)
            hi = sum(1 for x in vals if x <= v)
            assert lo <= q * n + n / 100 + 1 and hi >= q * n - n / 100 - 1, (
                flag,
                q,
                lo,
                hi,
                n,
            )
