"""streaming/neardedup.py — banded MinHash rosters as streaming state:
near-duplicates flag online across batches, buckets cap with visible
accounting, and the per-doc consolidation picks the best partner."""

from __future__ import annotations

import json
import pathlib

from polkadot_etl_spark.streaming.neardedup import (
    MIN_AGREE,
    consolidate_verdicts,
    make_band_matcher,
    near_dedup_stream,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = "alpha beta gamma delta epsilon zeta eta theta iota lambda"  # last word differs
OTHER = "one two three four five six seven eight nine ten eleven twelve"


def _write_ndjson(path: pathlib.Path, rows: list[dict]) -> None:
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run(spark, src_dir, name):
    from pyspark.sql import functions as F

    from polkadot_etl_spark.streaming.corpus import DOC_STREAM_SCHEMA

    docs = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
        .where(F.col("doc_id").isNotNull())
    )
    q = (
        near_dedup_stream(docs)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_near_dup_flags_online_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_ndjson(
        src / "a.json",
        [
            {"doc_id": 1, "text": BASE, "lang": "en", "source": "s0"},
            {"doc_id": 2, "text": OTHER, "lang": "en", "source": "s0"},
        ],
    )
    _write_ndjson(
        src / "b.json",
        [
            {"doc_id": 10, "text": BASE, "lang": "en", "source": "s1"},   # exact
            {"doc_id": 11, "text": NEAR, "lang": "en", "source": "s1"},   # near
            # appended-word variant of batch-1's doc 2 — a near-dup of a
            # DIFFERENT earlier doc (the operator caught this when the
            # test first mislabeled it unrelated)
            {"doc_id": 12, "text": OTHER + " more", "lang": "en", "source": "s1"},
            {"doc_id": 13, "text": "zulu yankee xray whiskey victor uniform"
                                   " tango sierra romeo quebec", "lang": "en",
             "source": "s1"},
        ],
    )
    band_rows = _run(spark, src, "neardedup_e2e")
    v = {r["doc_id"]: r.asDict() for r in consolidate_verdicts(band_rows).collect()}
    # batch-1 docs saw empty rosters
    assert v[1]["near_dup_of"] is None and v[2]["near_dup_of"] is None
    # exact copy across batches: all 4 slices agree, partner = 1
    assert v[10]["near_dup_of"] == 1 and v[10]["n_agree"] == 4
    # one-word change: enough band minima survive to cross MIN_AGREE
    assert v[11]["near_dup_of"] == 1 and v[11]["n_agree"] >= MIN_AGREE
    # appended-word variant flags against its OWN earlier partner
    assert v[12]["near_dup_of"] == 2 and v[12]["n_agree"] >= MIN_AGREE
    # genuinely unrelated vocabulary stays clean
    assert v[13]["near_dup_of"] is None
    # nothing hot enough to hit the cap in this fixture
    assert all(r["dropped_bands"] == 0 for r in v.values())


def test_consolidate_threads_min_agree(spark):
    """A matcher tuned to min_agree=1 must see its matches SURVIVE
    consolidation: with the module default hardcoded there, a 1-slice
    agreement was reported upstream then silently discarded
    (near_dup_of null despite n_agree=1)."""
    band_rows = spark.createDataFrame(
        [(7, 3, 1, True), (7, None, None, True),
         (7, None, None, True), (7, None, None, True)],
        "doc_id long, matched_id long, n_agree int, admitted boolean",
    )
    strict = {r["doc_id"]: r for r in consolidate_verdicts(band_rows).collect()}
    loose = {
        r["doc_id"]: r
        for r in consolidate_verdicts(band_rows, min_agree=1).collect()
    }
    assert strict[7]["near_dup_of"] is None  # default MIN_AGREE=2 gate
    assert loose[7]["near_dup_of"] == 3 and loose[7]["n_agree"] == 1


def test_band_matcher_direct_cap_and_order():
    import pandas as pd

    class FakeState:
        hasTimedOut = False
        exists = False
        updated = None

        def update(self, v):
            self.updated = v
            self.exists = True

        def setTimeoutDuration(self, ms):  # pragma: no cover
            raise AssertionError("no TTL configured")

    sig_a = "aaaaaaaa" * 4
    sig_b = "aaaaaaaa" + "bbbbbbbb" * 3   # agrees with A on 1 slice only
    sig_c = "aaaaaaaa" * 2 + "cccccccc" * 2  # agrees with A on 2 slices
    st = FakeState()
    pdf = pd.DataFrame(
        [
            {"doc_id": 3, "sig": sig_a},
            {"doc_id": 1, "sig": sig_b},   # processes FIRST (doc_id order)
            {"doc_id": 5, "sig": sig_c},
        ]
    )
    out = pd.concat(list(make_band_matcher(cap=2)(("0", "k"), iter([pdf]), st)))
    rows = {int(r.doc_id): r for r in out.itertuples(index=False)}
    # doc 1 first: empty roster, no match, admitted (pandas renders the
    # missing id as NaN)
    assert pd.isna(rows[1].matched_id) and rows[1].admitted
    # doc 3: vs roster [1]: 1 slice agree < MIN_AGREE -> no match; admitted
    assert pd.isna(rows[3].matched_id) and rows[3].admitted
    # doc 5: vs roster [1, 3]: matches 3 on 2 slices; cap=2 -> NOT admitted
    assert rows[5].matched_id == 3 and rows[5].n_agree == 2
    assert not rows[5].admitted
    # roster persisted without doc 5
    assert json.loads(st.updated[0]) == [[1, sig_b], [3, sig_a]]


def test_band_matcher_timeout_removes_roster():
    class FakeState:
        hasTimedOut = True
        exists = True
        get = (json.dumps([[1, "x" * 32]]),)
        removed = False

        def remove(self):
            self.removed = True

    st = FakeState()
    out = list(make_band_matcher(state_ttl_ms=500)(("0", "k"), iter([]), st))
    assert st.removed and out == []
