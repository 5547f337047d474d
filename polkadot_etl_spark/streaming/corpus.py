"""Streaming corpus ingestion — the training-data acquisition path as
Structured Streaming (beyond-reference, first-class per the brief; the
LLM-data sibling of the block pipeline in streaming/pipeline.py).

A document stream (NDJSON files — the same source form the reference's
WS-bridge ingest uses) passes the REAL batch quality gate map-side
(queries/llmdata.gopher_signals: the identical column expressions the
oracle-gated gopher_repetition query runs), then dedups EXACTLY against
a standing digest ledger via ``applyInPandasWithState`` keyed on the
content digest — the crawl's streaming first-occurrence rule: the first
arrival of a content hash is canonical, every later arrival (same batch
or any later batch) is flagged a duplicate of it. Per-batch funnel
accounting lands through an idempotent foreachBatch sink (one file per
batch_id, overwritten on replay — the X6 discipline).

Equivalence contract (tested in tests/test_streaming_corpus.py): when
doc_ids arrive in non-decreasing order across batches (a crawl's
monotone ids), the stream's canonical assignment equals the BATCH
dedup_exact query's (min-doc_id-per-digest) — each micro-batch group
processes its rows in doc_id order and the state pins the first
canonical forever after. Under out-of-order arrival the semantics are
explicitly FIRST-ARRIVAL-WINS (the streaming-native rule; also tested),
which is the difference a replay/backfill must account for.

Scale notes: state is one (canonical_id, n_seen) pair per DISTINCT
digest — the ledger dedup_incremental_batch materializes as a table,
held as streaming state instead; digest-keyed partitioning is the same
shuffle key the batch plan uses. An optional processing-time timeout
expires cold digests for bounded-state deployments (accepting re-admits
after expiry, exactly like a TTL'd frontier Bloom).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("is_first", T.BooleanType(), False),
        T.StructField("canonical_id", T.LongType(), False),
    ]
)

_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("canonical_id", T.LongType(), True),
        T.StructField("n_seen", T.LongType(), True),
    ]
)


def document_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """NDJSON document stream (one JSON object per line, schema-pinned,
    malformed lines dropped — the same contract as the block ingest)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )


def quality_gated(docs: DataFrame) -> DataFrame:
    """The batch Gopher gate applied to the stream (SHARED
    gopher_signals expressions — row-local, so streaming-legal) plus the
    content digest the dedup state keys on."""
    from polkadot_etl_spark.queries.llmdata import gopher_signals

    return gopher_signals(docs).select(
        "doc_id",
        "source",
        "keep",
        F.md5(F.lower(F.trim("text"))).alias("digest"),
    )


def make_dedup(state_ttl_ms: int | None = None):
    """The per-digest first-occurrence dedup function for
    applyInPandasWithState. State: (canonical_id, n_seen); rows process
    in doc_id order inside a batch so canonical = min doc_id of the
    first batch that carries the digest — the batch dedup_exact rule,
    incrementally."""

    def dedup(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        canonical, n_seen = state.get if state.exists else (None, 0)
        # concat the chunk iterator BEFORE sorting: a group spanning
        # multiple Arrow chunks sorted per-chunk would pin the FIRST
        # CHUNK's min as canonical, not the batch min — breaking the
        # in-order batch-rule equivalence for large duplicate groups
        chunks = list(pdfs)
        batch = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(batch):
            batch = batch.sort_values("doc_id")
            out = []
            for row in batch.itertuples(index=False):
                first = canonical is None
                if first:
                    canonical = int(row.doc_id)
                n_seen += 1
                out.append(
                    {
                        "doc_id": int(row.doc_id),
                        "digest": row.digest,
                        "source": row.source,
                        "keep": bool(row.keep),
                        "is_first": first,
                        "canonical_id": canonical,
                    }
                )
            yield pd.DataFrame(out)
        state.update((canonical, n_seen))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)

    return dedup


def dedup_first_occurrence(
    gated: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return gated.groupBy("digest").applyInPandasWithState(
        make_dedup(state_ttl_ms),
        DEDUP_OUT_SCHEMA,
        _DEDUP_STATE_SCHEMA,
        "append",
        timeout,
    )


def ingest_accounting_sink(state_dir: str):
    """foreachBatch sink: one JSON accounting file PER batch_id
    (n_in / n_quality / n_unique / per-source rows), overwritten on
    replay — re-running a batch lands byte-identical state (X6)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_in"),
                F.sum(F.col("keep").cast("long")).alias("n_quality"),
                F.sum(F.col("is_first").cast("long")).alias("n_unique"),
            )
            .collect()
        )
        os.makedirs(state_dir, exist_ok=True)
        # source is nullable (DOC_STREAM_SCHEMA): a None key next to
        # string keys makes json.dump(sort_keys=True) raise TypeError and
        # kill the streaming query — sentinel it. A real source literally
        # named like the sentinel would collide with the null row and
        # silently lose one accounting row; that must be LOUD instead.
        sources: dict = {}
        for r in rows:
            k = r["source"] if r["source"] is not None else "__null__"
            if k in sources:
                raise ValueError(
                    f"accounting key collision on {k!r}: a literal source"
                    " named like the null sentinel would silently merge"
                    " with the null-source row"
                )
            sources[k] = {
                "n_in": r["n_in"],
                "n_quality": r["n_quality"],
                "n_unique": r["n_unique"],
            }
        payload = {"batch_id": batch_id, "sources": sources}
        path = os.path.join(state_dir, f"batch-{batch_id:08d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh, sort_keys=True)
        os.replace(tmp, path)

    return _apply


def corpus_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    accounting_dir: str,
    state_ttl_ms: int | None = None,
):
    """The composed ingest: stream -> shared quality gate -> stateful
    first-occurrence dedup -> idempotent per-batch accounting sink.
    Returns the StreamingQuery."""
    deduped = dedup_first_occurrence(
        quality_gated(document_stream(spark, source_dir)), state_ttl_ms
    )
    return (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(ingest_accounting_sink(accounting_dir))
        .start()
    )
