"""Shared bounded-replay fixture harness for the streaming gate queries.

Three oracle-gated queries replay bounded NDJSON streams through the REAL
streaming machines (streaming_corpus_replay / streaming_neardedup_replay
over documents, streaming_dump_replay over block candidates, and the
composed daily-increment pipeline). Each used to carry its own copy of
the same two fixture idioms; this module is the ONE definition (the
refactor the r10 review deferred until the replay queries rotated back
through the driver window — r11, per the staleness rule):

- ``write_ndjson_waves``: materialize arrival WAVES as one NDJSON file
  each with FORCED-DISTINCT ascending mtimes, so FileStreamSource's
  oldest-first ordering pins the batch sequence (with
  ``maxFilesPerTrigger=1``, wave i IS micro-batch i — the property the
  incremental-state seams are exercised through);
- ``collect_bounded_stream``: run a bounded stream to completion,
  collecting every micro-batch via foreachBatch into one pandas frame.

Both are fixture plumbing, not operators: the machines under test live
in streaming/{corpus,neardedup,pipeline}.py.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame


def write_ndjson_waves(work: str, waves: "list[list[str]]") -> str:
    """Write each wave (a list of already-serialized JSON lines) as
    ``<work>/src/wave-NN.json`` with ascending mtimes one second apart
    (anchored an hour in the past so a same-second collision with file
    creation time is impossible). Empty waves are skipped — wave
    NUMBERING still advances, so callers' batch-index math stays
    aligned with their fixture comments. Returns the source dir."""
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    base_t = time.time() - 3600
    for i, lines in enumerate(waves):
        if not lines:
            continue
        path = os.path.join(src_dir, f"wave-{i:02d}.json")
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.utime(path, (base_t + i, base_t + i))
    return src_dir


# Minimum rows a Python-stateful streaming task should amortize its
# fixed per-batch cost over: every state partition pays an Arrow
# round-trip + state-store commit per micro-batch (~50 ms measured at
# r13) regardless of row count, so partitions holding only a handful of
# rows are nearly pure overhead. Used to derive the STATE partition
# count from the bounded stream's own size — the streaming analogue of
# AQE partition coalescing, which cannot act inside a streaming plan.
# Production-sized streams (n_rows >> cores * this) saturate to the
# session's configured shuffle parallelism, so the derivation is
# scale-adaptive, not a local constant.
STATE_ROWS_PER_PARTITION = 1024


def collect_bounded_stream(
    stream_df: DataFrame, work: str, out_schema, n_rows: int | None = None
):
    """Run a bounded stream to completion, collecting every micro-batch
    via foreachBatch into one pandas frame. Returns the concatenated
    pandas frame (possibly empty, schema-named).

    ``n_rows`` (the bounded stream's total row count, which replay
    harnesses know exactly) sizes the stateful-operator partition count:
    Structured Streaming pins state partitioning to
    spark.sql.shuffle.partitions at first trigger — AQE cannot coalesce
    it — so without the hint every micro-batch pays the per-partition
    Python/state-store round trip across the full session fan-out even
    for a few hundred rows (measured 8.7 s -> 3.5 s on the 255-row
    daily-increment replay at 32 cores). The conf is scoped to the
    stream (restored in finally); the first trigger persists the value
    into the checkpoint, so later batches are unaffected by restore."""
    import math

    import pandas as pd

    acc: "list[pd.DataFrame]" = []

    def _collect(batch_df: DataFrame, _batch_id: int) -> None:
        acc.append(batch_df.toPandas())

    spark = stream_df.sparkSession
    old_parts: str | None = None
    if n_rows is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        parts = max(
            1,
            min(
                spark.sparkContext.defaultParallelism,
                math.ceil(n_rows / STATE_ROWS_PER_PARTITION),
            ),
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        q = (
            stream_df.writeStream.outputMode("append")
            .option("checkpointLocation", os.path.join(work, "chk"))
            .foreachBatch(_collect)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            # always stop: an orphaned stream would keep erroring against
            # the caller's rmtree'd source/checkpoint dirs for the rest of
            # the session, polluting every subsequent query
            q.stop()
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    out = [p for p in acc if len(p)]
    if out:
        return pd.concat(out, ignore_index=True)
    return pd.DataFrame(columns=[f.name for f in out_schema.fields])
