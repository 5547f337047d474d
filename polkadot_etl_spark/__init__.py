"""polkadot_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jam-duna/polkadot-etl (the reference), plus
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

The reference (see /root/reference, SURVEY.md) is a Node.js ETL stack whose
analytics semantics live in hand-built SQL strings + row-at-a-time JS loops.
This package re-expresses that entire operator surface Spark-first:
declarative DataFrame plans that Catalyst optimizes, broadcast joins for
dimension decoration, window functions for as-of/tie-break/top-N semantics,
and Structured Streaming for the ingest tier.

Layout:
  session.py   — SparkSession builder with scale-oriented defaults
  schemas.py   — StructType registry transcribing the reference's published
                 BigQuery JSON schemas (SURVEY §1.2)
  functions/   — scalar expression zoo (SURVEY §2.8): ss58/address codecs,
                 hex/decimal numerics, time bucketing, JSON access
  operators/   — reusable composite operators: as-of join, band join with
                 tie-break, top-N per group, OHLCV, rollups, call-tree
                 flattening, dedup (exact/minhash/simhash), histogram
  queries/     — the query registry: every SURVEY §2 operator expressed as a
                 (spark_builder, oracle_sql) pair over the test tables
  sources/     — readers/writers (partitioned parquet lake, NDJSON, CSV)
  streaming/   — Structured Streaming pipelines (fork resolution, watermarks,
                 gap audit) mirroring SURVEY §2.9
"""

__version__ = "0.1.0"
