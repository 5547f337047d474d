"""BigQuery publish binding — the `bq load` / `bq query` contract the
reference drives its warehouse with (substrate/substrateetl.js:713,
1513, 3837 `bq load --source_format=NEWLINE_DELIMITED_JSON --replace
'${dataset}.${tbl}$${YYYYMMDD}' ${file} schema/...json`; :298, 4822
`bq query --destination_table ... --time_partitioning_field ... --replace`).

Same partial-by-environment pattern as sources/jdbc.py (S3): the
COMMAND/CONTRACT layer is pure, deterministic and fully tested — it
formats exactly the invocations the reference issues, over exactly the
NDJSON day partitions sources.tables.write_day_partitioned produces —
while the live binding (the Spark BigQuery connector / a `bq` CLI on
PATH) is probed at call time and absent in this sandbox.

The flow at scale mirrors the reference end-to-end:
  write_day_partitioned(...)  →  NDJSON under .../date=YYYY-MM-DD/
  bq_load_command(...)        →  one partition-decorator load per day
  (or spark.read/write format("bigquery") when the connector jar ships
  with the cluster — read_table binds that path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SOURCE_FORMAT = "NEWLINE_DELIMITED_JSON"


def partition_decorator(table: str, day: str) -> str:
    """'chains.blocks0' + '2024-01-31' → 'chains.blocks0$20240131' —
    the BigQuery day-partition decorator the reference's --replace
    loads target (substrateetl.js:1513), making re-publish of one day
    idempotent (X8)."""
    return f"{table}${day.replace('-', '')}"


def bq_load_command(
    table: str,
    source_path: str,
    schema_path: str,
    *,
    project_id: str,
    day: str | None = None,
    max_bad_records: int = 10,
    time_partitioning_field: str | None = None,
    hourly: bool = False,
    replace: bool = True,
) -> list[str]:
    """The reference's load invocation as an argv list (substrateetl.js
    :713 full-table, :1513 day-decorator, :3837 hourly grain with
    --time_partitioning_type=HOUR). Pure string contract — callers
    hand it to their scheduler; nothing here executes."""
    target = partition_decorator(table, day) if day else table
    cmd = [
        "bq",
        "load",
        f"--project_id={project_id}",
        f"--max_bad_records={max_bad_records}",
        f"--source_format={SOURCE_FORMAT}",
    ]
    if time_partitioning_field:
        cmd += [
            f"--time_partitioning_type={'HOUR' if hourly else 'DAY'}",
            f"--time_partitioning_field={time_partitioning_field}",
        ]
    cmd += [f"--replace={'true' if replace else 'false'}", target, source_path, schema_path]
    return cmd


def bq_query_command(
    destination_table: str,
    sql: str,
    *,
    project_id: str,
    time_partitioning_field: str | None = None,
    replace: bool = True,
) -> list[str]:
    """The derived-table publish (bq query --destination_table,
    substrateetl.js:298,4822): standard SQL, optional day partitioning,
    --replace for idempotent re-publish. Newlines collapse to spaces
    exactly like the reference's removeNewLine (:4822)."""
    cmd = ["bq", "query", "--destination_table", destination_table,
           f"--project_id={project_id}"]
    if time_partitioning_field:
        cmd += ["--time_partitioning_field", time_partitioning_field]
    if replace:
        cmd.append("--replace")
    # newline replacement ONLY (paraTool.removeNewLine parity) — a
    # whitespace-collapsing normalization would also rewrite runs of
    # spaces INSIDE quoted SQL string literals
    cmd += ["--use_legacy_sql=false", sql.replace("\r", " ").replace("\n", " ")]
    return cmd


def connector_available(spark: SparkSession) -> bool:
    """True when the Spark BigQuery connector is on the cluster's
    classpath (it is not in this sandbox — same environment gate as
    jdbc.py's live-DB path)."""
    try:
        # resolve through the CONTEXT classloader: jars added at runtime
        # (--jars / --packages / spark.jars) are visible there but NOT
        # to java.lang.Class.forName's system classloader; a bare _jvm
        # attribute access would lazily return a JavaPackage and never
        # fail at all
        spark._jvm.Thread.currentThread().getContextClassLoader().loadClass(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, table: str, project_id: str) -> DataFrame:
    """spark.read.format('bigquery') binding — raises with a clear
    message when the connector jar is absent rather than a raw
    ClassNotFoundException."""
    if not connector_available(spark):
        raise NotImplementedError(
            "Spark BigQuery connector not on the classpath; ship "
            "spark-bigquery-with-dependencies with the cluster (the "
            "bq_load_command contract is the jar-free publish path)"
        )
    return (
        spark.read.format("bigquery")
        .option("parentProject", project_id)
        .option("table", table)
        .load()
    )
