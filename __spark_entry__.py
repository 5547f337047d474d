"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the polkadot_etl_spark query registry: every implemented
operator from SURVEY.md §2 (plus the LLM-data-pipeline surface) is one
registry entry carrying both the Spark builder and its DuckDB oracle SQL,
so queries()/oracle_sql() can never drift apart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from polkadot_etl_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
