"""Query registry: every implemented operator from SURVEY §2 is one
QuerySpec — a Spark DataFrame builder plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. The driver's correctness gate and our own
pytest harness both consume this registry, so there is exactly one source
of truth for "what is implemented"."""

from polkadot_etl_spark.queries.registry import QUERIES, QuerySpec, query

# Importing these modules populates QUERIES via the @query decorator.
from polkadot_etl_spark.queries import tpch  # noqa: F401,E402
from polkadot_etl_spark.queries import relational  # noqa: F401,E402
from polkadot_etl_spark.queries import llmdata  # noqa: F401,E402
from polkadot_etl_spark.queries import survey_ext  # noqa: F401,E402

__all__ = ["QUERIES", "QuerySpec", "query"]
