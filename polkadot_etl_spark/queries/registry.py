"""QuerySpec registry machinery.

Determinism contract (what makes the DuckDB-oracle hash gate pass):

1. Column names are aliased identically in the Spark builder and the
   oracle SQL — the driver sorts columns by name before hashing.
2. Float aggregates are either (a) summed as per-row-cast DECIMAL so the
   arithmetic is associative and bit-exact in both engines, or (b)
   rounded (round(x, N)) in BOTH engines so partial-aggregation order
   cannot leak into the output.
3. Every top-k / limit / window-rank has a TOTAL order (unique tie-break
   key), so both engines select the same rows.
4. Epoch math uses integer microseconds (unix_micros / epoch_us), never
   float seconds.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""  # SURVEY §2 operator ids + reference citation
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = True  # include in bench.py run


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = True,
) -> Callable[[Builder], Builder]:
    """Decorator registering a Spark query builder with its oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags, bench=bench
        )
        return fn

    return deco
