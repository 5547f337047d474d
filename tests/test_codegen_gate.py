"""The registry-wide no-codegen-fallback gate (r11 verdict finding #1).

Spark degrades gracefully when generated Java fails to compile: a
whole-stage janino failure (e.g. 'Code grows beyond 64 KB' on a
giant-literal projection) logs one WARN and re-executes the stage
interpreted, and an expression-factory failure (e.g. the upstream
'isNull_… is not an rvalue' splitter bug) silently builds a
row-interpreted projection. Results stay correct, so the regression is
invisible to every hash gate — exactly how three r11 queries ran
un-codegen'd for rounds.

The gate: the shared test session (tests/conftest.py) sets
``spark.sql.codegen.fallback=false`` and
``spark.sql.codegen.factoryMode=CODEGEN_ONLY``, so EVERY registry query
executed by the oracle suite (all of them, at sf0.001) now throws on
any compile failure instead of falling back. This module pins that the
gate stays armed and keeps a focused regression probe on the three
queries that historically fell back (fixed in r12 by codegen-bounded
staging + the compact u128/decode expression shapes).
"""

from __future__ import annotations

import pytest

from polkadot_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR

# The r11 fallback trio — each previously compounded a giant expression
# past janino's 64 KB method limit (see the codegen notes at their fix
# sites: plans/snapshots.py staker_info/current_era_info/casting_votes,
# plans/feeds.py _u128_hex_to_str, functions/evm.py
# decode_token_calldata, plans/jsonld.py log_node).
_HISTORICAL_FALLBACKS = [
    "evm_tx_jsonld",
    "snapshots_relay_opengov",
    "snapshots_dappstaking_v3",
]


def test_gate_is_armed(spark):
    """The whole suite is only a no-fallback gate while the session
    confs say so — a conftest refactor that drops them would silently
    disarm every other test."""
    assert spark.conf.get("spark.sql.codegen.fallback") == "false"
    assert spark.conf.get("spark.sql.codegen.factoryMode") == "CODEGEN_ONLY"


@pytest.mark.parametrize("name", _HISTORICAL_FALLBACKS)
def test_historical_fallback_queries_compile(spark, name):
    """Belt over the suite-wide suspenders: the three r11 fallback
    queries execute end-to-end under the armed gate (a compile failure
    throws here even if the oracle comparison were ever skipped)."""
    QUERIES[name].build(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
