"""Pins the cross-SF scaling-exponent card (scaling_card.py, r9 verdict
task #3): the committed SCALING.json must exist, cover the registry, and
flag NO query as superlinear except the documented brute-force audit
legs — the empirical backstop behind every "100 TB shape" docstring
claim. Regenerate with `python scaling_card.py` (idle box) after landing
queries; the card is re-run each round at close-out."""

from __future__ import annotations

import json
import pathlib

import pytest

_PATH = pathlib.Path(__file__).resolve().parent.parent / "SCALING.json"


@pytest.fixture(scope="module")
def scaling():
    assert _PATH.exists(), "SCALING.json missing — run scaling_card.py"
    return json.loads(_PATH.read_text())


def test_flagged_set_is_documented(scaling):
    """Every measured superlinear query must be a documented exception
    (brute-force truth legs / deliberately quadratic measurement
    queries). An unexplained flag is a 100 TB kill condition."""
    flagged = set(scaling["flagged"])
    documented = set(scaling["expected_superlinear"])
    assert scaling["unexplained"] == sorted(flagged - documented)
    assert not flagged - documented, f"unexplained superlinear: {sorted(flagged - documented)}"


def test_flagged_set_is_exactly_the_ratchet():
    """Stronger than the allowlist: the r10 measurement established that
    NOTHING in the registry is superlinear (even the documented brute
    legs are linear — their quadratic term is query-dim-bounded). Pin
    flagged == [] exactly, so a regression in an ALLOWLISTED query
    cannot be auto-excused by its EXPECTED_SUPERLINEAR entry (r10
    second-review finding). Loosening this requires a conscious edit
    here, like every other ratchet."""
    import json

    scaling = json.loads(_PATH.read_text())
    assert scaling["flagged"] == [], scaling["flagged"]


def test_every_query_recorded_its_tables():
    """The growth attribution is only meaningful when the load_table
    instrumentation actually fired: an empty tables list falls back to
    all-tables max growth, which UNDER-flags embeddings-family queries
    (10x denominator instead of 4x). Every registry query reads at
    least one fixture table, so empty means the instrumentation missed
    a module."""
    import json

    scaling = json.loads(_PATH.read_text())
    missing = [n for n, q in scaling["queries"].items() if not q["tables"]]
    assert not missing, f"instrumentation missed: {missing}"


def test_card_covers_the_registry(scaling):
    """The card must cover every bench-enabled registry query (a query
    landed after the last regen would silently escape the backstop —
    the same gap class the bench budgets' self-heal closes)."""
    from polkadot_etl_spark.queries import QUERIES

    bench_names = {n for n, s in QUERIES.items() if s.bench}
    missing = sorted(bench_names - set(scaling["queries"]))
    assert not missing, f"queries missing from SCALING.json: {missing}"


def test_detector_sensitivity_probe_flags(scaling):
    """The card's own corpus x corpus probe plan must measure as
    superlinear — a detector that cannot flag a true quadratic at
    fixture scale would make flagged=[] vacuous (r10 self-review
    finding). The probe is the positive control for the whole card."""
    probe = scaling["probe_quadratic"]
    assert probe["exponent_hi"] > scaling["flag_above"], probe
    assert probe["detects"] is True


def test_exponents_are_input_growth_normalized(scaling):
    """Growth attribution sanity: every query records the tables it
    read, and its hi-pair growth factor matches the max row ratio over
    those tables — the property that keeps flat-fixture queries
    (documents/embeddings between sf0.001 and sf0.01) from reading as
    falsely sublinear or superlinear."""
    rows = scaling["table_rows"]
    for name, q in scaling["queries"].items():
        tabs = q["tables"] or list(rows["0.01"])
        expect_hi = max(rows["0.1"][t] / max(rows["0.01"][t], 1) for t in tabs)
        assert abs(q["growth_hi"] - round(expect_hi, 3)) < 1e-9, name
        assert q["flagged"] == (q["exponent_hi"] > scaling["flag_above"]), name
