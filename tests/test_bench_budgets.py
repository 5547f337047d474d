"""bench.reconcile_budgets — the self-healing budget contract (the gap
the r6 AND r7 verdicts flagged: the newest query shipped unguarded after
every manual regeneration). Pure file/dict logic, no Spark."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
from bench import _budget_of, reconcile_budgets  # noqa: E402


def _write(path, budgets, provisional=None):
    doc = {"sf": 0.1, "rule": "1.5x idle-box min with a +0.75s floor",
           "budgets": budgets}
    if provisional is not None:
        doc["provisional"] = provisional
    path.write_text(json.dumps(doc))


def test_missing_query_self_heals_with_provisional_flag(tmp_path):
    p = tmp_path / "b.json"
    _write(p, {"old_query": 2.0})
    over, no_budget = reconcile_budgets(
        {"old_query": 1.5, "new_query": 3.0}, str(p), False, True, 0.1
    )
    assert no_budget == ["new_query"] and over == {}
    doc = json.loads(p.read_text())
    # provisional ceiling from THIS run, flagged; existing budget untouched
    assert doc["budgets"]["new_query"] == _budget_of(3.0) == 4.5
    assert doc["budgets"]["old_query"] == 2.0
    assert doc["provisional"] == {"new_query": True}
    # the file's header keys survive the merge
    assert doc["sf"] == 0.1 and "rule" in doc

    # next run: the healed query is guarded — silence
    over2, no2 = reconcile_budgets(
        {"old_query": 1.5, "new_query": 3.1}, str(p), False, True, 0.1
    )
    assert no2 == [] and over2 == {}


def test_breach_detection_and_wrong_sf_noop(tmp_path):
    p = tmp_path / "b.json"
    _write(p, {"q": 1.0})
    over, _ = reconcile_budgets({"q": 1.4}, str(p), False, True, 0.1)
    assert over == {"q": {"min": 1.4, "budget": 1.0}}
    # at a different scale factor nothing is checked or written
    before = p.read_text()
    over2, no2 = reconcile_budgets({"q": 9.9, "x": 1.0}, str(p), False, False, 0.001)
    assert over2 == {} and no2 == [] and p.read_text() == before


def test_write_budgets_regenerates_and_clears_provisional(tmp_path):
    p = tmp_path / "b.json"
    _write(p, {"stale": 9.0, "q": 1.0}, provisional={"q": True})
    over, no_budget = reconcile_budgets({"q": 2.0}, str(p), True, True, 0.1)
    assert over == {} and no_budget == []
    doc = json.loads(p.read_text())
    assert doc["budgets"] == {"q": _budget_of(2.0)}
    assert "provisional" not in doc  # idle regeneration clears the flags
    assert "stale" not in doc["budgets"]


def test_no_budget_file_is_silent(tmp_path):
    p = tmp_path / "none.json"
    over, no_budget = reconcile_budgets({"q": 1.0}, str(p), False, True, 0.1)
    assert over == {} and no_budget == [] and not p.exists()


def test_box_speed_probe_shape(spark):
    """The r12 box-speed calibration stamp (benchutil.box_speed_probe):
    fixed-work rows/sec for 1 thread and full parallelism, positive and
    internally consistent. The parallel leg must not read materially
    slower than the serial leg (a tolerance absorbs co-tenant noise —
    this pins the instrument's shape, not the box's speed)."""
    from polkadot_etl_spark.benchutil import BOX_PROBE_ROWS, box_speed_probe

    def _assert_shape(b) -> None:
        # re-asserted on EVERY sample, including retries (r14 ADVICE:
        # the old loop only ratio-checked the fresh probe, so a retried
        # probe with a broken wall/row field could pass)
        assert b["box_speed_1t"] > 0 and b["box_speed_nt"] > 0
        assert b["box_probe_rows"] == BOX_PROBE_ROWS
        assert b["box_probe_wall_1t"] > 0 and b["box_probe_wall_nt"] > 0

    # Instrument-shape pin only, not a box-speed pin: on a low-core or
    # co-tenant-throttled box (SPARK_GRAFT_CPUS defaults to 32 regardless
    # of real cores) the parallel leg can legitimately trail the serial
    # leg, so the factor is loose — it catches a broken probe (nt leg
    # timing the wrong thing / returning garbage), not scheduler noise.
    # A broken probe fails the ratio on EVERY attempt; a sitting where
    # another 32-task job owns the cores (measured: nt 87k vs 1t 202k
    # with a concurrent full-registry verify) fails it transiently.
    # MAJORITY vote over up to 3 samples (r14 ADVICE: best-of-3 let ONE
    # lucky sample clear a genuinely regressed nt leg; a co-tenant burst
    # long enough to fail 2 of 3 spaced probes is indistinguishable from
    # a real regression and SHOULD fail the suite).
    passes, fails = 0, 0
    box = box_speed_probe(spark)
    _assert_shape(box)
    while passes < 2 and fails < 2:
        if box["box_speed_nt"] >= 0.5 * box["box_speed_1t"]:
            passes += 1
        else:
            fails += 1
        if passes < 2 and fails < 2:
            box = box_speed_probe(spark)
            _assert_shape(box)
    assert passes >= 2, box
