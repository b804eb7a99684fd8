"""Metrics/stage-timer tests."""

import logging

from colormipsearch_tpu.utils.metrics import Metrics, stage_timer


def test_counters_and_rates():
    m = Metrics()
    m.add("pairsScored", 100)
    m.add("pairsScored", 50)
    snap = m.snapshot()
    assert snap["pairsScored"] == 150
    assert "pairsPerSec" in snap
    assert snap["elapsedSec"] >= 0


def test_stage_timer_logs(caplog):
    m = Metrics()
    with caplog.at_level(logging.INFO):
        with stage_timer("unit.stage", m, itemsDone=3):
            pass
    assert m.get("itemsDone") == 3
    assert m.get("unit.stage.seconds") >= 0
    assert any("unit.stage finished" in r.message for r in caplog.records)
