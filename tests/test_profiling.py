"""Profiling utility + CLI flag plumbing tests (SURVEY.md §5: the
reference has no tracing subsystem; this is the replacement capability)."""

import time

import pytest

from visualslam_android_tpu.utils import profiling


def test_stage_timer_accumulates():
    t = profiling.StageTimer()
    for _ in range(3):
        with t.stage("work"):
            time.sleep(0.002)
    s = t.summary()
    assert s["work"]["count"] == 3
    assert s["work"]["total_s"] >= 0.006
    assert "work" in t.report()


def test_stage_timer_disabled_records_nothing():
    t = profiling.StageTimer(enabled=False)
    with t.stage("x"):
        pass
    assert t.summary() == {}


def test_stage_timer_records_on_exception():
    t = profiling.StageTimer()
    with pytest.raises(ValueError):
        with t.stage("boom"):
            raise ValueError()
    assert t.summary()["boom"]["count"] == 1


def test_xla_trace_none_is_noop():
    with profiling.xla_trace(None):
        pass


def test_cli_exposes_profile_flags():
    from visualslam_android_tpu import run_slam

    with pytest.raises(SystemExit) as e:
        run_slam.main(["--help"])
    assert e.value.code == 0
