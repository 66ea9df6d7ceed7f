"""Tests for the profiling/observability subsystem."""

import threading

from face_crop_plus_tpu.utils.profiling import PipelineStats, trace


def test_stage_accounting():
    stats = PipelineStats()
    with stats.stage("read", items=8):
        pass
    with stats.stage("read", items=4):
        pass
    with stats.stage("detect", items=8):
        pass
    assert stats.calls["read"] == 2
    assert stats.items["read"] == 12
    assert stats.seconds["read"] >= 0
    report = stats.report()
    assert "read" in report and "detect" in report


def test_stage_thread_safety():
    stats = PipelineStats()

    def work():
        for _ in range(100):
            with stats.stage("s", items=1):
                pass

    threads = [threading.Thread(target=work) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert stats.calls["s"] == 800
    assert stats.items["s"] == 800


def test_stage_records_on_exception():
    stats = PipelineStats()
    try:
        with stats.stage("boom"):
            raise ValueError("x")
    except ValueError:
        pass
    assert stats.calls["boom"] == 1


def test_as_dict_roundtrip():
    stats = PipelineStats()
    with stats.stage("a", items=2):
        pass
    d = stats.as_dict()
    assert d["a"]["items"] == 2 and d["a"]["calls"] == 1


def test_trace_noop():
    with trace(None):
        pass  # no-op path must not require jax
