"""Tests for utils/profiling.py — the TPU-native replacement for the
reference's wall-clock Timer telemetry (SURVEY.md §5; common/timer.py)."""

import glob
import time

import jax
import jax.numpy as jnp

from hoisdf_tpu.utils.profiling import StepStats, capture_trace


def test_step_stats_window_and_summary():
    st = StepStats(window=4)
    assert st.summary() == {}
    for i in range(6):
        with st.measure():
            time.sleep(0.001 * (i + 1))
    # window keeps only the last 4 samples
    assert len(st.samples) == 4
    s = st.summary()
    assert s["n"] == 4
    assert 0 < s["p50_ms"] <= s["p90_ms"]
    assert s["mean_ms"] > 0
    # the evicted (shortest) samples no longer drag the mean down
    assert s["mean_ms"] * 1e-3 >= min(st.samples)


def test_step_stats_records_exception_free_path_only():
    st = StepStats()
    try:
        with st.measure():
            raise RuntimeError("step failed")
    except RuntimeError:
        pass
    # a failed step is not recorded as a latency sample
    assert st.samples == []


def test_capture_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with capture_trace(d):
        jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
    # best-effort: on backends that support profiling an xplane file lands
    # under <dir>/plugins/profile/<run>/; on unsupported transports the
    # context is a documented no-op — either way nothing raises.
    files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    if jax.default_backend() == "cpu":
        assert files, "CPU backend supports profiling; expected an xplane dump"


def test_capture_trace_noop_on_failure(monkeypatch, capsys):
    def boom(_):
        raise RuntimeError("transport does not support profiling")

    monkeypatch.setattr(jax.profiler, "start_trace", boom)
    with capture_trace("/nonexistent/should/not/matter"):
        pass
    assert "trace capture unavailable" in capsys.readouterr().out
