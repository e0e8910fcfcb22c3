"""Driver-harness logic tests for bench.py: baseline selection and the
failure-recovery ladder (the round-1 postmortem paths, VERDICT.md Weak #2).

bench.py is the driver's only perf artifact; these tests pin the pure
logic (no TPU) so a harness regression can't silently zero out a round.
"""

import importlib.util
import json
import os
import sys

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    """Import bench.py as an isolated module with __file__ inside tmp_path
    so _read_baseline globs a controlled directory."""
    src = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", src)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "__file__", str(tmp_path / "bench.py"))
    return mod, tmp_path


def _write(tmp_path, name, doc):
    with open(tmp_path / name, "w") as f:
        json.dump(doc, f)


METRIC = "dexycb_eval_inference_throughput"


def test_read_baseline_numeric_round_order(bench):
    mod, tmp = bench
    # r1 red (parsed null), r2 green, r10 green — numeric order must pick r2
    # (the FIRST-EVER green, so vs_baseline keeps showing progress)
    _write(tmp, "BENCH_r01.json", {"rc": 1, "parsed": None})
    _write(tmp, "BENCH_r2.json", {"parsed": {"value": 100.0}})
    _write(tmp, "BENCH_r10.json", {"parsed": {"value": 999.0}})
    assert mod._read_baseline(METRIC, "pipelined") == 100.0


def test_read_baseline_skips_malformed(bench):
    mod, tmp = bench
    with open(tmp / "BENCH_r1.json", "w") as f:
        f.write("not json {")
    _write(tmp, "BENCH_r2.json", {"value": 42.0})  # raw bench JSON form
    assert mod._read_baseline(METRIC, "pipelined") == 42.0


def test_read_baseline_none_when_no_green(bench):
    mod, tmp = bench
    _write(tmp, "BENCH_r1.json", {"rc": 1, "parsed": None})
    assert mod._read_baseline(METRIC, "pipelined") is None


def test_read_baseline_filters_metric_and_mode(bench):
    """Cross-metric and cross-methodology rounds must not anchor the ratio
    (ADVICE r2: pipelined vs blocking numbers are incomparable)."""
    mod, tmp = bench
    _write(tmp, "BENCH_r1.json", {"parsed": {
        "metric": "ho3d_eval_inference_throughput", "value": 50.0}})
    _write(tmp, "BENCH_r2.json", {"parsed": {
        "metric": METRIC, "mode": "blocking", "value": 70.0}})
    # legacy entry with no mode field == pipelined (r2 was measured that way)
    _write(tmp, "BENCH_r3.json", {"parsed": {"metric": METRIC, "value": 90.0}})
    assert mod._read_baseline(METRIC, "pipelined") == 90.0
    assert mod._read_baseline(METRIC, "blocking") == 70.0
    assert mod._read_baseline("ho3d_eval_inference_throughput", "pipelined") == 50.0


def test_read_baseline_sampler_defaults_by_metric(bench):
    """Sampler-less legacy entries default by metric (ADVICE r3 #1):
    pre-round-3 cpu_smoke rounds ran the dense 'full' scan, so a hier CPU
    run must NOT anchor against them; TPU rounds were always hier, so the
    lenient match stays for real-chip metrics."""
    mod, tmp = bench
    smoke = METRIC + "_cpu_smoke"
    _write(tmp, "BENCH_r1.json", {"parsed": {"metric": smoke, "value": 5.0}})
    # hier CPU run: the sampler-less legacy smoke is treated as 'full'
    assert mod._read_baseline(smoke, "pipelined", "hier") is None
    # a full-scan CPU run can still anchor against it
    assert mod._read_baseline(smoke, "pipelined", "full") == 5.0
    # TPU metric: sampler-less legacy entries keep matching hier
    _write(tmp, "BENCH_r2.json", {"parsed": {"metric": METRIC, "value": 80.0}})
    assert mod._read_baseline(METRIC, "pipelined", "hier") == 80.0
    # explicit sampler fields always filter exactly
    _write(tmp, "BENCH_r3.json", {"parsed": {
        "metric": smoke, "value": 7.0, "sampler": "hier"}})
    assert mod._read_baseline(smoke, "pipelined", "hier") == 7.0


def test_read_batch_sweep_prefers_per_setting_file(bench):
    """Round-5: non-dexycb sweeps live in eval_batch_sweep_<setting>.json;
    dexycb keeps the legacy shared filename. The headline lookup must
    prefer the per-setting file and fall back to the legacy one (where
    pre-round-5 sweeps of any setting were recorded)."""
    mod, tmp = bench
    docs = tmp / "docs"
    docs.mkdir()
    _write(docs, "eval_batch_sweep.json", {
        "setting": "dexycb", "sampler": "hier",
        "batch_opt": 44, "batch_opt_fps": 554.7})
    _write(docs, "eval_batch_sweep_ho3d.json", {
        "setting": "ho3d", "sampler": "hier",
        "batch_opt": 33, "batch_opt_fps": 400.0})
    assert mod._read_batch_sweep("dexycb", "hier") == (44, 554.7)
    assert mod._read_batch_sweep("ho3d", "hier") == (33, 400.0)
    # methodology mismatch (sampler) -> no anchor
    assert mod._read_batch_sweep("dexycb", "full") == (None, None)
    # no file for this setting anywhere -> no anchor
    assert mod._read_batch_sweep("ho3d_render", "hier") == (None, None)


def test_read_batch_sweep_legacy_fallback_and_missing_dir(bench):
    mod, tmp = bench
    # no docs dir at all: must not raise
    assert mod._read_batch_sweep("dexycb", "hier") == (None, None)
    docs = tmp / "docs"
    docs.mkdir()
    # a pre-round-5 ho3d sweep recorded in the legacy shared file still
    # anchors an ho3d run (fallback), but never a dexycb run (setting gate)
    _write(docs, "eval_batch_sweep.json", {
        "setting": "ho3d", "sampler": "hier",
        "batch_opt": 22, "batch_opt_fps": 390.0})
    assert mod._read_batch_sweep("ho3d", "hier") == (22, 390.0)
    assert mod._read_batch_sweep("dexycb", "hier") == (None, None)
    # write path: per-setting name for non-dexycb, legacy name for dexycb
    assert mod._sweep_path("dexycb").endswith("docs/eval_batch_sweep.json")
    assert mod._sweep_path("ho3d").endswith("docs/eval_batch_sweep_ho3d.json")


def test_read_batch_sweep_dtype_and_device_methodology(bench):
    """Round-5 cont.: a recorded sweep only anchors a headline run whose
    dtype matches (dtype-less pre-round-5 docs were all bfloat16) and whose
    device matches when both sides are known — an f32 or different-chip run
    has a different operating curve."""
    mod, tmp = bench
    docs = tmp / "docs"
    docs.mkdir()
    _write(docs, "eval_batch_sweep.json", {
        "setting": "dexycb", "sampler": "hier", "dtype": "bfloat16",
        "device": "TPU v5 lite", "batch_opt": 44, "batch_opt_fps": 554.7})
    ok = (44, 554.7)
    assert mod._read_batch_sweep("dexycb", "hier", "bfloat16",
                                 "TPU v5 lite") == ok
    # unknown device on either side: skip the device check
    assert mod._read_batch_sweep("dexycb", "hier", "bfloat16", None) == ok
    # dtype mismatch -> no anchor
    assert mod._read_batch_sweep("dexycb", "hier", "float32",
                                 "TPU v5 lite") == (None, None)
    # device mismatch -> no anchor
    assert mod._read_batch_sweep("dexycb", "hier", "bfloat16",
                                 "TPU v6 lite") == (None, None)
    # dtype-less legacy doc == bfloat16 (all pre-round-5 sweeps were bf16)
    _write(docs, "eval_batch_sweep.json", {
        "setting": "dexycb", "sampler": "hier",
        "batch_opt": 33, "batch_opt_fps": 500.0})
    assert mod._read_batch_sweep("dexycb", "hier", "bfloat16",
                                 "TPU v5 lite") == (33, 500.0)
    assert mod._read_batch_sweep("dexycb", "hier", "float32",
                                 "TPU v5 lite") == (None, None)


def test_ladder_falls_back_to_fresh_process_on_same_batch(bench, monkeypatch):
    """First in-process attempt fails -> a fresh-process retry runs at the
    SAME batch before descending the ladder (incl. single-entry ladders)."""
    mod, _ = bench
    calls = []

    def fake_subprocess_attempt(batch, passthrough, tries=2, wait=90):
        calls.append(batch)
        # RESULT doc shape (_subprocess_attempt returns the parsed line)
        return {"fps": 123.0, "p50": 1.5, "flops_frame": None}

    monkeypatch.setattr(mod, "_subprocess_attempt", fake_subprocess_attempt)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        mod, "_init_params_on_cpu", lambda cfg, model, b: {"params": {}}
    )

    def fake_attempt(*a, **k):
        raise RuntimeError("kernel fault")

    monkeypatch.setattr(mod, "_attempt", fake_attempt)
    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--batch", "4", "--iters", "1", "--warmup", "0"],
    )
    mod.main()  # must NOT raise SystemExit — the retry rescued the run
    assert calls == [4]


def test_no_retry_fails_fast_without_subprocess(bench, monkeypatch):
    """--no-retry means exactly one in-process attempt: no ladder descent,
    no fresh-process retries (probe/diagnostic mode)."""
    mod, _ = bench
    calls = []
    monkeypatch.setattr(
        mod, "_subprocess_attempt",
        lambda *a, **k: calls.append(a) or {"fps": 1.0, "p50": 1.0},
    )
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        mod, "_init_params_on_cpu", lambda cfg, model, b: {"params": {}}
    )

    def fake_attempt(*a, **k):
        raise RuntimeError("kernel fault")

    monkeypatch.setattr(mod, "_attempt", fake_attempt)
    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--batch", "4", "--iters", "1", "--warmup", "0",
         "--no-retry"],
    )
    with pytest.raises(SystemExit):
        mod.main()
    assert calls == []
