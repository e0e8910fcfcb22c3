"""Harness-logic tests for scripts/probe_train_batch_sweep.py (VERDICT r4
#3): the fault-isolation ladder — retry-once, compile-only HLO fingerprint
on a double fault, and the summary/batch_opt JSON — pinned without a TPU
(same pattern as test_bench_harness.py for bench.py)."""

import importlib.util
import json
import os
import sys

import pytest


@pytest.fixture()
def sweep():
    src = os.path.join(
        os.path.dirname(__file__), "..", "scripts",
        "probe_train_batch_sweep.py")
    spec = importlib.util.spec_from_file_location("train_sweep_ut", src)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(mod, monkeypatch, tmp_path, probe, batches="4,8"):
    calls = []

    def fake_probe(batch, args, extra=()):
        calls.append((batch, tuple(extra)))
        return probe(batch, extra)

    monkeypatch.setattr(mod, "_run_probe", fake_probe)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    out = tmp_path / "train_batch_sweep.json"
    monkeypatch.setattr(sys, "argv", [
        "probe_train_batch_sweep.py", "--batches", batches,
        "--out", str(out), "--hlo-dir", str(tmp_path)])
    assert mod.main() == 0
    with open(out) as f:
        return calls, json.load(f)


def test_all_clean_rows_and_batch_opt(sweep, monkeypatch, tmp_path):
    fps = {4: 100.0, 8: 130.0}

    def probe(batch, extra):
        return {"ms": 10.0, "fps": fps[batch], "gflop": 1.0,
                "hbm_gb": 1.0, "intensity_flop_per_byte": 1.0,
                "roofline_mfu_cap": 0.5, "achieved_mfu": 0.2,
                "device": "fake"}

    calls, summary = _run_main(sweep, monkeypatch, tmp_path, probe)
    assert [c[0] for c in calls] == [4, 8]  # one attempt each, no retries
    assert all(r["ok"] for r in summary["rows"])
    assert summary["batch_opt"] == 8
    assert summary["batch_opt_fps"] == 130.0


def test_single_fault_retries_same_batch_once(sweep, monkeypatch, tmp_path):
    attempts = {4: 0, 8: 0}

    def probe(batch, extra):
        attempts[batch] += 1
        if batch == 4 and attempts[4] == 1:
            return None  # first attempt faults; retry must rescue it
        return {"ms": 10.0, "fps": 50.0, "gflop": 1.0, "hbm_gb": 1.0,
                "intensity_flop_per_byte": 1.0, "roofline_mfu_cap": 0.5,
                "achieved_mfu": 0.2, "device": "fake"}

    calls, summary = _run_main(sweep, monkeypatch, tmp_path, probe)
    assert [c[0] for c in calls] == [4, 4, 8]
    assert all(not c[1] for c in calls)  # no compile-only fingerprint runs
    assert all(r["ok"] for r in summary["rows"])


def test_double_fault_captures_compile_only_fingerprint(
        sweep, monkeypatch, tmp_path):
    def probe(batch, extra):
        if batch != 8:
            return {"ms": 10.0, "fps": 50.0, "gflop": 1.0, "hbm_gb": 1.0,
                    "intensity_flop_per_byte": 1.0,
                    "roofline_mfu_cap": 0.5, "achieved_mfu": 0.2,
                    "device": "fake"}
        if "--compile-only" in extra:
            return {"hlo_fingerprint": "abcd1234", "hlo_path": extra[-1],
                    "gflop": 2.0, "hbm_gb": 2.0, "roofline_mfu_cap": 0.6}
        return None  # executes fault, both tries

    calls, summary = _run_main(sweep, monkeypatch, tmp_path, probe)
    # batch 8: two execute attempts then exactly one compile-only run
    b8 = [c for c in calls if c[0] == 8]
    assert len(b8) == 3 and "--compile-only" in b8[2][1]
    row = [r for r in summary["rows"] if r["batch"] == 8][0]
    assert row["ok"] is False
    assert row["hlo_fingerprint"] == "abcd1234"
    assert row["roofline_mfu_cap"] == 0.6
    # clean rows still anchor batch_opt; the faulting batch never does
    assert summary["batch_opt"] == 4


def test_all_faults_gives_null_batch_opt(sweep, monkeypatch, tmp_path):
    def probe(batch, extra):
        if "--compile-only" in extra:
            return {"hlo_fingerprint": "ffff0000", "hlo_path": extra[-1],
                    "gflop": 2.0, "hbm_gb": 2.0, "roofline_mfu_cap": 0.6}
        return None

    calls, summary = _run_main(sweep, monkeypatch, tmp_path, probe,
                               batches="4")
    assert summary["batch_opt"] is None
    assert summary["batch_opt_fps"] is None
    assert summary["rows"][0]["ok"] is False
