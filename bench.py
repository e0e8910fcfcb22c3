"""Benchmark: DexYCB eval-mode inference throughput (frames/sec/chip).

This is the driver's north-star metric (BASELINE.json): full HOISDF
inference — backbone, pyramid, dual SDF fields, batched field-guided 64^3
point sampling, transformers, MANO head — at the reference eval batch size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the first green recorded round when
present — the reference repo publishes no numbers (BASELINE.md), so the
baseline is self-relative until a PyTorch GPU measurement exists.

Resilience (round-1 postmortem, VERDICT.md "Weak #2"): params are initialized
on the host CPU backend (no eager op-by-op TPU traffic, no init-time HBM
spike), and the timed run retries down a batch-size ladder on
RESOURCE_EXHAUSTED / transient TPU-tunnel errors, so one flaky allocation can
no longer zero out the round's data.

Round-2 hardening: after a TPU "kernel fault" (UNAVAILABLE), the in-process
client is poisoned — every further call fails regardless of batch size (the
round-2 hier investigation showed a whole ladder burned this way).  Retry
attempts therefore re-exec this script in a FRESH subprocess
(``--single-attempt``), with recovery waits, since the device only recovers
across processes.
"""

from __future__ import annotations

import argparse
import gc
import glob
import json
import os
import sys
import time
import traceback


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _read_baseline(metric: str, mode: str, sampler: str = "hier") -> float | None:
    """Anchor for ``vs_baseline``: the FIRST-EVER green recorded round whose
    metric name AND dispatch mode match this run, so the ratio keeps showing
    progress across rounds (it previously re-anchored on the latest green
    round, freezing at 1.0) and never mixes measurement methodologies
    (ADVICE r2: pipelined vs per-step-blocking numbers are not comparable).
    Rounds recorded before the mode field existed were measured pipelined.
    """

    def round_num(path: str) -> int:
        import re

        m = re.search(r"BENCH_r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else 1 << 30

    for path in sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")),
        key=round_num,
    ):
        try:
            with open(path) as f:
                doc = json.load(f)
        except Exception:
            continue
        parsed = doc.get("parsed") if isinstance(doc, dict) else None
        entry = parsed if isinstance(parsed, dict) else (
            doc if isinstance(doc, dict) else None
        )
        if not isinstance(entry, dict):
            continue
        if entry.get("metric") not in (None, metric):
            continue
        if entry.get("mode", "pipelined") != mode:
            continue
        # Sampler methodology must match too (the CPU smoke honors
        # --sdf-infer-mode since round 3).  Entries recorded before the
        # field existed default by metric: pre-round-3 CPU smokes ran the
        # dense "full" scan (the old CPU branch never set sdf_infer_mode),
        # while TPU rounds were always hier — a lenient match here would
        # anchor a hier CPU run against a full-scan baseline and inflate
        # the ratio (ADVICE r3).
        default_sampler = (
            "full" if "cpu_smoke" in str(entry.get("metric") or metric)
            else "hier"
        )
        if entry.get("sampler", default_sampler) != sampler:
            continue
        val = entry.get("value")
        if isinstance(val, (int, float)) and val > 0:
            return float(val)
    return None


# Analytical bound on the reference's GPU eval throughput (frames/sec) —
# the ≥5x-target denominator.  Derivation with stated assumptions lives in
# BASELINE.md §"Analytical GPU denominator": dense-64^3 sampler = 448-897
# GFLOP/frame (main/model.py:246-355), RTX 3090 fp32 at a generous 50%
# sustained -> ~40 f/s ceiling; empirically cross-checked by this repo's own
# batched "full"-mode scan measuring 21 f/s on a much faster chip.
ANALYTICAL_GPU_BASELINE_FPS = 40.0

# bf16 peak FLOP/s by device kind, for the MFU denominator.
_PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v5": 459e12,
    "v6e": 918e12,
    "v6 lite": 918e12,
}


def _sweep_path(setting: str) -> str:
    # dexycb keeps the legacy filename (docs reference it); other presets
    # get their own file so sweeps don't clobber each other
    name = ("eval_batch_sweep.json" if setting == "dexycb"
            else f"eval_batch_sweep_{setting}.json")
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "docs", name)


def _read_batch_sweep(setting: str, sampler: str,
                      dtype: str = "bfloat16", device_kind: str = None):
    """(batch_opt, batch_opt_fps) from a recorded ``--batch-sweep`` run whose
    methodology (setting + sampler + dtype + device) matches this run, else
    (None, None).  Sweeps recorded before dtype was written (round 5) were
    all bfloat16, so a dtype-less doc only anchors a bfloat16 run; the
    device check is skipped when either side is unknown.

    Prefers the per-setting file; falls back to the legacy shared filename
    (pre-round-5 sweeps of any setting were written there)."""
    legacy = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "docs", "eval_batch_sweep.json")
    for path in dict.fromkeys((_sweep_path(setting), legacy)):
        try:
            with open(path) as f:
                sweep = json.load(f)
        except (OSError, ValueError):
            continue
        if (sweep.get("setting") == setting
                and sweep.get("sampler") == sampler
                and sweep.get("dtype", "bfloat16") == dtype
                and (sweep.get("device") is None or device_kind is None
                     or sweep.get("device") == device_kind)):
            return sweep.get("batch_opt"), sweep.get("batch_opt_fps")
    return None, None


def _peak_flops(device_kind: str) -> float | None:
    kind = device_kind.lower()
    for key in sorted(_PEAK_FLOPS, key=len, reverse=True):
        if key in kind:
            return _PEAK_FLOPS[key]
    return None


def _flops_per_frame(cfg, model, mano, variables, batch) -> float | None:
    """XLA cost analysis of the compiled eval step -> FLOPs per frame (the
    denominator for MFU).  Compiles ride the persistent cache, so this is
    cheap after the timed attempt.  Returns None if analysis is unavailable
    (e.g. the in-process client was poisoned by a TPU fault)."""
    try:
        import jax
        import jax.numpy as jnp

        from hoisdf_tpu.data.synthetic import synthetic_batch, split_inputs_targets
        from hoisdf_tpu.train import make_eval_step

        eval_step = make_eval_step(cfg, model, mano)
        batch_np = synthetic_batch(cfg, batch_size=batch, train=False)
        inputs, _ = split_inputs_targets(batch_np)
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        compiled = eval_step.lower(
            variables["params"], variables.get("batch_stats", {}), inputs
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops / batch if flops > 0 else None
    except Exception as exc:  # noqa: BLE001
        _log(f"cost analysis unavailable: {type(exc).__name__}: {str(exc)[:200]}")
        return None


def _init_params_on_cpu(cfg, model, batch_np_train):
    """Initialize model variables on the host CPU backend: batch-1 presampled
    path (params are batch-size independent), so the TPU sees zero init
    traffic and no eager-allocation HBM spike."""
    import jax
    import jax.numpy as jnp

    from hoisdf_tpu.data.synthetic import split_inputs_targets

    cpu = jax.devices("cpu")[0]
    inputs_np, _ = split_inputs_targets(batch_np_train)
    with jax.default_device(cpu):
        inputs1 = {k: jnp.asarray(v[:1]) for k, v in inputs_np.items()}
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample_noise": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            inputs1, use_presampled=True, dist_range=0.03, train=False,
        )
    return variables


def _attempt(cfg, model, mano, variables, batch: int, iters: int, warmup: int):
    """One timed measurement at the given batch size.  Raises on failure."""
    import jax
    import jax.numpy as jnp

    from hoisdf_tpu.data.synthetic import synthetic_batch, split_inputs_targets
    from hoisdf_tpu.train import make_eval_step

    device = jax.devices()[0]
    params = jax.device_put(variables["params"], device)
    batch_stats = jax.device_put(variables.get("batch_stats", {}), device)

    batch_np = synthetic_batch(cfg, batch_size=batch, train=False)
    inputs, _ = split_inputs_targets(batch_np)
    inputs = {k: jax.device_put(jnp.asarray(v), device) for k, v in inputs.items()}

    eval_step = make_eval_step(cfg, model, mano)

    _log(f"attempt batch={batch}: compiling + warmup x{warmup} "
         "(TPU first-compile can take 13-20 min over the tunnel)")
    for _ in range(warmup):
        preds = eval_step(params, batch_stats, inputs)
        jax.block_until_ready(preds)

    # Latency: block every step (includes the remote-tunnel dispatch
    # constant, ~29 ms/step on this axon setup — see docs/PERFORMANCE.md).
    iter_times = []
    for _ in range(iters):
        it0 = time.perf_counter()
        preds = eval_step(params, batch_stats, inputs)
        jax.block_until_ready(preds)
        iter_times.append(time.perf_counter() - it0)
    p50 = sorted(iter_times)[len(iter_times) // 2] / batch * 1000

    # Throughput: pipelined dispatch (the serving pattern) — enqueue every
    # step and block once; JAX's async dispatch overlaps the per-step RPC
    # with device execution, so steady-state rate is device-time bound.
    outs = []
    t0 = time.perf_counter()
    for _ in range(iters):
        outs.append(eval_step(params, batch_stats, inputs))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    _log(f"attempt batch={batch}: OK — {fps:.1f} f/s pipelined, "
         f"p50 {p50:.2f} ms/frame blocking")
    return fps, p50


def _subprocess_attempt(batch: int, passthrough, tries: int = 2, wait: int = 90):
    """Run one attempt in a FRESH process (fresh TPU client): the only way to
    continue after an in-process kernel fault.  Returns the RESULT doc
    (fps/p50/flops_frame) or None."""
    import subprocess

    cmd = [
        sys.executable, os.path.abspath(__file__), *passthrough,
        "--single-attempt", str(batch),
    ]
    for t in range(tries):
        if t:
            _log(f"waiting {wait}s for TPU recovery before retrying")
            time.sleep(wait)
        _log(f"fresh-process attempt batch={batch} (try {t + 1}/{tries})")
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            _log(f"fresh-process attempt batch={batch} timed out")
            continue
        sys.stderr.write(proc.stderr[-3000:])
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        _log(f"fresh-process attempt batch={batch}: rc={proc.returncode}, "
             "no RESULT line")
    return None


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="CPU smoke mode")
    parser.add_argument(
        "--setting", default="dexycb",
        choices=["dexycb", "dexycb_full", "ho3d", "ho3d_render"],
        help="config preset (ho3d* use the big decoder + IK head)",
    )
    parser.add_argument("--batch", type=int, default=22)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument(
        "--sdf-infer-mode", default="hier",
        choices=["full", "coarse2fine", "hier"],
        help="field-guided sampling strategy (coarse2fine ~7x fewer SDF evals "
             "than full at 117.5 f/s; hier 2.4x fewer again at 229.1 f/s — "
             "the production default)",
    )
    parser.add_argument(
        "--dtype", default="bfloat16", choices=["float32", "bfloat16"],
        help="activation compute dtype for the conv/attention/SDF hot path",
    )
    parser.add_argument(
        "--hier-levels", default=None, metavar="JSON",
        help='override cfg.hier_levels for --sdf-infer-mode hier, e.g. '
             '"[[4,512],[2,896]]"',
    )
    parser.add_argument(
        "--cfg", action="append", default=[], metavar="KEY=VALUE",
        help="extra config overrides (JSON values; repeatable) — the A/B "
             "hook for knobs without dedicated flags, e.g. "
             "--cfg gather_chunked_max_table=1024",
    )
    parser.add_argument("--no-fused", action="store_true",
                        help="disable the fused Pallas SDF-MLP kernel")
    parser.add_argument("--no-retry", action="store_true",
                        help="fail immediately instead of walking the ladder")
    parser.add_argument(
        "--single-attempt", type=int, default=None, metavar="BATCH",
        help="(internal) run exactly one attempt at BATCH and print "
             "'RESULT {json}'; used by the parent's fresh-process retries",
    )
    parser.add_argument(
        "--batch-sweep", default=None, metavar="B1,B2,...",
        help="sweep eval batch sizes (each in a fresh process, fault-"
             "isolated), report f/s + p50 + MFU per batch, and record the "
             "per-chip throughput-optimal point to docs/eval_batch_sweep.json "
             "(picked up as 'batch_opt' by subsequent headline runs). "
             "The batch-22 headline stays the reference-parity metric "
             "(main/config.py:61); this finds where the chip actually peaks.",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hoisdf_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from hoisdf_tpu.config import get_config, parse_cfg_overrides
    from hoisdf_tpu.data.synthetic import synthetic_batch
    from hoisdf_tpu.mano.layer import ManoBuffers
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.models.hoisdf import build_model

    extra = parse_cfg_overrides(args.cfg)
    if args.hier_levels:
        extra["hier_levels"] = tuple(
            tuple(l) for l in json.loads(args.hier_levels)
        )
    # hier_levels (flag or --cfg) is the whole-sampler knob (all historical
    # A/Bs used shared levels); a per-field obj cascade comes via
    # --cfg hier_levels_obj=[[...]] on top.
    if "hier_levels" in extra:
        extra.setdefault("hier_levels_obj", extra["hier_levels"])
    if args.cpu:
        if args.sdf_infer_mode == "hier":
            # tiny-lattice cascade matching bins_n=16 (the production
            # levels assume the 64^3 lattice)
            extra.setdefault("hier_levels", ((4, 16), (2, 48)))
            extra.setdefault("hier_levels_obj", None)
        # CPU smoke keeps compute_dtype=float32 (the config default) so the
        # cpu_smoke metric stays comparable across rounds; override via
        # --cfg compute_dtype=bfloat16 if needed.
        cfg = get_config(
            args.setting, resnet_type=18, hidden_dim=64, dim_feedforward=128,
            enc_layers=2, dec_layers=2, num_samp_hand=32, num_samp_obj=16,
            input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
            sdf_infer_chunk=2048, sdf_infer_mode=args.sdf_infer_mode,
            fused_sdf_infer=not args.no_fused, **extra,
        )
        args.batch = min(args.batch, 4)
    else:
        cfg = get_config(
            args.setting, sdf_infer_mode=args.sdf_infer_mode,
            compute_dtype=args.dtype, fused_sdf_infer=not args.no_fused,
            **extra,
        )

    model = build_model(cfg)
    mano = ManoBuffers.from_model(make_synthetic_mano(0))

    batch_np_train = synthetic_batch(cfg, batch_size=1, train=True)
    variables = _init_params_on_cpu(cfg, model, batch_np_train)
    _log("params initialized on host CPU")

    if args.single_attempt is not None:
        fps, p50 = _attempt(
            cfg, model, mano, variables, args.single_attempt, args.iters,
            args.warmup,
        )
        flops_frame = _flops_per_frame(
            cfg, model, mano, variables, args.single_attempt
        )
        print("RESULT " + json.dumps(
            {"fps": fps, "p50": p50, "flops_frame": flops_frame}
        ), flush=True)
        return

    passthrough_base = [
        "--setting", args.setting,
        "--sdf-infer-mode", args.sdf_infer_mode, "--dtype", args.dtype,
        "--iters", str(args.iters), "--warmup", str(args.warmup),
    ] + (["--cpu"] if args.cpu else []) + (
        ["--no-fused"] if args.no_fused else []
    ) + (
        ["--hier-levels", args.hier_levels] if args.hier_levels else []
    ) + [a for item in args.cfg for a in ("--cfg", item)]

    if args.batch_sweep is not None:
        import jax as _jax

        batches = [int(b) for b in args.batch_sweep.split(",") if b.strip()]
        peak = _peak_flops(_jax.devices()[0].device_kind) or 0.0
        rows = []
        for b in batches:
            res = _subprocess_attempt(b, passthrough_base, tries=2)
            if res is None:
                rows.append({"batch": b, "ok": False})
                _log(f"sweep batch={b}: FAILED after retries")
                continue
            ff = res.get("flops_frame")
            mfu = (ff * res["fps"] / peak) if (ff and peak) else None
            rows.append({
                "batch": b, "ok": True, "fps": round(res["fps"], 1),
                "p50_ms_per_frame": round(res["p50"], 3),
                "gflop_per_frame": round(ff / 1e9, 2) if ff else None,
                "mfu": round(mfu, 4) if mfu else None,
            })
            _log(f"sweep batch={b}: {res['fps']:.1f} f/s"
                 + (f", MFU {mfu * 100:.1f}%" if mfu else ""))
        ok_rows = [r for r in rows if r.get("ok")]
        best = max(ok_rows, key=lambda r: r["fps"]) if ok_rows else None
        doc = {
            "setting": args.setting, "sampler": cfg.sdf_infer_mode,
            "dtype": cfg.compute_dtype,
            "device": _jax.devices()[0].device_kind, "mode": "pipelined",
            "rows": rows,
            "batch_opt": best["batch"] if best else None,
            "batch_opt_fps": best["fps"] if best else None,
        }
        if not args.cpu:
            # a CPU smoke sweep must never clobber the recorded TPU sweep
            # that headline runs anchor their batch_opt against
            out_path = _sweep_path(args.setting)
            with open(out_path, "w") as f:
                json.dump(doc, f, indent=1)
        print(json.dumps({
            "metric": f"{args.setting}_eval_batch_sweep"
            + ("_cpu_smoke" if args.cpu else ""),
            "value": best["fps"] if best else 0.0,
            "unit": "frames/sec/chip", "vs_baseline": 1.0, **doc,
        }))
        return

    ladder = [args.batch] if (args.cpu or args.no_retry) else sorted(
        {b for b in (args.batch, 16, 11, 8, 4) if b <= args.batch}, reverse=True
    )
    passthrough = passthrough_base

    fps = p50 = None
    used_batch = None
    last_exc = None
    in_process_ok = True  # flips after the first fault: client is poisoned
    for batch in ladder:
        if in_process_ok:
            try:
                fps, p50 = _attempt(
                    cfg, model, mano, variables, batch, args.iters, args.warmup
                )
                used_batch = batch
                break
            except Exception as exc:  # noqa: BLE001 — TPU/tunnel errors
                last_exc = exc
                _log(f"attempt batch={batch} FAILED: {type(exc).__name__}: "
                     f"{str(exc)[:500]}")
                traceback.print_exc(file=sys.stderr)
                if args.no_retry or args.cpu:
                    # CPU smoke mode never walks the subprocess ladder — a
                    # fresh-process retry would otherwise run on the default
                    # (TPU) backend and misreport the requested CPU run
                    break
                # A faulted client cannot recover in-process; retry THIS batch
                # and any remaining ladder entries in fresh subprocesses after
                # a recovery wait (also covers a single-entry ladder).
                in_process_ok = False
                jax.clear_caches()
                gc.collect()
                _log("switching to fresh-process attempts (60s recovery wait)")
                time.sleep(60)
                res = _subprocess_attempt(batch, passthrough)
                if res is not None:
                    fps, p50 = res["fps"], res["p50"]
                    used_batch = batch
                    break
        else:
            res = _subprocess_attempt(batch, passthrough)
            if res is not None:
                fps, p50 = res["fps"], res["p50"]
                used_batch = batch
                break

    if fps is None:
        _log("all ladder attempts failed")
        raise SystemExit(1) from last_exc

    _log(f"final: batch {used_batch}, p50 per-frame latency {p50:.2f} ms")

    # CPU smoke runs use a tiny config — a distinct metric name keeps them
    # from ever anchoring (or comparing against) real-chip rounds.
    metric = f"{args.setting}_eval_inference_throughput" + (
        "_cpu_smoke" if args.cpu else ""
    )
    mode = "pipelined"
    baseline = _read_baseline(metric, mode, cfg.sdf_infer_mode)
    vs = fps / baseline if baseline else 1.0

    # MFU accounting: FLOPs/frame from XLA cost analysis, peak from the
    # device kind (bf16 table); skipped when the number came from a
    # fresh-process rescue (the in-process client is fault-poisoned then).
    flops_frame = (
        _flops_per_frame(cfg, model, mano, variables, used_batch)
        if in_process_ok else None
    )
    device_kind = jax.devices()[0].device_kind
    peak = _peak_flops(device_kind)
    achieved = flops_frame * fps if flops_frame else None
    mfu = achieved / peak if (achieved and peak) else None
    if achieved:
        _log(
            f"{flops_frame / 1e9:.2f} GFLOP/frame -> "
            f"{achieved / 1e12:.3f} TFLOP/s achieved"
            + (f", MFU {mfu * 100:.2f}% of {device_kind}" if mfu else "")
        )

    # Per-chip throughput-optimal batch from a recorded --batch-sweep run
    # (docs/eval_batch_sweep.json), reported alongside the batch-22 parity
    # headline when the sweep's methodology matches this run.
    batch_opt = batch_opt_fps = None
    if not args.cpu and not (args.cfg or args.hier_levels or args.no_fused):
        # --cfg/--hier-levels/--no-fused change the compiled graph, so a
        # recorded default-graph sweep is not this run's operating curve
        batch_opt, batch_opt_fps = _read_batch_sweep(
            args.setting, cfg.sdf_infer_mode, cfg.compute_dtype, device_kind)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs, 3),
                # dispatch methodology — vs_baseline only compares same-mode
                # rounds (the latency ladder stays per-step blocking)
                "mode": mode,
                # sampler methodology (ADVICE-r2 lesson: record it)
                "sampler": cfg.sdf_infer_mode,
                # ladder fallback can shrink the batch — record it so a
                # reduced-batch number is never mistaken for the standard
                # batch-22 metric
                "batch": used_batch,
                # throughput-optimal operating point from the last recorded
                # --batch-sweep (None until one has been run on this setting)
                "batch_opt": batch_opt,
                "batch_opt_fps": batch_opt_fps,
                "p50_ms_per_frame": round(p50, 3),
                "gflop_per_frame": (
                    round(flops_frame / 1e9, 3) if flops_frame else None
                ),
                "mfu": round(mfu, 5) if mfu else None,
                "device": device_kind,
                # Argued PyTorch-GPU denominator (BASELINE.md "Analytical
                # GPU denominator": ~40 f/s is the most generous defensible
                # bound for main/test.py's dense-64^3 per-sample-loop eval
                # on an RTX 3090).  Only meaningful for the real-chip
                # dexycb headline metric at the standard batch.
                "vs_gpu_analytical": (
                    round(fps / ANALYTICAL_GPU_BASELINE_FPS, 2)
                    if (not args.cpu and args.setting == "dexycb")
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
