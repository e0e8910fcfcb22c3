"""Component benchmarks matching BASELINE.json's config list:

  1. MANO layer: batch-32 pose->vertex LBS forward (CPU parity reference)
  2. hand+object SDF MLP decode over 2048 sampled points, single frame
  3. ResNet-FPN backbone + pixel-aligned gather, batch-8 256px crops

Prints one JSON line per config.  ``python bench_components.py [--cpu]``.
"""

from __future__ import annotations

import argparse
import json
import time


def _time(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--train", action="store_true",
        help="also time the full training step (both branches; slow compile)",
    )
    parser.add_argument(
        "--sdf-infer-mode", default="hier",
        choices=["full", "coarse2fine", "hier"],
        help="field sampler for the --train field branch (hier is the "
             "production default, see bench.py)",
    )
    parser.add_argument(
        "--train-setting", default="dexycb",
        choices=["dexycb", "dexycb_full", "ho3d", "ho3d_render"],
        help="config preset for --train (ho3d_render = BASELINE.json "
             "config 5: big decoder + IK head + render extension)",
    )
    parser.add_argument(
        "--train-batch", type=int, default=None,
        help="per-chip batch for --train (default 22 = reference parity; "
             "the reference's 22 was a GPU memory limit, larger batches can "
             "lift MXU utilization on TPU)",
    )
    parser.add_argument(
        "--selection-quality", action="store_true",
        help="print the dense-scan-oracle quality table for the hier_levels "
             "candidates (the config.hier_levels promotion gate)",
    )
    parser.add_argument(
        "--serve", action="store_true",
        help="benchmark the BatchingServer serving path: closed-loop client "
             "threads -> dynamic micro-batching -> pipelined eval steps "
             "(tiny config under --cpu)",
    )
    parser.add_argument("--serve-seconds", type=float, default=20.0)
    parser.add_argument(
        "--serve-clients", type=int, default=None,
        help="concurrent closed-loop clients (default 3x batch)",
    )
    parser.add_argument(
        "--serve-poisson", default=None, metavar="R1,R2,...",
        help="open-loop Poisson arrival sweep: one load run per offered "
             "rate (req/s); emits p50/p95/p99 latency + goodput per rate",
    )
    parser.add_argument(
        "--serve-max-wait-ms", type=float, default=5.0,
        help="BatchingServer coalescing window for the poisson sweep",
    )
    parser.add_argument(
        "--transfer-dtype", default="uint8", choices=("float32", "uint8"),
        help="Predictor image wire format for the poisson sweep: uint8 "
             "ships raw bytes and normalizes on device (4x fewer "
             "host->device bytes — the serving bottleneck on a "
             "remote-attached chip); float32 is the parity wire format",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hoisdf_tpu.utils.compile_cache import enable as _enable_cc

    _enable_cc()
    import jax.numpy as jnp
    import numpy as np

    from hoisdf_tpu.mano.layer import ManoBuffers, mano_forward
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.models.resnet import ResNetBackbone
    from hoisdf_tpu.models.sdf_decoder import SDFDecoder
    from hoisdf_tpu.ops.grid_sample import multiscale_point_features
    from hoisdf_tpu.models.decoder import Decoder

    results = []
    rng = np.random.RandomState(0)

    if args.selection_quality:
        # Dense-scan-oracle quality table at the full production scale on
        # stress geometry (the config.hier_levels promotion gate; see
        # ops/selection_quality.py and config.py for the recorded decision).
        from hoisdf_tpu.ops.selection_quality import (
            gate,
            selection_quality,
            stress_geometry,
        )

        field, center, cam, bbox = stress_geometry(batch=2, seed=3)
        for name, levels, num_points in (
            ("hier_default_8x128_4x224_2x448",
             ((8, 128), (4, 224), (2, 448)), 600),
            ("hier_prev_default_4x256_2x512", ((4, 256), (2, 512)), 600),
            ("hier_exact_8x160_4x256_2x512",
             ((8, 160), (4, 256), (2, 512)), 600),
            ("hier_rejected_4x128_2x256", ((4, 128), (2, 256)), 600),
            # the object field's promoted default, gated at ITS K
            ("hier_obj_default_8x104_4x184_2x368_k200",
             ((8, 104), (4, 184), (2, 368)), 200),
        ):
            rep = selection_quality(
                field, center, cam, bbox, sdf_scale=3.1,
                num_points=num_points, bins_n=64, levels=levels,
            )
            print(json.dumps({
                "metric": f"selection_quality/{name}",
                "overlap_at_k": [round(float(x), 4) for x in rep["overlap_at_k"]],
                "mean_abs_ratio": [round(float(x), 4) for x in rep["mean_abs_ratio"]],
                "max_abs_ratio": [round(float(x), 4) for x in rep["max_abs_ratio"]],
                "rank_corr": [round(float(x), 4) for x in rep["rank_corr"]],
                "gate_pass": gate(rep),
            }))
        return

    if args.serve_poisson is not None:
        # Open-loop serving load sweep (VERDICT r4 #7): Poisson arrivals at
        # several offered rates; latency percentiles + goodput per rate.
        from hoisdf_tpu.config import (
            SYNTHETIC_TINY_OVERRIDES,
            get_config,
        )
        from hoisdf_tpu.data.synthetic import (
            split_inputs_targets,
            synthetic_batch,
        )
        from hoisdf_tpu.predictor import (
            BatchingServer,
            Predictor,
            run_poisson_load,
        )

        if args.cpu:
            cfg = get_config(
                "dexycb", **SYNTHETIC_TINY_OVERRIDES,
                compute_dtype="float32", sdf_infer_mode="hier",
                hier_levels=((4, 16), (2, 32)), hier_levels_obj=None,
            )
            batch = 4
        else:
            cfg, batch = None, 22  # Predictor's production default config
        pred = Predictor(
            cfg, batch_size=batch, transfer_dtype=args.transfer_dtype
        )
        pred.warmup()
        pool_np, _ = split_inputs_targets(synthetic_batch(
            pred.cfg, batch, seed=5, train=False
        ))
        if args.transfer_dtype == "uint8":
            # submit u8 frames (what a camera provides) so the open-loop
            # driver measures the u8 wire format end to end
            pool_np["img"] = Predictor._quantize_img(pool_np["img"])
        frames = [
            {k: v[i] for k, v in pool_np.items()} for i in range(batch)
        ]
        for rate in [float(r) for r in args.serve_poisson.split(",")]:
            with BatchingServer(
                pred, max_wait_ms=args.serve_max_wait_ms
            ) as srv:
                rep = run_poisson_load(
                    srv, frames, rate, args.serve_seconds, seed=7
                )
                batches_n = srv.batches_dispatched
            lat = np.asarray(rep.pop("latencies_s")) * 1e3
            q = (lambda p: round(float(lat[min(int(len(lat) * p),
                                               len(lat) - 1)]), 1)
                 if len(lat) else None)
            print(json.dumps({
                "metric": "serving_poisson",
                "value": round(rep["goodput_hz"], 1),
                "unit": "frames/sec",
                "offered_hz": rate,
                "submitted": rep["submitted"],
                "completed": rep["completed"],
                "max_wait_ms": args.serve_max_wait_ms,
                "batch": batch,
                "transfer_dtype": args.transfer_dtype,
                "mean_batch_fill": round(
                    rep["completed"] / max(batches_n, 1), 2),
                "p50_ms": q(0.50), "p95_ms": q(0.95), "p99_ms": q(0.99),
                "frac_under_50ms": round(float((lat < 50).mean()), 3)
                if len(lat) else None,
                "frac_under_100ms": round(float((lat < 100).mean()), 3)
                if len(lat) else None,
            }), flush=True)
        return

    if args.serve:
        # Serving-path benchmark: N closed-loop clients each submit one
        # frame at a time to a BatchingServer; the server coalesces them
        # into full device batches and keeps pipeline_depth steps in
        # flight.  The ceiling is bench.py's pipelined eval number; the
        # gap is batching + scatter overhead.
        import threading

        from hoisdf_tpu.config import (
            SYNTHETIC_TINY_OVERRIDES,
            get_config,
        )
        from hoisdf_tpu.data.synthetic import (
            split_inputs_targets,
            synthetic_batch,
        )
        from hoisdf_tpu.predictor import BatchingServer, Predictor

        if args.cpu:
            cfg = get_config(
                "dexycb", **SYNTHETIC_TINY_OVERRIDES,
                compute_dtype="float32", sdf_infer_mode="hier",
                hier_levels=((4, 16), (2, 32)), hier_levels_obj=None,
            )
            batch = 4
        else:
            cfg, batch = None, 22  # Predictor's production default config
        pred = Predictor(cfg, batch_size=batch)
        pred.warmup()
        pool_np, _ = split_inputs_targets(synthetic_batch(
            pred.cfg, batch, seed=5, train=False
        ))
        frames = [
            {k: v[i] for k, v in pool_np.items()} for i in range(batch)
        ]
        n_clients = args.serve_clients or 3 * batch
        latencies, lat_lock = [], threading.Lock()
        stop_at = time.perf_counter() + args.serve_seconds

        def client(i: int):
            j = i % batch
            while time.perf_counter() < stop_at:
                t0 = time.perf_counter()
                srv.submit(frames[j]).result(timeout=300)
                with lat_lock:
                    latencies.append(time.perf_counter() - t0)

        with BatchingServer(pred, max_wait_ms=5.0) as srv:
            threads = [
                threading.Thread(target=client, args=(i,))
                for i in range(n_clients)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            elapsed = time.perf_counter() - t0
            served, batches_n = srv.frames_served, srv.batches_dispatched
        lat = np.sort(np.asarray(latencies)) * 1e3
        print(json.dumps({
            "metric": "serving_throughput",
            "value": round(served / elapsed, 1),
            "unit": "frames/sec",
            "clients": n_clients,
            "batch": batch,
            "mean_batch_fill": round(served / max(batches_n, 1), 2),
            "request_p50_ms": round(float(lat[len(lat) // 2]), 1) if len(lat) else None,
            "request_p95_ms": round(float(lat[int(len(lat) * 0.95)]), 1) if len(lat) else None,
        }))
        return

    # 1. MANO batch-32 (BASELINE config #1)
    buffers = ManoBuffers.from_model(make_synthetic_mano(0))
    pose = jnp.asarray(rng.randn(32, 48).astype(np.float32) * 0.3)
    betas = jnp.asarray(rng.randn(32, 10).astype(np.float32) * 0.3)
    mano_fn = jax.jit(lambda p, b: mano_forward(buffers, p, b))
    dt = _time(mano_fn, pose, betas, iters=args.iters)
    results.append({"metric": "mano_batch32_forward", "value": round(32 / dt, 1),
                    "unit": "hands/sec"})

    # 2. SDF decode @ 2048 points (BASELINE config #2): both fields
    dec = SDFDecoder()
    x = jnp.asarray(rng.randn(2048, 289).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), x)["params"]
    sdf_fn = jax.jit(lambda p, xx: dec.apply({"params": p}, xx)[0])
    dt = _time(sdf_fn, params, x, iters=args.iters)
    results.append({"metric": "sdf_decode_2048pts", "value": round(2 * 2048 / dt),
                    "unit": "points/sec (hand+obj)"})

    # 3. backbone + pyramid + gather, batch-8 (BASELINE config #3)
    res = 64 if args.cpu else 256
    bb = ResNetBackbone(18 if args.cpu else 50)
    img = jnp.asarray(rng.rand(8, res, res, 3).astype(np.float32))
    bbv = bb.init(jax.random.PRNGKey(0), img)
    dcd = Decoder()
    feat, skips = bb.apply(bbv, img)
    dv = dcd.init(jax.random.PRNGKey(1), feat, skips)
    grid = jnp.asarray(rng.rand(8, 800, 2).astype(np.float32) * 2 - 1)
    layers = ("stride2", "stride4", "stride8", "stride16", "stride32")

    @jax.jit
    def pipeline(bbv, dv, img, grid):
        feat, skips = bb.apply(bbv, img)
        pyr, _ = dcd.apply(dv, feat, skips)
        return multiscale_point_features(pyr, grid, layers)

    dt = _time(pipeline, bbv, dv, img, grid, iters=args.iters)
    results.append({"metric": "backbone_fpn_gather_b8", "value": round(8 / dt, 2),
                    "unit": "frames/sec"})

    if args.train:
        from hoisdf_tpu.config import (
            SYNTHETIC_TINY_OVERRIDES,
            get_config,
        )
        from hoisdf_tpu.data.synthetic import synthetic_batch, split_inputs_targets
        from hoisdf_tpu.models.hoisdf import build_model
        from hoisdf_tpu.train import create_train_state, make_train_step

        cfg = get_config(
            args.train_setting,
            compute_dtype="float32" if args.cpu else "bfloat16",
            sdf_infer_mode=args.sdf_infer_mode,
            **({"resnet_type": 18, "hidden_dim": 64, "dim_feedforward": 128,
                "enc_layers": 2, "dec_layers": 2, "num_samp_hand": 32,
                "num_samp_obj": 16, "input_img_shape": (64, 64),
                "output_hm_shape": (32, 32, 32), "bins_n": 16,
                "sdf_infer_chunk": 2048} if args.cpu else {}),
        )
        batch_n = args.train_batch or (2 if args.cpu else 22)
        model = build_model(cfg)
        b = synthetic_batch(cfg, batch_n, train=True)
        t_inputs, t_targets = split_inputs_targets(b)
        t_inputs = {k: jnp.asarray(v) for k, v in t_inputs.items()}
        t_targets = {k: jnp.asarray(v) for k, v in t_targets.items()}
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), t_inputs, 1000
        )
        step = make_train_step(cfg, model, buffers, donate_state=True)
        setting_tag = (
            "" if args.train_setting == "dexycb" else f"_{args.train_setting}"
        )
        for name, use_pre in (
            (f"train_presampled{setting_tag}", True),
            (f"train_field{setting_tag}", False),
        ):
            # fresh buffer copy per branch: the donated state is consumed
            s = jax.tree_util.tree_map(jnp.copy, state)
            def one():
                nonlocal s
                s, losses = step(s, t_inputs, t_targets, jax.random.PRNGKey(1),
                                 jnp.asarray(0.03), use_presampled=use_pre)
                return losses["total"]
            dt = _time(lambda: one(), iters=max(args.iters // 2, 2))
            # FLOPs of the whole step (fwd+bwd+update) from XLA cost
            # analysis — the MFU denominator for the train decomposition
            # (docs/PERFORMANCE.md).  Compile rides the persistent cache.
            try:
                cost = step.lower(
                    s, t_inputs, t_targets, jax.random.PRNGKey(1),
                    jnp.asarray(0.03), use_presampled=use_pre,
                ).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                gflop_frame = float(cost.get("flops", 0.0)) / batch_n / 1e9
            except Exception:  # noqa: BLE001
                gflop_frame = None
            results.append({"metric": name, "value": round(batch_n / dt, 1),
                            "unit": "frames/sec",
                            "gflop_per_frame":
                                round(gflop_frame, 2) if gflop_frame else None})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
