"""Benchmark: DexYCB eval-mode inference throughput (frames/sec/chip).

This is the driver's north-star metric (BASELINE.json): full HOISDF
inference — backbone, pyramid, dual SDF fields, batched field-guided 64^3
point sampling, transformers, MANO head — at the reference eval batch size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the first recorded round (BENCH_r1.json)
when present — the reference repo publishes no numbers (BASELINE.md), so the
baseline is self-relative until a PyTorch GPU measurement exists.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="CPU smoke mode")
    parser.add_argument("--batch", type=int, default=22)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument(
        "--sdf-infer-mode", default="coarse2fine", choices=["full", "coarse2fine"],
        help="field-guided sampling strategy (coarse2fine ~7x fewer SDF evals)",
    )
    parser.add_argument(
        "--dtype", default="bfloat16", choices=["float32", "bfloat16"],
        help="activation compute dtype for the conv/attention/SDF hot path",
    )
    parser.add_argument("--no-fused", action="store_true",
                        help="disable the fused Pallas SDF-MLP kernel")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import synthetic_batch, split_inputs_targets
    from hoisdf_tpu.mano.layer import ManoBuffers
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.models.hoisdf import build_model
    from hoisdf_tpu.train import make_eval_step

    if args.cpu:
        cfg = get_config(
            "dexycb", resnet_type=18, hidden_dim=64, dim_feedforward=128,
            enc_layers=2, dec_layers=2, num_samp_hand=32, num_samp_obj=16,
            input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
            sdf_infer_chunk=2048,
        )
        args.batch = min(args.batch, 4)
    else:
        cfg = get_config(
            "dexycb", sdf_infer_mode=args.sdf_infer_mode,
            compute_dtype=args.dtype, fused_sdf_infer=not args.no_fused,
        )

    model = build_model(cfg)
    mano = ManoBuffers.from_model(make_synthetic_mano(0))

    batch_np = synthetic_batch(cfg, batch_size=args.batch, train=False)
    inputs, _ = split_inputs_targets(batch_np)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}

    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, inputs, use_presampled=False,
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    eval_step = make_eval_step(cfg, model, mano)

    for _ in range(args.warmup):
        preds = eval_step(params, batch_stats, inputs)
        jax.block_until_ready(preds)

    iter_times = []
    t0 = time.perf_counter()
    for _ in range(args.iters):
        it0 = time.perf_counter()
        preds = eval_step(params, batch_stats, inputs)
        jax.block_until_ready(preds)
        iter_times.append(time.perf_counter() - it0)
    dt = time.perf_counter() - t0

    fps = args.batch * args.iters / dt
    p50 = sorted(iter_times)[len(iter_times) // 2] / args.batch * 1000
    print(
        f"[bench] p50 per-frame latency: {p50:.2f} ms (batch {args.batch})",
        file=sys.stderr,
    )

    baseline = None
    prev = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")))
    if prev:
        try:
            with open(prev[0]) as f:
                baseline = json.load(f).get("value")
        except Exception:
            baseline = None
    vs = fps / baseline if baseline else 1.0

    print(
        json.dumps(
            {
                "metric": "dexycb_eval_inference_throughput",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
