"""Serving transfer-split microprobe (docs/PERFORMANCE.md "Serving").

Times the three components a BatchingServer dispatch is made of, separately,
on the real chip: host->device input transfer (f32 vs u8 wire format),
the packed eval step's device time, and the device->host packed-output
pull.  Explains the gap between bench.py's device-resident 545 f/s and the
server's measured capacity: on a remote-attached chip the input bytes are
the bottleneck, and the u8 wire format cuts them 4x.

Usage: python scripts/probe_transfer_split.py [--batch 22] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, iters):
    fn()  # warmup (compile / first-transfer setup)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=22)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hoisdf_tpu.utils.compile_cache import enable as _cc

    _cc()
    import numpy as np

    from hoisdf_tpu.config import SYNTHETIC_TINY_OVERRIDES, get_config
    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.predictor import Predictor

    cfg = None
    if args.cpu:
        cfg = get_config(
            "dexycb", **SYNTHETIC_TINY_OVERRIDES, compute_dtype="float32",
            sdf_infer_mode="hier", hier_levels=((4, 16), (2, 32)),
            hier_levels_obj=None,
        )
    pred = Predictor(cfg, batch_size=args.batch)
    pred.warmup()
    inputs, _ = split_inputs_targets(
        synthetic_batch(pred.cfg, args.batch, seed=5, train=False))
    img_f32 = np.ascontiguousarray(inputs["img"])
    img_u8 = Predictor._quantize_img(img_f32)
    device = jax.devices()[0]

    def h2d(arr):
        # fresh numpy buffer each put so no transfer cache can alias it
        return lambda: jax.block_until_ready(
            jax.device_put(arr + 0, device))

    t_h2d_f32 = timed(h2d(img_f32), args.iters)
    t_h2d_u8 = timed(h2d(img_u8), args.iters)

    # device-resident packed step (what bench.py measures)
    dev_inputs = {k: jax.device_put(v, device) for k, v in pred._template.items()}

    def step():
        jax.block_until_ready(
            pred._packed_step(pred.params, pred.batch_stats, dev_inputs))

    t_step = timed(step, args.iters)

    # device->host pull of the packed outputs.  JAX caches the host copy
    # on the ArrayImpl after the first np.asarray, so timing repeated pulls
    # of ONE handle measures a dict lookup, not a transfer: time a fresh
    # step+pull per iteration instead and subtract the already-measured
    # step time (derived, so labeled d2h_packed_derived below).
    handle = pred._packed_step(pred.params, pred.batch_stats, dev_inputs)
    jax.block_until_ready(handle)

    def step_pull():
        np.asarray(
            pred._packed_step(pred.params, pred.batch_stats, dev_inputs))

    t_d2h = max(timed(step_pull, args.iters) - t_step, 0.0)

    # u8-wire step: same graph + the on-device LUT normalize (its cost =
    # step_u8 - step); also primes the persistent compile cache for the
    # u8 poisson sweep
    pred_u8 = Predictor(
        pred.cfg if args.cpu else None, batch_size=args.batch,
        transfer_dtype="uint8",
    )
    dev_u8 = {k: jax.device_put(v, device)
              for k, v in pred_u8._template.items()}

    def step_u8():
        jax.block_until_ready(
            pred_u8._packed_step(pred_u8.params, pred_u8.batch_stats, dev_u8))

    t_step_u8 = timed(step_u8, args.iters)

    print(json.dumps({
        "metric": "serving_transfer_split",
        "batch": args.batch,
        "img_mb_f32": round(img_f32.nbytes / 1e6, 2),
        "img_mb_u8": round(img_u8.nbytes / 1e6, 2),
        "h2d_f32_ms": round(t_h2d_f32 * 1e3, 1),
        "h2d_u8_ms": round(t_h2d_u8 * 1e3, 1),
        "step_ms": round(t_step * 1e3, 1),
        "step_u8_ms": round(t_step_u8 * 1e3, 1),
        "d2h_packed_derived_ms": round(t_d2h * 1e3, 1),
        "packed_out_mb": round(
            np.asarray(handle).nbytes / 1e6, 3),
        "device": device.device_kind,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
