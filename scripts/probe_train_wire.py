"""End-to-end train-step throughput INCLUDING host->device input transfer,
f32 vs u8 wire (ops/wire.py; Config.transfer_dtype).

probe_train_split.py measures pure device time (inputs pre-resident);
a real training loop ships every batch over the wire.  On the axon
remote-attached chip the f32 image wire costs ~923 ms/batch standalone
(docs/PERFORMANCE.md "Serving under load" transfer split), so the wire —
not the 148.8 ms grad step — can bound the loop.  This probe times the
actual loop shape train_loop.py runs: host batch -> (optional u8 encode)
-> device_put -> train_step, pipelined (no per-step blocking, lagged loss
fetch), over a pool of distinct host batches.

Modes per wire format:
  resident  — inputs pre-transferred (device floor; sanity vs probe_train_split)
  wire      — per-step device_put of wire-format host batches (the loader
              emits wire format in production; encode cost reported apart)

Usage: python scripts/probe_train_wire.py [--iters 20] [--batch 22]
       [--setting dexycb] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument(
        "--setting", default="dexycb",
        choices=("dexycb", "dexycb_full", "ho3d", "ho3d_render"),
    )
    p.add_argument("--pool", type=int, default=4,
                   help="distinct host batches cycled through the loop")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--mode", default="hier",
                   choices=("hier", "coarse2fine", "full"))
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hoisdf_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax.numpy as jnp
    import numpy as np

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.mano.layer import ManoBuffers
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.models.hoisdf import build_model
    from hoisdf_tpu.ops import wire
    from hoisdf_tpu.train import create_train_state, make_train_step

    tiny = dict(
        resnet_type=18, hidden_dim=64, dim_feedforward=128, enc_layers=2,
        dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048, hier_levels_obj=None,
    ) if args.cpu else {}
    cfg = get_config(
        args.setting, compute_dtype="float32" if args.cpu else "bfloat16",
        sdf_infer_mode=args.mode, **tiny)
    batch_n = args.batch or (2 if args.cpu else 22)
    model = build_model(cfg)
    mano = ManoBuffers.from_model(make_synthetic_mano(0))

    # Host batch pool: distinct arrays so every step really transfers.
    # Images pinned to the u8 grid (the datasets' images are u8-source),
    # so f32 and u8 wires carry identical values.
    pool_f32 = []
    for i in range(args.pool):
        b = synthetic_batch(cfg, batch_n, seed=100 + i, train=True)
        ins, tgs = split_inputs_targets(b)
        ins["img"] = (wire.quantize_image_u8(ins["img"])
                      .astype(np.float32) / 255.0)
        pool_f32.append((ins, tgs))
    pool_u8 = [wire.encode_batch(ins, tgs) for ins, tgs in pool_f32]

    def tree_mb(tree):
        return sum(np.asarray(v).nbytes for v in tree.values()) / 1e6

    # One-time host encode cost (what train_loop pays per batch when the
    # loader emits f32; a wire-format-emitting loader pays it in workers).
    t0 = time.perf_counter()
    for ins, tgs in pool_f32:
        wire.encode_batch(ins, tgs)
    encode_ms = (time.perf_counter() - t0) / len(pool_f32) * 1e3

    state0 = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in pool_f32[0][0].items()}, 1000,
    )
    rng = jax.random.PRNGKey(1)
    results = {
        "setting": args.setting, "batch": batch_n, "iters": args.iters,
        "pool": args.pool, "mode": args.mode,
        "encode_ms_per_batch": round(encode_ms, 2),
        "wire_MB_f32": round(tree_mb(pool_f32[0][0]) + tree_mb(pool_f32[0][1]), 2),
        "wire_MB_u8": round(tree_mb(pool_u8[0][0]) + tree_mb(pool_u8[0][1]), 2),
    }
    print(json.dumps({k: results[k] for k in
                      ("wire_MB_f32", "wire_MB_u8", "encode_ms_per_batch")}),
          flush=True)

    for fmt, pool in (("float32", pool_f32), ("uint8", pool_u8)):
        step = make_train_step(cfg, model, mano, donate_state=True)
        for resident in (True, False):
            s = jax.tree_util.tree_map(jnp.copy, state0)
            if resident:
                dev_pool = [
                    ({k: jnp.asarray(v) for k, v in ins.items()},
                     {k: jnp.asarray(v) for k, v in tgs.items()})
                    for ins, tgs in pool
                ]
                jax.block_until_ready(dev_pool)

            def one_step(i, s):
                if resident:
                    ins, tgs = dev_pool[i % len(pool)]
                else:
                    h_ins, h_tgs = pool[i % len(pool)]
                    ins = {k: jnp.asarray(v) for k, v in h_ins.items()}
                    tgs = {k: jnp.asarray(v) for k, v in h_tgs.items()}
                return step(s, ins, tgs, rng, jnp.asarray(0.03),
                            use_presampled=True)

            # warmup: compile + retrace absorption
            for i in range(2):
                s, losses = one_step(i, s)
                jax.block_until_ready(losses["total"])
            t0 = time.perf_counter()
            last = None
            for i in range(args.iters):  # pipelined: block once at the end
                s, losses = one_step(i, s)
                last = losses["total"]
            jax.block_until_ready(last)
            dt = (time.perf_counter() - t0) / args.iters
            key = f"{fmt}_{'resident' if resident else 'wire'}"
            results[key] = {
                "ms_per_step": round(dt * 1e3, 1),
                "fps": round(batch_n / dt, 1),
            }
            print(key, json.dumps(results[key]), flush=True)

    print("RESULT", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
