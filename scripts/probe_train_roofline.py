"""Train-step roofline attribution + remat A/B (VERDICT r3 #4).

Answers "why is the ho3d train step at 21-23% MFU" with evidence instead of
assertion: pulls FLOPs and HBM bytes from XLA's cost analysis of the
compiled step, computes the arithmetic-intensity roofline cap for the chip,
and A/Bs gradient rematerialization policies (activation HBM traffic vs
recompute FLOPs) on the same chained-dispatch harness as
probe_train_split.py.  Optional --trace captures a jax.profiler trace.

Usage:
    python scripts/probe_train_roofline.py --setting ho3d [--iters 6]
        [--remat none full dots] [--trace /tmp/ho3d_trace] [--cpu]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# HBM bandwidth by device kind (substring-matched like bench._peak_flops,
# so a libtpu device_kind rename degrades to None instead of wrong numbers)
_HBM_BW = {"v4": 1228e9, "v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9,
           "v6e": 1640e9, "v6 lite": 1640e9}


def _hbm_bw(device_kind: str):
    kind = device_kind.lower()
    for key in sorted(_HBM_BW, key=len, reverse=True):
        if key in kind:
            return _HBM_BW[key]
    return None


def chain_time(fn, iters):
    import jax
    import jax.numpy as jnp

    carry = fn(jnp.zeros((), jnp.float32))
    jax.block_until_ready(carry)
    carry = fn(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--setting", default="ho3d")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--mode", default="hier")
    p.add_argument(
        "--remat", nargs="+", default=["none", "full", "dots"],
        choices=("none", "full", "dots"),
        help="checkpoint policies to A/B: none = XLA default (save all "
        "activations), full = recompute everything in bwd, dots = "
        "jax.checkpoint_policies.checkpoint_dots (save matmul outputs, "
        "recompute elementwise)",
    )
    p.add_argument("--trace", default=None, help="jax.profiler trace dir")
    p.add_argument("--presampled", action="store_true",
                   help="probe the presampled branch instead of field")
    p.add_argument(
        "--dump-hlo", default=None, metavar="PATH",
        help="write the optimized HLO of the compiled grad step here and "
        "print its fingerprint (sha256 of the module text) BEFORE running "
        "it — a TPU kernel fault kills the client, so the artifact that "
        "identifies the failing graph must exist first (same protocol as "
        "tools/repro_fused_fault.py)",
    )
    p.add_argument(
        "--compile-only", action="store_true",
        help="lower+compile and report cost analysis (and --dump-hlo) "
        "without executing — fingerprint a known-faulting batch without "
        "taking the chip down",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hoisdf_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax.numpy as jnp
    import optax

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.losses import weighted_total
    from hoisdf_tpu.mano.layer import ManoBuffers
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.models.hoisdf import build_model
    from hoisdf_tpu.train import compute_losses, create_train_state

    tiny = dict(
        resnet_type=18, hidden_dim=64, dim_feedforward=128, enc_layers=2,
        dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048,
    ) if args.cpu else {}
    cfg = get_config(
        args.setting, compute_dtype="float32" if args.cpu else "bfloat16",
        sdf_infer_mode=args.mode, **tiny)
    batch_n = args.batch or (2 if args.cpu else 22)
    model = build_model(cfg)
    mano = ManoBuffers.from_model(make_synthetic_mano(0))
    b = synthetic_batch(cfg, batch_n, train=True)
    inputs, targets = split_inputs_targets(b)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    targets = {k: jnp.asarray(v) for k, v in targets.items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), inputs, 1000)
    use_pre = bool(args.presampled)

    from bench import _peak_flops  # substring-matched bf16 peak table

    device_kind = jax.devices()[0].device_kind
    peak = _peak_flops(device_kind)
    bw = _hbm_bw(device_kind)

    def apply_fn(p, bs, key):
        out, mut = model.apply(
            {"params": p, "batch_stats": bs}, inputs,
            use_presampled=use_pre, dist_range=0.03, train=True,
            rngs={"sample_noise": key, "dropout": jax.random.fold_in(key, 1)},
            mutable=["batch_stats"],
        )
        losses, _ = compute_losses(cfg, out, targets, mano)
        return weighted_total(cfg, losses), mut["batch_stats"]

    policies = {
        "none": None,
        "full": lambda f: jax.checkpoint(f),
        "dots": lambda f: jax.checkpoint(
            f, policy=jax.checkpoint_policies.checkpoint_dots
        ),
    }

    for name in args.remat:
        wrap = policies[name]

        @functools.partial(jax.jit)
        def grad_step(carry, params, bs):
            key = jax.random.fold_in(
                jax.random.PRNGKey(1), carry.astype(jnp.int32) * 0
            )
            f = apply_fn if wrap is None else wrap(
                lambda p, b_, k: apply_fn(p, b_, k)
            )
            (total, _), grads = jax.value_and_grad(f, has_aux=True)(
                params, bs, key
            )
            return total + optax.global_norm(grads) + carry * 0

        # cost analysis of THIS policy's compiled graph
        lowered = grad_step.lower(
            jnp.zeros((), jnp.float32), state.params, state.batch_stats
        )
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if args.dump_hlo and name == args.remat[0]:
            import hashlib

            hlo_text = compiled.as_text()
            with open(args.dump_hlo, "w") as f:
                f.write(hlo_text)
            print(json.dumps({
                "metric": f"train_grad_hlo_{args.setting}",
                "batch": batch_n,
                "remat": name,
                "hlo_path": args.dump_hlo,
                "hlo_fingerprint": hashlib.sha256(
                    hlo_text.encode()).hexdigest()[:16],
                "hlo_bytes": len(hlo_text),
            }), flush=True)
        flops = float(cost.get("flops", 0.0))
        byt = float(cost.get("bytes accessed", 0.0))
        intensity = flops / byt if byt else None
        ridge = (peak / bw) if (peak and bw) else None
        roofline_cap = (
            min(1.0, intensity / ridge) if (intensity and ridge) else None
        )

        if args.compile_only:
            t = None
            achieved = mfu = None
        else:
            t = chain_time(
                lambda c: grad_step(c, state.params, state.batch_stats),
                args.iters,
            )
            achieved = flops / t if flops else None
            mfu = achieved / peak if (achieved and peak) else None
        print(json.dumps({
            "metric": f"train_grad_roofline_{args.setting}_{name}",
            "branch": "presampled" if use_pre else "field",
            "batch": batch_n,
            "ms": round(t * 1e3, 2) if t else None,
            "fps": round(batch_n / t, 1) if t else None,
            "gflop": round(flops / 1e9, 2),
            "hbm_gb": round(byt / 1e9, 3),
            "intensity_flop_per_byte": round(intensity, 1) if intensity else None,
            "ridge_flop_per_byte": round(ridge, 1) if ridge else None,
            "roofline_mfu_cap": round(roofline_cap, 3) if roofline_cap else None,
            "achieved_mfu": round(mfu, 4) if mfu else None,
            "device": device_kind,
        }), flush=True)

        if args.trace and name == "none":
            os.makedirs(args.trace, exist_ok=True)
            try:
                jax.profiler.start_trace(args.trace)
                c = grad_step(
                    jnp.zeros((), jnp.float32), state.params, state.batch_stats
                )
                jax.block_until_ready(c)
                jax.profiler.stop_trace()
                print(json.dumps({"trace": args.trace, "ok": True}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps(
                    {"trace": args.trace, "ok": False,
                     "err": f"{type(e).__name__}: {str(e)[:200]}"}
                ), flush=True)


if __name__ == "__main__":
    main()
