"""One-off decomposition probe for the train step (docs/PERFORMANCE.md
ledger): forward-only vs value_and_grad vs grad+AdamW-update, both branches,
dependency-chained (true device time through the axon tunnel).

Usage: python scripts/probe_train_split.py [--iters 8] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, init_carry, iters):
    import jax

    # TWO warmup calls: the first compiles; the second absorbs the
    # weak->strong dtype retrace of the carry scalar (a second full compile
    # through the remote tunnel — this poisoned the first probe readings).
    carry = fn(init_carry)
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
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--mode", default="hier", choices=("hier", "coarse2fine", "full"),
        help="sdf_infer_mode for the field-sampling branch ('hier' is the "
        "production sampler and, since round 4, the config default; 'full' "
        "is the dense parity scan — 927 ms/step at batch 22)",
    )
    p.add_argument(
        "--setting", default="dexycb",
        choices=("dexycb", "dexycb_full", "ho3d", "ho3d_render"),
        help="config preset to decompose (ho3d_render = BASELINE.json "
        "config 5: big decoder + IK head + render extension)",
    )
    p.add_argument(
        "--batch", type=int, default=None,
        help="per-chip batch (default 22 on TPU = reference parity, 2 on CPU)",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hoisdf_tpu.utils.compile_cache import enable as _cc

    _cc()
    import functools

    import jax.numpy as jnp

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.mano.layer import ManoBuffers
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.models.hoisdf import build_model
    from hoisdf_tpu.train import (
        compute_losses,
        create_train_state,
        make_train_step,
    )
    from hoisdf_tpu.losses import weighted_total

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

    import optax

    results = {}
    for name, use_pre in (("presampled", True), ("field", False)):
        # Chaining lives INSIDE jit (carry in, carry-dependent key, scalar
        # out): exactly one dispatch per iteration, no eager tunnel ops.
        @functools.partial(jax.jit, static_argnames=("use_presampled",))
        def fwd_only(carry, params, bs, inputs, targets, *, use_presampled):
            key = jax.random.fold_in(
                jax.random.PRNGKey(1), carry.astype(jnp.int32) * 0
            )
            out, _ = model.apply(
                {"params": params, "batch_stats": bs}, inputs,
                use_presampled=use_presampled, dist_range=0.03, train=True,
                rngs={"sample_noise": key, "dropout": jax.random.fold_in(key, 1)},
                mutable=["batch_stats"],
            )
            losses, _ = compute_losses(cfg, out, targets, mano)
            return weighted_total(cfg, losses) + carry * 0

        @functools.partial(jax.jit, static_argnames=("use_presampled",))
        def grad_only(carry, params, bs, inputs, targets, *, use_presampled):
            key = jax.random.fold_in(
                jax.random.PRNGKey(1), carry.astype(jnp.int32) * 0
            )

            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, inputs,
                    use_presampled=use_presampled, dist_range=0.03, train=True,
                    rngs={"sample_noise": key,
                          "dropout": jax.random.fold_in(key, 1)},
                    mutable=["batch_stats"],
                )
                losses, _ = compute_losses(cfg, out, targets, mano)
                return weighted_total(cfg, losses), mut["batch_stats"]

            (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # global_norm consumes EVERY grad leaf — nothing for XLA to DCE
            return total + optax.global_norm(grads) + carry * 0

        # batch passed as ARGUMENTS: closure-captured arrays become program
        # constants that the axon tunnel re-streams on every dispatch
        # (measured: 8 s/call vs 136 ms for the arg-passing full step)
        def chain_fwd(c):
            return fwd_only(c, state.params, state.batch_stats, inputs,
                            targets, use_presampled=use_pre)

        def chain_grad(c):
            return grad_only(c, state.params, state.batch_stats, inputs,
                             targets, use_presampled=use_pre)

        t_fwd = chain_time(chain_fwd, jnp.zeros((), jnp.float32), args.iters)
        t_grad = chain_time(chain_grad, jnp.zeros((), jnp.float32), args.iters)

        step = make_train_step(cfg, model, mano, donate_state=True)
        s = jax.tree_util.tree_map(jnp.copy, state)

        def chain_step(carry):
            nonlocal s
            s, losses = step(s, inputs, targets, jax.random.PRNGKey(1),
                             jnp.asarray(0.03), use_presampled=use_pre)
            return losses["total"]

        t_step = chain_time(chain_step, None, args.iters)
        results[name] = dict(
            fwd_ms=round(t_fwd * 1e3, 2),
            fwd_bwd_ms=round(t_grad * 1e3, 2),
            full_step_ms=round(t_step * 1e3, 2),
            bwd_ms=round((t_grad - t_fwd) * 1e3, 2),
            update_ms=round((t_step - t_grad) * 1e3, 2),
            fps=round(batch_n / t_step, 1),
        )
        print(f"{args.setting}:{name}", json.dumps(results[name]), flush=True)


if __name__ == "__main__":
    main()
