"""Feasibility probe: does this TPU stack run int8 convs/dots faster than
bf16?  The eval graph is HBM-bandwidth-bound at 84% of its roofline cap
(docs/PERFORMANCE.md), so the only remaining throughput lever is removing
bytes — int8 activations/weights halve conv traffic IF the stack lowers
int8 x int8 -> int32 onto the v5e MXU at rate.  This probe answers that
before any quantization engineering is attempted.

Shapes: one bandwidth-ish conv (large spatial, thin channels), one
MXU-bound conv (small spatial, fat channels), one square dot (peak-rate
check).  Dependency-chained timing (CLAUDE.md: sub-ms one-shot timings
through the axon tunnel are artifacts).

Usage: python scripts/probe_int8.py [--iters 16] [--cpu]
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
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from hoisdf_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    rng = jax.random.PRNGKey(0)

    def conv_case(name, B, H, W, Cin, Cout, k=3):
        x_f = jax.random.normal(rng, (B, H, W, Cin), jnp.bfloat16)
        w_f = jax.random.normal(rng, (k, k, Cin, Cout), jnp.bfloat16) * 0.05
        x_i = jnp.clip(x_f.astype(jnp.float32) * 16, -127, 127).astype(jnp.int8)
        w_i = jnp.clip(w_f.astype(jnp.float32) * 640, -127, 127).astype(jnp.int8)
        dn = lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                        ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def run_bf16(c):
            y = lax.conv_general_dilated(
                x_f + c.astype(jnp.bfloat16), w_f, (1, 1), "SAME",
                dimension_numbers=dn)
            return y.mean().astype(jnp.float32)

        @jax.jit
        def run_int8(c):
            # carry folded into the weight side via a no-op select so the
            # chain has a data dependency without dequantizing the input
            xi = jnp.where(c < jnp.inf, x_i, x_i)
            y = lax.conv_general_dilated(
                xi, w_i, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return y.astype(jnp.float32).mean()

        t_b = chain_time(run_bf16, jnp.zeros((), jnp.float32), args.iters)
        t_i = chain_time(run_int8, jnp.zeros((), jnp.float32), args.iters)
        gflop = 2 * B * H * W * Cin * Cout * k * k / 1e9
        print(json.dumps({
            "case": name, "shape": [B, H, W, Cin, Cout],
            "bf16_ms": round(t_b * 1e3, 3), "int8_ms": round(t_i * 1e3, 3),
            "speedup": round(t_b / t_i, 3),
            "bf16_tflops": round(gflop / t_b / 1e3, 1),
            "int8_tops": round(gflop / t_i / 1e3, 1),
        }), flush=True)

    def dot_case(name, M, K, N):
        a_f = jax.random.normal(rng, (M, K), jnp.bfloat16)
        b_f = jax.random.normal(rng, (K, N), jnp.bfloat16)
        a_i = jnp.clip(a_f.astype(jnp.float32) * 16, -127, 127).astype(jnp.int8)
        b_i = jnp.clip(b_f.astype(jnp.float32) * 16, -127, 127).astype(jnp.int8)

        @jax.jit
        def run_bf16(c):
            return ((a_f + c.astype(jnp.bfloat16)) @ b_f).mean().astype(jnp.float32)

        @jax.jit
        def run_int8(c):
            ai = jnp.where(c < jnp.inf, a_i, a_i)
            y = lax.dot(ai, b_i, preferred_element_type=jnp.int32)
            return y.astype(jnp.float32).mean()

        t_b = chain_time(run_bf16, jnp.zeros((), jnp.float32), args.iters)
        t_i = chain_time(run_int8, jnp.zeros((), jnp.float32), args.iters)
        gflop = 2 * M * K * N / 1e9
        print(json.dumps({
            "case": name, "shape": [M, K, N],
            "bf16_ms": round(t_b * 1e3, 3), "int8_ms": round(t_i * 1e3, 3),
            "speedup": round(t_b / t_i, 3),
            "bf16_tflops": round(gflop / t_b / 1e3, 1),
            "int8_tops": round(gflop / t_i / 1e3, 1),
        }), flush=True)

    # decoder-ish bandwidth-bound conv: large spatial, moderate channels
    conv_case("conv_bw_bound", 22, 128, 128, 64, 64)
    # backbone-ish MXU-bound conv: small spatial, fat channels
    conv_case("conv_mxu_bound", 22, 16, 16, 512, 512)
    # mid conv (stride8-ish decoder level)
    conv_case("conv_mid", 22, 32, 32, 256, 256)
    # square dot: peak-rate ratio check
    dot_case("dot_peak", 4096, 4096, 4096)


if __name__ == "__main__":
    main()
