"""Fused DeepSDF-MLP Pallas kernel for the field-guided sampling hot loop.

The dense SDF evaluation (37K-260K points/frame through a 6-layer MLP,
main/model.py:246-355) dominates inference FLOPs.  XLA runs each layer as a
separate kernel with [N,512] activations bouncing through HBM; this kernel
keeps ALL layer weights (~1.9 MB bf16) and the activations of one point tile
resident in VMEM and fuses matmul+bias+ReLU+skip-concat+tanh in a single
pass — the classic MLP-fusion pattern from the Pallas guide.

Used only inside ``sdf_infer`` (reference runs it under no_grad,
main/model.py:463; no backward pass needed, dropout off).  The training-path
``sdf_forward`` keeps the flax module (grads + dropout).

Weight-norm folding (g * v/||v||) happens outside, once per call.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DeepSDF layout (common/nets/sdf_net.py): dims [289, 512, 223(+289), 512,
# 512, 1]; skip re-concat of the input before layer 2.
IN_DIM = 289
H = 512
SKIP_OUT = 223  # 512 - 289


def _kernel(x_ref, w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, out_ref):
    x = x_ref[:]
    f32 = jnp.float32
    h = jnp.maximum(jnp.dot(x, w0[:], preferred_element_type=f32) + b0[:], 0.0)
    h = h.astype(x.dtype)
    h = jnp.maximum(jnp.dot(h, w1[:], preferred_element_type=f32) + b1[:], 0.0)
    h = h.astype(x.dtype)
    h = jnp.concatenate([h, x], axis=-1)  # latent skip (sdf_net.py:97-98)
    h = jnp.maximum(jnp.dot(h, w2[:], preferred_element_type=f32) + b2[:], 0.0)
    h = h.astype(x.dtype)
    h = jnp.maximum(jnp.dot(h, w3[:], preferred_element_type=f32) + b3[:], 0.0)
    h = h.astype(x.dtype)
    out = jnp.dot(h, w4[:], preferred_element_type=f32) + b4[:]
    out_ref[:] = jnp.tanh(out).astype(out_ref.dtype)


def fold_weight_norm(params) -> Tuple[jax.Array, ...]:
    """Fold the flax SDFDecoder params into plain (w, b) pairs, [in,out]."""
    ws = []
    for i in range(4):
        p = params[f"linh{i}"]
        v, g, b = p["v"], p["g"], p["bias"]
        norm = jnp.linalg.norm(v, axis=1, keepdims=True)
        w = (g[:, None] / jnp.maximum(norm, 1e-12)) * v  # [out, in]
        ws.extend([w.T, b])
    ws.extend([params["linh4"]["kernel"], params["linh4"]["bias"]])
    return tuple(ws)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def sdf_mlp_fused(
    x: jax.Array,  # [N, 289]
    weights: Tuple[jax.Array, ...],  # folded (w,b) x5 from fold_weight_norm
    *,
    tile: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Fused eval-mode SDF decode: [N, in_dim] -> [N, 1] tanh(sdf).

    All dims come from the operands (the production decoder is
    289/512/223-skip, a reduced config e.g. 97/hidden — the kernel body is
    layout-agnostic; hardcoding IN_DIM here once broke every small-config
    run on TPU backends, where the fused path is on while CPU tests take
    the plain-XLA fallback)."""
    n, in_dim = x.shape

    w0, b0, w1, b1, w2, b2, w3, b3, w4, b4 = [w.astype(x.dtype) for w in weights]
    if w0.shape[0] != in_dim:
        raise ValueError(
            f"sdf_mlp_fused: input dim {in_dim} != w0 rows {w0.shape[0]}"
        )
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, in_dim), x.dtype)], axis=0)
    n_pad = x.shape[0]

    # biases as [1, out] rows for clean VMEM broadcast
    b0, b1, b2, b3, b4 = (b.reshape(1, -1) for b in (b0, b1, b2, b3, b4))

    grid = (n_pad // tile,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    mm_flops = sum(w.shape[0] * w.shape[1] for w in (w0, w1, w2, w3, w4))
    w_bytes = sum(w.size * x.dtype.itemsize for w in (w0, w1, w2, w3, w4))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, in_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(w0), full(b0), full(w1), full(b1), full(w2), full(b2),
            full(w3), full(b3), full(w4), full(b4),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * mm_flops,
            bytes_accessed=n_pad * in_dim * x.dtype.itemsize + w_bytes,
            transcendentals=n_pad,
        ),
    )(x, w0, b0, w1, b1, w2, b2, w3, b3, w4, b4)
    return out[:n]


def sdf_mlp_reference(x: jax.Array, weights: Tuple[jax.Array, ...]) -> jax.Array:
    """Plain-XLA version of the same computation (fallback + test oracle)."""
    w0, b0, w1, b1, w2, b2, w3, b3, w4, b4 = weights
    h = jax.nn.relu(x @ w0 + b0)
    h = jax.nn.relu(h @ w1 + b1)
    h = jnp.concatenate([h, x], axis=-1)
    h = jax.nn.relu(h @ w2 + b2)
    h = jax.nn.relu(h @ w3 + b3)
    return jnp.tanh(h @ w4 + b4)
