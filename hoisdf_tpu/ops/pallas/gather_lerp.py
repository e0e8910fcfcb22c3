"""Fused multi-level bilinear gather Pallas kernel (large pyramid levels).

The dense selection stage gathers pixel-aligned features for ~36K points per
image; the small levels (stride16/32) already ride the MXU via the one-hot
matmul (ops/grid_sample.py), leaving the stride2/4/8 gathers (224 channels,
4 corners each) as the largest remaining cost.  This kernel keeps all three
level maps of one batch item resident in VMEM (~1.75 MB bf16) and walks a
point tile with dynamic VMEM reads, fusing the 12 corner reads + lerp into
one pass with a single concatenated output write.

Status: experimental — guarded by ``cfg`` opt-in; the XLA gather path remains
the default.  Verified against grid_sample_bilinear in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gx_ref, gy_ref, f2, f4, f8, out_ref, *, tile: int, dims):
    gx = gx_ref[0, :]  # [tile] normalized x in [-1,1]
    gy = gy_ref[0, :]

    offset = 0
    for ref, (h, w, c) in zip((f2, f4, f8), dims):
        x = jnp.clip((gx + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
        y = jnp.clip((gy + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        wx = x - x0
        wy = y - y0
        x0i = x0.astype(jnp.int32)
        x1i = x1.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        y1i = y1.astype(jnp.int32)

        def body(i, _):
            r00 = ref[0, y0i[i], x0i[i], :]
            r01 = ref[0, y0i[i], x1i[i], :]
            r10 = ref[0, y1i[i], x0i[i], :]
            r11 = ref[0, y1i[i], x1i[i], :]
            top = r00 * (1 - wx[i]) + r01 * wx[i]
            bot = r10 * (1 - wx[i]) + r11 * wx[i]
            out_ref[0, i, offset : offset + c] = (
                top * (1 - wy[i]) + bot * wy[i]
            ).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, tile, body, 0)
        offset += c


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_gather_lerp3(
    grid: jax.Array,  # [B, P, 2] normalized coords
    feat2: jax.Array,  # [B, H2, W2, C2]
    feat4: jax.Array,
    feat8: jax.Array,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Bilinear-sample 3 levels and channel-concat: [B, P, C2+C4+C8]."""
    b, p, _ = grid.shape
    pad = (-p) % tile
    gx = grid[..., 0]
    gy = grid[..., 1]
    if pad:
        gx = jnp.concatenate([gx, jnp.zeros((b, pad), gx.dtype)], axis=1)
        gy = jnp.concatenate([gy, jnp.zeros((b, pad), gy.dtype)], axis=1)
    p_pad = gx.shape[1]
    dims = tuple(f.shape[1:] for f in (feat2, feat4, feat8))
    c_total = sum(d[2] for d in dims)

    kern = functools.partial(_kernel, tile=tile, dims=dims)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c_total), feat2.dtype),
        grid=(b, p_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, *dims[0]), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, *dims[1]), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, *dims[2]), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c_total), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(gx, gy, feat2, feat4, feat8)
    return out[:, :p]
