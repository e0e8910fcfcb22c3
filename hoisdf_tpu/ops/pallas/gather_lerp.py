"""Fused multi-level bilinear gather Pallas kernel (large pyramid levels).

The dense selection stage gathers pixel-aligned features for ~36K points per
image; the small levels (stride16/32) ride the MXU via the one-hot matmul
(ops/grid_sample.py), leaving the stride2/4/8 gathers (224 channels, 4
corners each) as the largest remaining cost.  This kernel keeps all three
level maps of one batch item resident in VMEM (~1.75 MB bf16), stages the
tile's precomputed corner indices/weights into SMEM scratch, and walks the
point tile with dynamic ``pl.ds`` corner reads, fusing 12 reads + lerp per
point into one pass.

Status: experimental, interpret-verified, NOT yet lowerable on this Mosaic
version — kept as a reference implementation.  Findings from real-TPU
attempts (each constraint hit in turn):
  1. block shapes: dims (-2,-1) must divide (8,128) or equal the array dims;
  2. `pltpu.ANY` inputs require full-array blocks + trivial index maps
     (slice inside the kernel via DMA instead);
  3. dynamic `pl.ds` starts on the sublane dim (-2) must be provably
     8-aligned — arbitrary per-point corner columns cannot satisfy this
     without an 8x sublane-padding relayout of the feature maps.
Round-4 retest (2026-08-18, post the stack upgrade that cleared the
(2,1024) fused-graph fault): RE-BLOCKED, and the failure mode got WORSE —
this kernel now crashes the remote tpu_compile_helper subprocess outright
(HTTP 500, exit 1) instead of raising the clean alignment MosaicError, and
even a minimal repro (single dynamic-sublane `pl.ds(y, 1)` row gather from
a [128,128] VMEM block in a fori_loop) HANGS the chipless AOT compiler
>600 s.  Known-good kernels (sdf_mlp at a fresh tile) compile fine in the
same session, so this is kernel-specific, not infra.  Do not re-attempt
until a libtpu/Mosaic upgrade; re-run /tmp-style minimal repro first.
The production path instead routes small levels through the exact one-hot
matmul (MXU) and keeps XLA gathers for stride2/4/8; see CLAUDE.md perf notes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, wgt_ref, f2, f4, f8, out_ref, idx_smem, wgt_smem,
            sem, *, tile: int, dims):
    b_idx = pl.program_id(0)
    j = pl.program_id(1)

    # Stage this (batch, tile)'s indices/weights into SMEM for scalar reads.
    # idx/wgt stay in ANY (full-array blocks); slice the tile via DMA.
    cp1 = pltpu.make_async_copy(
        idx_ref.at[b_idx, :, pl.ds(j * tile, tile)], idx_smem, sem.at[0]
    )
    cp1.start()
    cp2 = pltpu.make_async_copy(
        wgt_ref.at[b_idx, :, pl.ds(j * tile, tile)], wgt_smem, sem.at[1]
    )
    cp2.start()
    cp1.wait()
    cp2.wait()

    refs = (f2, f4, f8)

    def body(i, _):
        offset = 0
        for li, (ref, (h, w, c)) in enumerate(zip(refs, dims)):
            y0 = idx_smem[li * 4 + 0, i]
            x0 = idx_smem[li * 4 + 1, i]
            y1 = idx_smem[li * 4 + 2, i]
            x1 = idx_smem[li * 4 + 3, i]
            wx = wgt_smem[li * 2 + 0, i]
            wy = wgt_smem[li * 2 + 1, i]
            r00 = ref[0, pl.ds(y0, 1), pl.ds(x0, 1), :]
            r01 = ref[0, pl.ds(y0, 1), pl.ds(x1, 1), :]
            r10 = ref[0, pl.ds(y1, 1), pl.ds(x0, 1), :]
            r11 = ref[0, pl.ds(y1, 1), pl.ds(x1, 1), :]
            top = r00 * (1 - wx) + r01 * wx
            bot = r10 * (1 - wx) + r11 * wx
            out_ref[0, pl.ds(i, 1), offset : offset + c] = (
                (top * (1 - wy) + bot * wy).reshape(1, c).astype(out_ref.dtype)
            )
            offset += c
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_gather_lerp3(
    grid: jax.Array,  # [B, P, 2] normalized coords
    feat2: jax.Array,  # [B, H2, W2, C2]
    feat4: jax.Array,
    feat8: jax.Array,
    *,
    tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Bilinear-sample 3 levels and channel-concat: [B, P, C2+C4+C8]."""
    b, p, _ = grid.shape
    pad = (-p) % tile
    if pad:
        grid = jnp.concatenate(
            [grid, jnp.zeros((b, pad, 2), grid.dtype)], axis=1
        )
    p_pad = grid.shape[1]
    feats = (feat2, feat4, feat8)
    dims = tuple(f.shape[1:] for f in feats)
    c_total = sum(d[2] for d in dims)

    # Precompute corner indices/weights per level on the XLA side.
    idx_rows = []
    wgt_rows = []
    for (h, w, _c) in dims:
        x = jnp.clip((grid[..., 0] + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
        y = jnp.clip((grid[..., 1] + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        idx_rows += [
            y0.astype(jnp.int32), x0.astype(jnp.int32),
            jnp.minimum(y0 + 1, h - 1).astype(jnp.int32),
            jnp.minimum(x0 + 1, w - 1).astype(jnp.int32),
        ]
        wgt_rows += [(x - x0).astype(jnp.float32), (y - y0).astype(jnp.float32)]
    idx = jnp.stack(idx_rows, axis=1)  # [B, 12, P]
    wgt = jnp.stack(wgt_rows, axis=1)  # [B, 6, P]

    kern = functools.partial(_kernel, tile=tile, dims=dims)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c_total), feat2.dtype),
        grid=(b, p_pad // tile),
        in_specs=[
            pl.BlockSpec((b, 12, p_pad), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((b, 6, p_pad), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((1, *dims[0]), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, *dims[1]), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, *dims[2]), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c_total), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((12, tile), jnp.int32),
            pltpu.SMEM((6, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(idx, wgt, feat2, feat4, feat8)
    return out[:, :p]
