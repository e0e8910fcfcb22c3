"""Field-guided point sampling: the TPU-native redesign of ``sdf_infer``.

The reference (main/model.py:246-355) loops over the batch in Python, ragged-
filters a 64^3 lattice to the 2D bbox, runs the SDF decoder on the survivors,
sorts by |sdf| and keeps the top-K — data-dependent shapes, host round-trips,
and a per-item loop: the single worst-mapped-to-TPU construct in the model.

Here the whole batch is processed at once with static shapes:
  * the lattice is a compile-time constant [N,3] in the scaled SDF frame;
  * a `lax.scan` walks fixed-size lattice chunks, evaluating the SDF for all
    batch items per chunk (pure MXU matmuls at [B*C, 289]);
  * out-of-bbox points get +inf score (mask instead of filter);
  * a running top-K merge keeps the K nearest-surface points per item.

Selected points/SDFs are bit-identical to evaluating the full lattice and
sorting (up to ties), so eval-mode behavior matches the reference up to its
own SDF prediction tolerance.  HBM cost is bounded by the chunk size.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_lattice(bins_n: int = 64) -> np.ndarray:
    """Unit-cube lattice in the scaled SDF frame, ordering identical to the
    reference's index arithmetic (main/model.py:260-273): axis 0 slowest."""
    step = 2.0 / (bins_n - 1)
    r = np.arange(bins_n, dtype=np.float32) * step - 1.0
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


class TopKState(NamedTuple):
    score: jax.Array  # [B, K] |sdf| (masked +inf), ascending is better
    sdf: jax.Array  # [B, K]
    index: jax.Array  # [B, K] lattice index


def _merge_topk(state: TopKState, score, sdf, index, k: int) -> TopKState:
    all_score = jnp.concatenate([state.score, score], axis=1)
    all_sdf = jnp.concatenate([state.sdf, sdf], axis=1)
    all_index = jnp.concatenate([state.index, index], axis=1)
    # lax.top_k keeps the largest; negate to keep the smallest |sdf|.
    _, sel = jax.lax.top_k(-all_score, k)
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)
    return TopKState(take(all_score), take(all_sdf), take(all_index))


def sdf_guided_sample(
    sdf_fn: Callable[[jax.Array], jax.Array],
    center: jax.Array,  # [B, 3] camera-space field center
    cam_intr: jax.Array,  # [B, 3, 3]
    bbox: jax.Array,  # [B, 4] (x0, y0, x1, y1) pixel bbox
    *,
    sdf_scale: float,
    num_points: int,
    bins_n: int = 64,
    chunk: int = 32768,
    clamp: float = 0.15,
) -> Tuple[jax.Array, jax.Array]:
    """Select the ``num_points`` lattice points nearest the predicted surface.

    ``sdf_fn``: maps scaled-frame points [B, C, 3] -> sdf [B, C] (the caller
    closes over the feature pyramid + decoder params).

    Returns (points [B, num_points, 3] in the scaled frame, sdf [B,
    num_points, 1] clamped).  Positional encodings are deterministic in the
    points, so callers re-derive them with ``nerf_positional_encoding``.
    """
    lattice = jnp.asarray(make_lattice(bins_n))  # [N, 3]
    n = lattice.shape[0]
    assert n % chunk == 0 or chunk >= n, (n, chunk)
    chunk = min(chunk, n)
    n_chunks = n // chunk
    lattice_chunks = lattice[: n_chunks * chunk].reshape(n_chunks, chunk, 3)
    chunk_ids = jnp.arange(n, dtype=jnp.int32).reshape(n_chunks, chunk)

    b = center.shape[0]

    def eval_chunk(state: TopKState, inp):
        pts, ids = inp  # [C,3], [C]
        pts_b = jnp.broadcast_to(pts[None], (b, chunk, 3))
        cam_pts = scaled_to_cam(pts_b, center, sdf_scale)
        p2d = jnp.einsum("bpc,bkc->bpk", cam_pts, cam_intr)
        pix = p2d[..., :2] / p2d[..., 2:3]
        in_box = (
            (pix[..., 0] > bbox[:, None, 0])
            & (pix[..., 0] < bbox[:, None, 2])
            & (pix[..., 1] > bbox[:, None, 1])
            & (pix[..., 1] < bbox[:, None, 3])
        )
        sdf = sdf_fn(pts_b)  # [B, C]
        score = jnp.where(in_box, jnp.abs(sdf), jnp.inf)
        ids_b = jnp.broadcast_to(ids[None], (b, chunk))
        return _merge_topk(state, score, sdf, ids_b, num_points), None

    init = TopKState(
        score=jnp.full((b, num_points), jnp.inf, jnp.float32),
        sdf=jnp.zeros((b, num_points), jnp.float32),
        index=jnp.zeros((b, num_points), jnp.int32),
    )
    state, _ = jax.lax.scan(eval_chunk, init, (lattice_chunks, chunk_ids))

    points = lattice[state.index]  # [B, K, 3]
    sdf = jnp.clip(state.sdf, -clamp, clamp)[..., None]
    return points, sdf


def sdf_guided_sample_hierarchical(
    sdf_fn: Callable[[jax.Array], jax.Array],
    center: jax.Array,
    cam_intr: jax.Array,
    bbox: jax.Array,
    *,
    sdf_scale: float,
    num_points: int,
    bins_n: int = 64,
    levels: Tuple[Tuple[int, int], ...] = ((4, 512), (2, 896)),
    clamp: float = 0.15,
    approx_topk: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-level surface-point selection (VERDICT.md round-1 item #6).

    Generalizes ``sdf_guided_sample_coarse2fine`` to a cell-subdivision
    cascade: ``levels`` is a sequence of ``(cell_factor, keep)`` pairs with
    strictly decreasing factors, each dividing the previous.  Level i probes
    the centers of the active cells' sub-cells of edge ``cell_factor`` and
    keeps the ``keep`` nearest-surface ones; the final stage evaluates every
    fine lattice point of the surviving cells and top-Ks by |sdf|.

    Default ((4, 512), (2, 896)) on a 64^3 lattice: 16^3 coarse probes +
    512*8 sub-cell probes + 896*8 fine evals = 15.4k SDF evaluations vs
    36.9k for the two-stage coarse2fine — 2.4x fewer where ~all eval time
    goes.  Selection quality holds because the SDF is 1-Lipschitz: a cell
    containing surface has center |sdf| <= half the cell diagonal, so
    generous keeps prune conservatively.  Selected points lie on the same
    64^3 lattice as the reference's dense pass (main/model.py:260-273).
    """
    b = center.shape[0]
    step = 2.0 / (bins_n - 1)
    factors = [f for f, _ in levels]
    assert all(
        factors[i] % factors[i + 1] == 0 and factors[i] > factors[i + 1]
        for i in range(len(factors) - 1)
    ), factors
    assert bins_n % factors[0] == 0, (bins_n, factors)

    def cell_coords(base_idx, factor):
        """Fine-lattice flat index of a cell origin -> probe point (the
        center of the factor^3 block; the exact lattice point at factor 1)."""
        ci = base_idx // (bins_n * bins_n)
        cj = (base_idx // bins_n) % bins_n
        ck = base_idx % bins_n
        origin = jnp.stack([ci, cj, ck], axis=-1).astype(jnp.float32) * step - 1.0
        return origin + (factor - 1) * 0.5 * step

    def child_bases(bases, parent_factor, child_factor):
        """Subdivide each cell of edge parent_factor into (p/c)^3 children."""
        s = parent_factor // child_factor
        offs = (
            np.arange(s)[:, None, None] * child_factor * bins_n * bins_n
            + np.arange(s)[None, :, None] * child_factor * bins_n
            + np.arange(s)[None, None, :] * child_factor
        ).reshape(-1)
        out = bases[..., None] + jnp.asarray(offs, bases.dtype)[None, None]
        return out.reshape(b, -1)

    def probe(bases, factor, keep, final=True):
        pts = cell_coords(bases, factor)  # [B, M, 3]
        sdf = sdf_fn(pts)  # [B, M]
        in_box = _cell_overlaps_bbox(
            pts, factor, step, center, cam_intr, bbox, sdf_scale
        )
        score = jnp.where(in_box, jnp.abs(sdf), jnp.inf)
        # Small lattices (tests, CPU smoke configs) can have fewer cells than
        # the production keep values — clamp statically, selection exact.
        # The final stage keeps its contract: num_points is the output shape.
        if final:
            assert score.shape[1] >= keep, (
                f"hier cascade yields {score.shape[1]} candidate points < "
                f"num_points={keep}; raise the last level's keep"
            )
        else:
            keep = min(keep, score.shape[1])
        if approx_topk and not final:
            # TPU-hardware-accelerated approximate top-k for the *pruning*
            # stages only: recall<1 just means a slightly different
            # conservative keep-set; the final point selection stays exact.
            _, sel = jax.lax.approx_max_k(-score, keep, recall_target=0.95)
        else:
            _, sel = jax.lax.top_k(-score, keep)
        return jnp.take_along_axis(bases, sel, axis=1), pts, sdf, score, sel

    # Level 0: all cells of edge factors[0].
    f0 = factors[0]
    cb = bins_n // f0
    r = np.arange(cb) * f0
    base0 = (
        r[:, None, None] * bins_n * bins_n
        + r[None, :, None] * bins_n
        + r[None, None, :]
    ).reshape(-1)
    bases = jnp.broadcast_to(
        jnp.asarray(base0, jnp.int32)[None], (b, base0.size)
    )
    bases, _, _, _, _ = probe(bases, f0, levels[0][1], final=False)

    for (pf, _), (cf, keep) in zip(levels[:-1], levels[1:]):
        bases = child_bases(bases, pf, cf)
        bases, _, _, _, _ = probe(bases, cf, keep, final=False)

    # Final stage: every fine lattice point of the surviving cells.
    bases = child_bases(bases, factors[-1], 1)
    _, pts, sdf, score, sel = probe(bases, 1, num_points)
    points = jnp.take_along_axis(pts, sel[..., None], axis=1)
    sdf = jnp.take_along_axis(sdf, sel, axis=1)
    return points, jnp.clip(sdf, -clamp, clamp)[..., None]


def scaled_to_cam(pts_scaled, center, sdf_scale):
    """Scaled-SDF-frame points -> camera frame.  ``sdf_scale`` is a python
    scalar or a per-item [B] array (the grouped hand+obj sampler folds two
    fields with different scales into the batch axis)."""
    scale = jnp.asarray(sdf_scale, pts_scaled.dtype)
    if scale.ndim == 1:
        scale = scale[:, None, None]
    return pts_scaled / scale + center[:, None, :]


def _in_bbox(pts_scaled, center, cam_intr, bbox, sdf_scale, z_guard=False):
    """Project scaled-frame points and test against the 2D pixel bbox.

    ``z_guard=False`` (default) divides by projected z unguarded, exactly
    like the reference's filter (main/model.py:291-301) and the dense-scan
    oracle — the hier cascade's FINAL selection stage uses this so its
    in-box decisions stay bit-identical to "full" mode.  ``z_guard=True``
    additionally treats z <= eps points as in-box (conservative) — PRUNING
    decisions use this so a camera-plane-straddling point can never be
    wrongly discarded (ADVICE r3; unreachable at production geometry).
    """
    cam_pts = scaled_to_cam(pts_scaled, center, sdf_scale)
    p2d = jnp.einsum("bpc,bkc->bpk", cam_pts, cam_intr)
    pix = p2d[..., :2] / p2d[..., 2:3]
    inside = (
        (pix[..., 0] > bbox[:, None, 0])
        & (pix[..., 0] < bbox[:, None, 2])
        & (pix[..., 1] > bbox[:, None, 1])
        & (pix[..., 1] < bbox[:, None, 3])
    )
    if z_guard:
        inside = inside | (p2d[..., 2] <= jnp.asarray(1e-6, p2d.dtype))
    return inside


def _cell_overlaps_bbox(probe_pts, factor, step, center, cam_intr, bbox,
                        sdf_scale):
    """Conservative visibility test for a pruning-stage cell: does ANY of the
    cell's fine lattice points project inside the pixel bbox?

    Testing only the cell-center probe (the pre-round-3 behavior) wrongly
    prunes cells that straddle the bbox boundary — measured 3-8% of the
    dense-scan oracle's top-600 points lost on tight-bbox scenes, keep-count
    independent (scripts/levels_sweep.py diagnosis).  Instead, project the 8
    corner lattice points of the cell; under perspective projection a convex
    cell's image lies within the convex hull of its projected corners, so the
    corners' pixel AABB overlapping the bbox rectangle is a conservative
    (never-wrongly-prunes) test.  Exact for factor == 1 (the final stage
    keeps the reference's per-point semantics, main/model.py:286-301).

    probe_pts are the cell CENTER probes (origin + (factor-1)*step/2); the
    corner lattice points sit at center ± (factor-1)*step/2 per axis.

    Corners at camera depth z <= 0 void the convex-hull argument (the
    perspective division flips pixel signs), so any cell with a non-positive
    -depth corner is treated as visible — still conservative, never wrongly
    prunes (ADVICE r3).  Unreachable at production geometry (center z≈0.6,
    sdf_scale 3.1 puts the lattice at z ∈ [0.28, 0.92]) but no longer an
    implicit precondition.
    """
    if factor == 1:
        # pruning decision -> z-guarded (the final SELECTION test at the
        # leaf stage stays unguarded for bit-parity with the dense scan)
        return _in_bbox(probe_pts, center, cam_intr, bbox, sdf_scale,
                        z_guard=True)
    h = (factor - 1) * 0.5 * step
    corners = np.array(
        [[sx * h, sy * h, sz * h]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )  # [8, 3]
    # [B, M, 8, 3] scaled-frame corner lattice points
    pts = probe_pts[:, :, None, :] + jnp.asarray(corners)[None, None]
    cam_pts = scaled_to_cam(
        pts.reshape(pts.shape[0], -1, 3), center, sdf_scale
    ).reshape(pts.shape)
    p2d = jnp.einsum("bmqc,bkc->bmqk", cam_pts, cam_intr)
    z = p2d[..., 2]  # [B, M, 8]
    eps = jnp.asarray(1e-6, z.dtype)
    straddles_camera = (z <= eps).any(axis=2)  # [B, M]
    pix = p2d[..., :2] / jnp.maximum(z, eps)[..., None]  # [B, M, 8, 2]
    lo = pix.min(axis=2)  # [B, M, 2]
    hi = pix.max(axis=2)
    return straddles_camera | (
        (hi[..., 0] > bbox[:, None, 0])
        & (lo[..., 0] < bbox[:, None, 2])
        & (hi[..., 1] > bbox[:, None, 1])
        & (lo[..., 1] < bbox[:, None, 3])
    )


def sdf_guided_sample_coarse2fine(
    sdf_fn: Callable[[jax.Array], jax.Array],
    center: jax.Array,
    cam_intr: jax.Array,
    bbox: jax.Array,
    *,
    sdf_scale: float,
    num_points: int,
    bins_n: int = 64,
    coarse_factor: int = 4,
    keep_cells: int = 512,
    clamp: float = 0.15,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage surface-point selection: ~7x fewer SDF evals than the full
    lattice at matched selection quality.

    Stage 1 probes the SDF at the centers of (coarse_factor^3)-point cells of
    the fine lattice (e.g. 16^3 probes for a 64^3 lattice) and keeps the
    ``keep_cells`` cells nearest the predicted surface.  Stage 2 evaluates
    every fine lattice point inside the kept cells and top-Ks by |sdf|.
    Since the true SDF is 1-Lipschitz, a cell containing surface has a small
    center value, so the pruning is conservative at keep_cells >> the number
    of surface-adjacent cells.  Selected points lie on the same 64^3 lattice
    as the reference's dense pass (main/model.py:260-273).
    """
    b = center.shape[0]
    cb = bins_n // coarse_factor
    fine = jnp.asarray(make_lattice(bins_n))  # [N, 3] (jnp: traced gathers below)
    fine_grid = fine.reshape(bins_n, bins_n, bins_n, 3)
    # Cell-center probes: mean of each coarse_factor^3 block.
    coarse = fine_grid.reshape(
        cb, coarse_factor, cb, coarse_factor, cb, coarse_factor, 3
    ).mean(axis=(1, 3, 5)).reshape(-1, 3)  # [cb^3, 3]

    coarse_b = jnp.broadcast_to(coarse[None], (b, coarse.shape[0], 3))
    sdf_c = sdf_fn(coarse_b)  # [B, cb^3]
    step = 2.0 / (bins_n - 1)
    in_box_c = _cell_overlaps_bbox(
        coarse_b, coarse_factor, step, center, cam_intr, bbox, sdf_scale
    )
    score_c = jnp.where(in_box_c, jnp.abs(sdf_c), jnp.inf)
    _, cell_idx = jax.lax.top_k(-score_c, keep_cells)  # [B, keep]

    # Flat fine index of each cell's origin + the 4^3 child offsets.
    ci = cell_idx // (cb * cb)
    cj = (cell_idx // cb) % cb
    ck = cell_idx % cb
    base = (
        ci * coarse_factor * bins_n * bins_n
        + cj * coarse_factor * bins_n
        + ck * coarse_factor
    )  # [B, keep]
    f = coarse_factor
    offs = (
        np.arange(f)[:, None, None] * bins_n * bins_n
        + np.arange(f)[None, :, None] * bins_n
        + np.arange(f)[None, None, :]
    ).reshape(-1)  # [f^3]
    child_idx = (base[..., None] + jnp.asarray(offs)[None, None]).reshape(
        b, keep_cells * f**3
    )  # [B, keep*f^3]

    child_pts = fine[child_idx]  # [B, P, 3]
    sdf_f = sdf_fn(child_pts)  # [B, P]
    in_box_f = _in_bbox(child_pts, center, cam_intr, bbox, sdf_scale)
    score_f = jnp.where(in_box_f, jnp.abs(sdf_f), jnp.inf)
    _, sel = jax.lax.top_k(-score_f, num_points)
    points = jnp.take_along_axis(child_pts, sel[..., None], axis=1)
    sdf = jnp.take_along_axis(sdf_f, sel, axis=1)
    return points, jnp.clip(sdf, -clamp, clamp)[..., None]
