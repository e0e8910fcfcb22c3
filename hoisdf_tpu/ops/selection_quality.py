"""Dense-scan-oracle quality gate for the field-guided point samplers.

The hierarchical cascade (``ops/point_sampling.py``) replaces the reference's
exact dense 64^3 scan (main/model.py:246-355) with pruned probing.  Pruning
can only hurt by *missing* near-surface lattice points, so its quality is
measured against the dense scan as oracle on the SAME field:

  * ``overlap_at_k`` — fraction of the oracle's top-K lattice points the
    candidate also selects (set overlap on lattice indices).
  * ``mean_abs_ratio`` / ``max_abs_ratio`` — mean/max |sdf| of the candidate's
    selection over the oracle's (1.0 = indistinguishable; >1 = the candidate
    picked farther-from-surface points).
  * ``rank_corr`` — Spearman correlation between the candidate's and the
    oracle's ascending |sdf| order statistics (distributional match of the
    selections).

``gate()`` encodes the promotion rule used for config.hier_levels: a level
setting may become the production default only if, on hand-shaped geometry at
the production lattice scale, overlap@K >= 0.95 and mean|sdf| ratio <= 1.05
for every batch item (i.e. selection quality indistinguishable from the exact
scan).  See tests/test_point_sampling.py and ``bench_components.py
--selection-quality`` for the committed tables.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.ops.point_sampling import (
    sdf_guided_sample,
    sdf_guided_sample_hierarchical,
)


def _lattice_keys(points: np.ndarray, bins_n: int) -> np.ndarray:
    """Scaled-frame lattice points -> flat integer lattice indices."""
    step = 2.0 / (bins_n - 1)
    idx = np.rint((points + 1.0) / step).astype(np.int64)
    return (idx[..., 0] * bins_n + idx[..., 1]) * bins_n + idx[..., 2]


def _spearman(a: np.ndarray, b: np.ndarray) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra**2).sum() * (rb**2).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else 1.0


def selection_quality(
    sdf_fn: Callable,
    center,
    cam_intr,
    bbox,
    *,
    sdf_scale: float,
    num_points: int,
    bins_n: int,
    levels: Sequence[Tuple[int, int]],
    chunk: int = 32768,
) -> Dict[str, np.ndarray]:
    """Per-batch-item quality of the hier cascade vs the dense-scan oracle."""
    oracle_pts, oracle_sdf = sdf_guided_sample(
        sdf_fn, center, cam_intr, bbox, sdf_scale=sdf_scale,
        num_points=num_points, bins_n=bins_n, chunk=chunk,
    )
    cand_pts, cand_sdf = sdf_guided_sample_hierarchical(
        sdf_fn, center, cam_intr, bbox, sdf_scale=sdf_scale,
        num_points=num_points, bins_n=bins_n,
        levels=tuple(tuple(l) for l in levels),
    )
    o_keys = _lattice_keys(np.asarray(oracle_pts), bins_n)
    c_keys = _lattice_keys(np.asarray(cand_pts), bins_n)
    o_abs = np.abs(np.asarray(oracle_sdf))[..., 0]
    c_abs = np.abs(np.asarray(cand_sdf))[..., 0]

    b = o_keys.shape[0]
    overlap = np.empty(b)
    mean_ratio = np.empty(b)
    max_ratio = np.empty(b)
    rank_corr = np.empty(b)
    for i in range(b):
        overlap[i] = len(set(o_keys[i]) & set(c_keys[i])) / num_points
        om, cm = o_abs[i].mean(), c_abs[i].mean()
        mean_ratio[i] = cm / om if om > 0 else 1.0
        o_mx, c_mx = o_abs[i].max(), c_abs[i].max()
        max_ratio[i] = c_mx / o_mx if o_mx > 0 else 1.0
        rank_corr[i] = _spearman(np.sort(c_abs[i]), np.sort(o_abs[i]))
    return {
        "overlap_at_k": overlap,
        "mean_abs_ratio": mean_ratio,
        "max_abs_ratio": max_ratio,
        "rank_corr": rank_corr,
    }


def gate(report: Dict[str, np.ndarray], *, min_overlap: float = 0.95,
         max_mean_ratio: float = 1.05) -> bool:
    """Promotion rule for config.hier_levels defaults (see module doc)."""
    return bool(
        (report["overlap_at_k"] >= min_overlap).all()
        and (report["mean_abs_ratio"] <= max_mean_ratio).all()
    )


def stress_geometry(batch: int = 2, seed: int = 3, sdf_scale: float = 3.1):
    """The promotion-gate stress scene at full production scale: a
    2.5x-scaled posed MANO hand (thin fingers stress the coarse pruning
    stages) plus a random object blob, viewed through a tight pixel bbox.
    Returns ``(field, center, cam_intr, bbox)`` ready for
    ``selection_quality(..., sdf_scale=3.1, num_points=600, bins_n=64)``.

    Shared by tests/test_point_sampling.py::test_hier_levels_full_scale_
    quality_gate, ``bench_components.py --selection-quality`` and
    ``scripts/levels_sweep.py`` so the committed gate and any sweep are
    measured on the identical scene.
    """
    from hoisdf_tpu.mano.layer import ManoBuffers, mano_forward
    from hoisdf_tpu.mano.model import make_synthetic_mano

    buffers = ManoBuffers.from_model(make_synthetic_mano(0))
    rng = np.random.RandomState(seed)
    pose = jnp.asarray(rng.randn(batch, 48).astype(np.float32) * 0.6)
    betas = jnp.asarray(rng.randn(batch, 10).astype(np.float32) * 0.5)
    verts_mm, joints_mm = mano_forward(buffers, pose, betas)
    verts_s = (verts_mm - joints_mm[:, :1]) / 1000.0 * sdf_scale * 2.5
    obj = jnp.asarray(
        rng.randn(batch, 200, 3).astype(np.float32) * 0.35
        + np.array([0.3, -0.2, 0.1], np.float32)
    )
    surf = jnp.concatenate([verts_s, obj], axis=1)

    def field(pts):  # [B, M, 3] -> unsigned distance to the scene surface
        p2 = (pts**2).sum(-1)
        v2 = (surf**2).sum(-1)
        cross = jnp.einsum("bmc,bvc->bmv", pts, surf)
        d2 = p2[..., None] + v2[:, None, :] - 2.0 * cross
        return jnp.sqrt(jnp.maximum(d2, 0.0)).min(-1)

    center = jnp.asarray(
        np.tile(np.array([[0.0, 0.0, 0.6]], np.float32), (batch, 1))
    )
    cam = jnp.asarray(np.tile(
        np.array([[[600.0, 0, 320], [0, 600, 240], [0, 0, 1]]], np.float32),
        (batch, 1, 1),
    ))
    bbox = jnp.asarray(np.tile(
        np.array([[200.0, 150.0, 480.0, 360.0]], np.float32), (batch, 1)
    ))
    return field, center, cam, bbox


def perturbed_field(field: Callable, seed: int = 0, amplitude: float = 0.02,
                    num_waves: int = 8, max_freq: float = 6.0) -> Callable:
    """Wrap a distance field with smooth random noise, modeling a TRAINED
    SDF decoder's prediction error (the gate's true-distance fields are the
    best case for the cascade's 1-Lipschitz pruning argument; a learned
    field violates the Lipschitz bound slightly and shifts minima).

    The noise is a sum of ``num_waves`` random sinusoids with per-axis
    wavevector components uniform in ±``max_freq``, i.e. wavevector norms
    up to sqrt(3)*max_freq rad/unit, and dirichlet amplitudes summing to
    amplitude*sqrt(num_waves).  Worst-case gradient norm is therefore
    bounded by amplitude*sqrt(num_waves)*sqrt(3)*max_freq ≈ 0.59 at the
    defaults (ADVICE r3 corrected the earlier ≈0.34 figure, which missed
    the sqrt(3) per-axis factor) — a strong local
    Lipschitz violation vs the field's 1, while staying spatially smooth
    like a converged MLP's error (white noise would model an untrained
    net, which no selection scheme — including the reference's dense scan
    — would serve anyway).  Both the oracle and the cascade see the SAME
    perturbed field, so ``selection_quality`` still isolates pruning loss.
    """
    rng = np.random.RandomState(seed)
    k = jnp.asarray(
        rng.uniform(-max_freq, max_freq, size=(num_waves, 3)).astype(np.float32)
    )
    phase = jnp.asarray(
        rng.uniform(0.0, 2 * np.pi, size=(num_waves,)).astype(np.float32)
    )
    amp = jnp.asarray(
        (rng.dirichlet(np.ones(num_waves)) * amplitude * num_waves ** 0.5)
        .astype(np.float32)
    )

    def noisy(pts):  # [B, M, 3] -> [B, M]
        base = field(pts)
        waves = jnp.sin(jnp.einsum("bmc,wc->bmw", pts, k) + phase)
        return base + waves @ amp

    return noisy


def hand_geometry_field(batch: int = 2, seed: int = 3, sdf_scale: float = 3.1):
    """True unsigned distance field of posed synthetic MANO hands in the
    scaled lattice frame — the hand-shaped oracle geometry the gate runs on
    (a sphere is too easy for pruning)."""
    from hoisdf_tpu.mano.layer import ManoBuffers, mano_forward
    from hoisdf_tpu.mano.model import make_synthetic_mano

    buffers = ManoBuffers.from_model(make_synthetic_mano(0))
    rng = np.random.RandomState(seed)
    pose = jnp.asarray(rng.randn(batch, 48).astype(np.float32) * 0.4)
    betas = jnp.asarray(rng.randn(batch, 10).astype(np.float32) * 0.5)
    verts_mm, joints_mm = mano_forward(buffers, pose, betas)
    verts_s = (verts_mm - joints_mm[:, :1]) / 1000.0 * sdf_scale

    def field(pts):  # [B, M, 3] -> unsigned distance to the hand surface
        # squared-distance via matmul: no [B, M, V, 3] intermediate, so the
        # full 64^3 lattice fits through the oracle scan
        p2 = (pts**2).sum(-1)
        v2 = (verts_s**2).sum(-1)
        cross = jnp.einsum("bmc,bvc->bmv", pts, verts_s)
        d2 = p2[..., None] + v2[:, None, :] - 2.0 * cross
        return jnp.sqrt(jnp.maximum(d2, 0.0)).min(-1)

    return field
