"""Evaluation metrics: hand MJE/PA-MJE, object ADD-S/MCE/OCE/MME, PCK/AUC,
F-score.

Parity targets: ``common/metrics.py`` (ADD-S via the full NxN pairwise
min-dist on 1000-vert simplified meshes, Procrustes rigid align, MJE) and
``common/eval_util.py`` (EvalUtil PCK-curve/AUC accumulator, open3d-based
F-score — re-implemented here as pure pairwise distances, no open3d/cv2).

Everything batched jnp so the whole eval loop stays on-device; only the
scalar reductions come back to the host.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.ops.rotations import batch_rodrigues, rigid_align


# ---- hand metrics -------------------------------------------------------------


def eval_hand_joint(
    pred_joints: jax.Array, gt_joints: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """MJE and Procrustes-aligned MJE per batch (metrics.py:213-232).

    pred/gt: [B, J, 3] (same unit in and out).  Returns scalar means.
    """
    mje = jnp.linalg.norm(pred_joints - gt_joints, axis=-1).mean()
    aligned = jax.vmap(rigid_align)(pred_joints, gt_joints)
    pamje = jnp.linalg.norm(aligned - gt_joints, axis=-1).mean()
    return mje, pamje


# ---- object metrics -----------------------------------------------------------

_CORNER_IDX = np.array(
    [[0, 1, 0, 0, 1, 0, 1, 1], [0, 0, 1, 0, 1, 1, 0, 1], [0, 0, 0, 1, 0, 1, 1, 1]]
)


def _aabb_corners(meshes: jax.Array) -> jax.Array:
    """[B,N,3] -> [B,8,3] axis-aligned bbox corners (metrics.py:70-94)."""
    mn = meshes.min(axis=1)
    mx = meshes.max(axis=1)
    mm = jnp.stack([mn, mx], axis=2)  # [B,3,2]
    return jnp.stack(
        [mm[:, 0, _CORNER_IDX[0]], mm[:, 1, _CORNER_IDX[1]], mm[:, 2, _CORNER_IDX[2]]],
        axis=2,
    )


def add_s(pred_meshes: jax.Array, target_meshes: jax.Array) -> jax.Array:
    """Symmetric ADD: mean over pred verts of min dist to any target vert
    (metrics.py:62-68). [B,N,3] x2 -> [B]."""
    d = jnp.linalg.norm(
        target_meshes[:, None, :, :] - pred_meshes[:, :, None, :], axis=-1
    )  # [B, N, N]
    return d.min(axis=2).mean(axis=1)


def obj_metrics_dexycb(pred_meshes, target_meshes):
    """ADD-S + MCE (bbox-corner error) per sample (metrics.py:62-100)."""
    adds = add_s(pred_meshes, target_meshes)
    mce = jnp.linalg.norm(
        _aabb_corners(pred_meshes) - _aabb_corners(target_meshes), axis=-1
    ).mean(axis=-1)
    return adds, mce


def obj_metrics_ho3d(pred_meshes, target_meshes):
    """ADD-S + MME (mean per-vertex error) per sample (metrics.py:103-113)."""
    adds = add_s(pred_meshes, target_meshes)
    mme = jnp.linalg.norm(target_meshes - pred_meshes, axis=-1).mean(axis=-1)
    return adds, mme


def transform_templates(
    templates: jax.Array, rot_aa: jax.Array, trans: jax.Array
) -> jax.Array:
    """Apply axis-angle + translation object pose to template verts
    (metrics.py:151-168): verts @ R^T + t."""
    rot = batch_rodrigues(rot_aa)  # [B,3,3]
    return jnp.einsum("bnk,bjk->bnj", templates, rot) + trans[:, None, :]


def eval_batched_obj_direct(
    pred_rot: jax.Array,  # [B, 3] axis-angle (already point-averaged)
    pred_trans: jax.Array,  # [B, 3]
    gt_rot: jax.Array,
    gt_trans: jax.Array,
    template_meshes: jax.Array,  # [B, N, 3] per-sample simplified YCB meshes
    *,
    ho3d: bool = False,
) -> Dict[str, jax.Array]:
    """Object pose metrics from direct rot/trans predictions
    (metrics.py:116-185).  Returns per-sample arrays; callers mask/aggregate
    (e.g. HO3D's pitcher_base exclusion happens host-side)."""
    target = transform_templates(template_meshes, gt_rot, gt_trans)
    pred = transform_templates(template_meshes, pred_rot, pred_trans)
    out: Dict[str, jax.Array] = {}
    if ho3d:
        out["ADDS"], out["MME"] = obj_metrics_ho3d(pred, target)
    else:
        out["ADDS"], out["MCE"] = obj_metrics_dexycb(pred, target)
        out["OCE"] = jnp.linalg.norm(pred_trans - gt_trans, axis=-1)
    return out


# ---- F-score / mesh error ------------------------------------------------------


def fscore_pr(
    gt_points: jax.Array, pred_points: jax.Array, threshold: float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """F-score + precision/recall at a distance threshold
    (eval_util.py:117-140, open3d-free).

    gt/pred: [N,3]/[M,3] single-sample point sets.  Reference naming is kept
    for parity: ``recall`` counts pred points within ``threshold`` of a gt
    point (pred->gt, eval_util.py:127), ``precision`` counts matched gt
    points (gt->pred, :130) — the f-score is symmetric either way.
    """
    d = jnp.linalg.norm(gt_points[:, None, :] - pred_points[None, :, :], axis=-1)
    d1 = d.min(axis=1)  # gt -> pred
    d2 = d.min(axis=0)  # pred -> gt
    recall = (d2 < threshold).mean()
    precision = (d1 < threshold).mean()
    f = jnp.where(
        recall + precision > 0, 2 * recall * precision / (recall + precision), 0.0
    )
    return f, precision, recall


def fscore(
    gt_points: jax.Array, pred_points: jax.Array, threshold: float
) -> jax.Array:
    """F-score only (see fscore_pr)."""
    return fscore_pr(gt_points, pred_points, threshold)[0]


from functools import partial


@partial(jax.jit, static_argnames=("thresholds",))
def mesh_metrics_batch(
    gt_verts: jax.Array,  # [B, N, 3]
    pred_verts: jax.Array,  # [B, N, 3]
    thresholds: Tuple[float, ...],
) -> Dict[str, jax.Array]:
    """Batched dexycb_full mesh metrics: one device call per eval batch.

    Replaces the per-sample host loop (1 rigid_align + 4 fscore device
    round-trips per mesh, main/test.py:214-222,232-259 semantics): vmapped
    Procrustes alignment, correspondence EPE distances for EvalUtil, and
    F-scores for plain + aligned prediction at every threshold — the
    O(N^2) pairwise matrix is built once per (sample, variant) and shared
    across thresholds.

    Returns per-sample arrays: ``epe_dist``/``epe_dist_aligned`` [B, N]
    (per-vertex correspondence distances, what EvalUtil.feed computes) and
    ``fscores``/``fscores_aligned`` [B, T].
    """
    aligned = jax.vmap(rigid_align)(pred_verts, gt_verts)

    def per_sample(gv, pv):
        d = jnp.linalg.norm(gv[:, None, :] - pv[None, :, :], axis=-1)
        d1 = d.min(axis=1)  # gt -> pred
        d2 = d.min(axis=0)  # pred -> gt
        fs = []
        for t in thresholds:
            recall = (d1 < t).mean()
            precision = (d2 < t).mean()
            fs.append(
                jnp.where(
                    recall + precision > 0,
                    2 * recall * precision / (recall + precision),
                    0.0,
                )
            )
        epe = jnp.linalg.norm(gv - pv, axis=-1)
        return epe, jnp.stack(fs)

    epe, fs = jax.vmap(per_sample)(gt_verts, pred_verts)
    epe_a, fs_a = jax.vmap(per_sample)(gt_verts, aligned)
    return {
        "epe_dist": epe,
        "epe_dist_aligned": epe_a,
        "fscores": fs,
        "fscores_aligned": fs_a,
    }


# ---- PCK / AUC accumulator ------------------------------------------------------


class EvalUtil:
    """PCK-curve / AUC / EPE accumulator (common/eval_util.py:11-101)."""

    def __init__(self, num_kp: int = 21):
        self.num_kp = num_kp
        self.data: List[List[np.ndarray]] = [[] for _ in range(num_kp)]

    def feed(self, keypoint_gt, keypoint_pred, keypoint_vis=None):
        keypoint_gt = np.asarray(keypoint_gt)
        keypoint_pred = np.asarray(keypoint_pred)
        if keypoint_vis is None:
            keypoint_vis = np.ones(keypoint_gt.shape[0], bool)
        keypoint_vis = np.asarray(keypoint_vis).astype(bool).reshape(-1)
        dist = np.linalg.norm(keypoint_gt - keypoint_pred, axis=-1)
        self.feed_dist(dist, keypoint_vis)

    def feed_dist(self, dist, keypoint_vis=None):
        """Feed precomputed per-keypoint distances [num_kp] (the batched
        mesh-metrics path computes them on-device in one call)."""
        dist = np.asarray(dist)
        if keypoint_vis is None:
            keypoint_vis = np.ones(dist.shape[0], bool)
        keypoint_vis = np.asarray(keypoint_vis).astype(bool).reshape(-1)
        for i in range(self.num_kp):
            if keypoint_vis[i]:
                self.data[i].append(dist[i])

    def _pck(self, kp_id: int, threshold: float) -> Optional[float]:
        if len(self.data[kp_id]) == 0:
            return None
        d = np.asarray(self.data[kp_id])
        return float((d <= threshold).mean())

    def get_measures(
        self, val_min: float, val_max: float, steps: int
    ) -> Tuple[float, float, float, List[float], List[float]]:
        """Returns (mean EPE, median EPE, AUC, pck curve, thresholds)."""
        thresholds = np.linspace(val_min, val_max, steps)
        norm_factor = np.trapezoid(np.ones_like(thresholds), thresholds)

        epe_mean_all, epe_median_all, auc_all, pck_curve_all = [], [], [], []
        for i in range(self.num_kp):
            if len(self.data[i]) == 0:
                continue
            d = np.asarray(self.data[i])
            epe_mean_all.append(float(d.mean()))
            epe_median_all.append(float(np.median(d)))
            pck = np.asarray([self._pck(i, t) for t in thresholds])
            pck_curve_all.append(pck)
            auc_all.append(float(np.trapezoid(pck, thresholds) / norm_factor))

        pck_curve = np.mean(np.stack(pck_curve_all), axis=0)
        return (
            float(np.mean(epe_mean_all)),
            float(np.mean(epe_median_all)),
            float(np.mean(auc_all)),
            pck_curve.tolist(),
            thresholds.tolist(),
        )
