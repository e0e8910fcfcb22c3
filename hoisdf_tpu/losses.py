"""Loss functions for HOISDF training.

Parity target: ``common/nets/loss.py`` plus the loss weighting applied by the
train loop (``main/train.py:115-127``).  All losses are pure functions
returning scalars (the reference wraps them in nn.Modules and `.mean()`s in
the loop); the vote loss also returns the softmax-aggregated hand joints used
as a model output.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hoisdf_tpu.config import Config


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """torch.nn.SmoothL1Loss(reduction='none') with default beta=1."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically stable elementwise BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def bce(probs: jax.Array, labels: jax.Array, eps: float = 1e-7) -> jax.Array:
    """torch.nn.BCELoss on probabilities (decoder seg heads are sigmoided)."""
    p = jnp.clip(probs, eps, 1 - eps)
    return -(labels * jnp.log(p) + (1 - labels) * jnp.log1p(-p))


def joint_heatmap_loss(pred_hm: jax.Array, gt_hm: jax.Array) -> jax.Array:
    """Elementwise MSE (loss.py:14-20), reduced to a scalar as the train loop
    does with `.mean()` (main/train.py:113)."""
    return jnp.mean((pred_hm - gt_hm) ** 2)


def sep_sdf_loss(
    hand_sdf: jax.Array, obj_sdf: jax.Array, hand_gt: jax.Array, obj_gt: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """L1 on hand/object SDF samples (loss.py:64-78); gts are [B,P]."""
    return (
        jnp.mean(jnp.abs(hand_sdf - hand_gt[..., None])),
        jnp.mean(jnp.abs(obj_sdf - obj_gt[..., None])),
    )


def joint_vote_loss(
    cfg: Config,
    hand_points: jax.Array,  # [B, P, 3] root-relative (unscaled, metres)
    hand_off: jax.Array,  # [L, B, P, J*3] per-point offset votes
    hand_cls: jax.Array,  # [L, B, P, J] vote-membership logits
    joint_gt: jax.Array,  # [B, J, 3] millimetres (joints 1..20, root excluded)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-point joint voting loss (loss.py:23-61).

    Returns (vote reg loss, membership BCE, aggregated-joint reg loss,
    hand_joints [L,B,J,3] in metres).
    """
    l, b, p, j = hand_cls.shape
    votes = hand_points[None, :, :, None, :] + hand_off.reshape(l, b, p, j, 3)
    # membership: point within cfg.hand_cls_dist of the GT joint (gt in mm)
    dist = jnp.linalg.norm(
        hand_points[:, :, None, :] - joint_gt[:, None, :, :] / 1000.0, axis=-1
    )  # [B, P, J]
    cls_gt = (dist < cfg.hand_cls_dist).astype(hand_off.dtype)

    gt_b = joint_gt[None, :, None]  # [1, B, 1, J, 3] mm
    reg = smooth_l1(votes * 1000.0, jnp.broadcast_to(gt_b, votes.shape))
    reg = reg * cls_gt[None, ..., None]
    # Reference keeps [L, 3] after the masked sum, divides by the membership
    # count, then means over layers AND the 3 coord dims (loss.py:41-47);
    # summing the coord dim here too means dividing by 3 to match.
    loss_joint_3d = reg.sum(axis=(1, 2, 3, 4)) / jnp.maximum(cls_gt.sum(), 1.0)
    loss_joint_3d = loss_joint_3d.mean() / 3.0

    loss_joint_cls = jnp.mean(
        bce_with_logits(hand_cls, jnp.broadcast_to(cls_gt[None], hand_cls.shape))
    )

    weights = jax.nn.softmax(hand_cls, axis=2)[..., None]  # over points
    hand_joints = jnp.sum(votes * weights, axis=2)  # [L, B, J, 3] metres
    loss_all_joint_3d = jnp.mean(
        smooth_l1(hand_joints * 1000.0, jnp.broadcast_to(joint_gt[None], hand_joints.shape))
    )
    return loss_joint_3d, loss_joint_cls, loss_all_joint_3d, hand_joints


def mano_loss(
    cfg: Config, preds: Dict[str, jax.Array], gts: Dict[str, jax.Array]
) -> Dict[str, jax.Array]:
    """MSE on verts/joints/pose-rotmats/shape with the reference lambdas
    (loss.py:81-153); GT broadcast across decoder layers."""

    def mse_vs_gt(p, g):
        return jnp.mean((p - jnp.broadcast_to(g[None], p.shape)) ** 2)

    return {
        "mano_mesh_loss": cfg.lambda_verts3d * mse_vs_gt(preds["verts3d"], gts["verts3d"]),
        "mano_joint_loss": cfg.lambda_joints3d * mse_vs_gt(preds["joints3d"], gts["joints3d"]),
        "pose_param_loss": cfg.lambda_manopose * mse_vs_gt(preds["mano_pose"], gts["mano_pose"]),
        "shape_param_loss": cfg.lambda_manoshape * mse_vs_gt(preds["mano_shape"], gts["mano_shape"]),
    }


def mano_shape_loss(
    cfg: Config, pred_shape: jax.Array, gt_shape: jax.Array
) -> Dict[str, jax.Array]:
    """Shape-only supervision for the IK variant (loss.py:155-171)."""
    param = cfg.lambda_manoshape * jnp.mean(
        (pred_shape - jnp.broadcast_to(gt_shape[None], pred_shape.shape)) ** 2
    )
    reg = cfg.mano_lambda_regulshape * jnp.mean(pred_shape**2)
    return {"shape_param_loss": param, "shape_reg_loss": reg}


def sdf_part_classifier_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Part-class cross-entropy at supervised SDF points (ClassifierBranch).

    The reference builds the classifier head and a ``sdf_cls_weight``
    (main/config.py:89,138, sdf_net.py classifier output) but never applies a
    loss — the dataset's label output is commented out (data/dexycb.py:642).
    This completes the switch: softmax CE over ``num_class`` parts, masking
    clamp-invalidated labels (-1, the unpack convention at
    common/utils/sdf_utils.py:87-91).

    logits: [B, P, C]; labels: [B, P] int, -1 = ignore.
    """
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / denom


def weighted_total(cfg: Config, losses: Dict[str, jax.Array]) -> jax.Array:
    """Apply the train-loop weighting (main/train.py:115-127) and sum."""
    w = {
        "sdfhand_loss": cfg.sdf_hand_weight,
        "sdfobj_loss": cfg.sdf_obj_weight,
        "joint_heatmap": cfg.hm_weight,
        "obj_seg": cfg.obj_hm_weight,
        "hand_seg": cfg.obj_hm_weight,
        "obj_rot": cfg.obj_rot_weight,
        "obj_trans": cfg.obj_trans_weight,
        "loss_joint_3d": cfg.joint_weight,
        "loss_joint_cls": cfg.cls_weight,
        "loss_all_joint_3d": cfg.joint_weight,
        "sdf_cls_loss": cfg.sdf_cls_weight,
    }
    total = jnp.asarray(0.0)
    for k, v in losses.items():
        total = total + v * w.get(k, 1.0)
    return total
