"""MANO parameter head: 6D-rotation queries -> hand mesh, for predictions and
ground truth.

Parity target: ``common/nets/mano_head.py:220-278``.  Pure functions (the
MANO layer is stateless in JAX); runs the MANO forward over the flattened
L x B batch exactly like the reference's per-decoder-layer supervision.
Outputs are metres (reference divides the mm MANO outputs by 1000).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hoisdf_tpu.mano.layer import ManoBuffers, mano_forward
from hoisdf_tpu.ops.rotations import batch_rodrigues, mat2aa, rot6d2mat

MANO_POSE_SIZE = 48  # 16 joints x 3


def mano_head_pred(
    buffers: ManoBuffers,
    pose6d: jax.Array,  # [L, B, 16, 6] per-decoder-layer query outputs
    shape: jax.Array,  # [L, B, 10]
    *,
    side: str = "right",
) -> Dict[str, jax.Array]:
    """Predicted MANO results per decoder layer (mano_head.py:232-255)."""
    l, b = pose6d.shape[:2]
    rotmats = rot6d2mat(pose6d.reshape(l * b * 16, 6))
    pose_aa = mat2aa(rotmats).reshape(l * b, MANO_POSE_SIZE)
    shape_flat = shape.reshape(l * b, 10)
    verts, joints = mano_forward(
        buffers, pose_aa, shape_flat, use_pca=False, ncomps=45,
        center_idx=0, flat_hand_mean=True, side=side,
    )
    return {
        "verts3d": verts.reshape(l, b, 778, 3) / 1000.0,
        "joints3d": joints.reshape(l, b, 21, 3) / 1000.0,
        "mano_pose": rotmats.reshape(l, b, 16, 3, 3),
        "mano_shape": shape,
    }


def mano_head_gt(
    buffers: ManoBuffers,
    mano_params: jax.Array,  # [B, 58] = 48 pose (axis-angle) + 10 shape
    *,
    side: str = "right",
) -> Dict[str, jax.Array]:
    """Ground-truth MANO results (mano_head.py:257-274).

    The reference subtracts th_hands_mean from the hand pose; with
    flat_hand_mean=True that mean is zero, preserved here for exactness.
    """
    gt_shape = mano_params[:, MANO_POSE_SIZE:]
    # Reference subtracts th_hands_mean here; it is registered as zeros under
    # flat_hand_mean=True (manolayer.py:90-96), so the subtraction is a no-op.
    gt_pose = mano_params[:, :MANO_POSE_SIZE]
    gt_rotmat = batch_rodrigues(gt_pose.reshape(-1, 3)).reshape(-1, 16, 3, 3)
    verts, joints = mano_forward(
        buffers, gt_pose, gt_shape, use_pca=False, ncomps=45,
        center_idx=0, flat_hand_mean=True, side=side,
    )
    return {
        "verts3d": verts / 1000.0,
        "joints3d": joints / 1000.0,
        "mano_pose": gt_rotmat,
        "mano_shape": gt_shape,
    }
