"""Analytic MANO inverse kinematics (joints -> pose), for the ho3d_render
variant.

Parity target: ``common/utils/inverse_kinematics.py:15-150`` — global orient
by Kabsch/SVD on the five knuckle directions, then sequential axis-angle
recovery down each finger's 3-joint chain, then a MANO FK re-run.

TPU notes: the reference's per-finger Python loop has *static* bounds (5
fingers x 2 recovered joints each step), so it unrolls cleanly under jit; the
data-dependent `valid_idx` gating becomes a jnp.where select.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.mano.layer import ManoBuffers, mano_forward
from hoisdf_tpu.ops.rotations import batch_rodrigues, mat2aa

# Finger chains in 21-joint order: [root, knuckle, mid, tip-1, tip]
# (inverse_kinematics.py:73-79); group order maps to MANO pose slots 1..15.
FINGER_LIST = (
    (0, 5, 6, 7, 8),
    (0, 9, 10, 11, 12),
    (0, 17, 18, 19, 20),
    (0, 13, 14, 15, 16),
    (0, 1, 2, 3, 4),
)


def ik_solver_mano(
    buffers: ManoBuffers,
    pred_joints: jax.Array,  # [B, 21, 3] metres
    mano_shape: Optional[jax.Array] = None,  # [B, 10]
    *,
    side: str = "right",
) -> Dict[str, jax.Array]:
    b = pred_joints.shape[0]
    dtype = pred_joints.dtype

    target_joints = pred_joints[:, :21] - pred_joints[:, :1]
    shape = (
        jnp.zeros((b, 10), dtype) if mano_shape is None else mano_shape
    )
    _, template_joints = mano_forward(
        buffers, jnp.zeros((b, 48), dtype), shape,
        use_pca=False, ncomps=45, center_idx=0, flat_hand_mean=True, side=side,
    )
    template_joints = template_joints / 1000.0

    knuckles = np.array([1, 5, 9, 13, 17])

    def knuckle_dirs(j):
        return jnp.stack([j[:, k] - j[:, 0] for k in knuckles], axis=1).transpose(
            0, 2, 1
        )  # [B, 3, 5]

    p0 = knuckle_dirs(target_joints)
    t0 = knuckle_dirs(template_joints)
    h = t0 @ p0.transpose(0, 2, 1)
    u, s, vt = jnp.linalg.svd(h)
    v = vt.transpose(0, 2, 1)
    rot = v @ u.transpose(0, 2, 1)  # [B,3,3] global orient

    det = jnp.linalg.det(rot)
    valid = (jnp.abs(det + 1) > 1e-6)[:, None]  # reflection check (ik:67-69)

    pose_mats = [jnp.broadcast_to(jnp.eye(3, dtype=dtype), (b, 3, 3))] * 16
    axisang = [jnp.zeros((b, 3), dtype)] * 16
    global_aa = mat2aa(rot)
    axisang[0] = jnp.where(valid, global_aa, axisang[0])
    pose_mats[0] = jnp.where(valid[..., None], rot, pose_mats[0])

    for g_idx, group in enumerate(FINGER_LIST):
        recon = [jnp.zeros((b, 3), dtype) for _ in range(5)]
        for j_idx in range(2, 5):
            vec_template = (
                template_joints[:, group[j_idx]]
                - template_joints[:, group[j_idx - 1]]
            )
            r_pa = rot
            for i in range(j_idx - 2):
                r_pa = r_pa @ pose_mats[g_idx * 3 + i + 1]
            recon[j_idx - 1] = (
                jnp.einsum(
                    "bij,bj->bi",
                    r_pa,
                    template_joints[:, group[j_idx - 1]]
                    - template_joints[:, group[j_idx - 2]],
                )
                + recon[j_idx - 2]
            )
            vec_target = jnp.einsum(
                "bji,bj->bi",
                r_pa,
                target_joints[:, group[j_idx]] - recon[j_idx - 1],
            )
            axis = jnp.cross(vec_template, vec_target)
            axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-7)
            cosang = jnp.sum(vec_template * vec_target, -1, keepdims=True) / (
                jnp.linalg.norm(vec_template, axis=-1, keepdims=True) + 1e-7
            ) / (jnp.linalg.norm(vec_target, axis=-1, keepdims=True) + 1e-7)
            angle = jnp.arccos(jnp.clip(cosang, -1 + 1e-7, 1 - 1e-7))
            aa = angle * axis
            slot = g_idx * 3 + j_idx - 1
            axisang[slot] = jnp.where(valid, aa, axisang[slot])
            local_r = batch_rodrigues(aa)
            pose_mats[slot] = jnp.where(valid[..., None], local_r, pose_mats[slot])

    pose_flat = jnp.stack(axisang, axis=1).reshape(b, 48)
    verts, joints = mano_forward(
        buffers, pose_flat, shape,
        use_pca=False, ncomps=45, center_idx=0, flat_hand_mean=True, side=side,
    )
    verts = verts / 1000.0 + pred_joints[:, :1]
    joints = joints / 1000.0 + pred_joints[:, :1]
    return {
        "verts": verts,
        "joints": joints,
        "shape": shape,
        "pose": pose_flat,
        "vis": valid.astype(jnp.int32),
    }
