"""Differentiable MANO layer in pure JAX (blend shapes + FK + LBS).

Parity target: ``manopth/manopth/manolayer.py:111-276``.  The whole forward is
tensor algebra on static shapes — it jits, vmaps over the L x B mano-head batch
(``common/nets/mano_head.py:232-248``) and shards over a data mesh untouched.
Outputs are millimetres, matching the reference's x1000 scaling.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from hoisdf_tpu.mano.model import (
    JOINT_REORDER,
    LEV1_IDXS,
    LEV2_IDXS,
    LEV3_IDXS,
    TRANSFORM_REORDER,
    ManoModel,
)
from hoisdf_tpu.ops.rotations import batch_rodrigues

# Geometry must run at true fp32: this JAX build defaults f32 dots to a
# bf16-accumulated fast path, which costs ~0.5 mm on MANO outputs.
_PREC = lax.Precision.HIGHEST


class ManoBuffers(NamedTuple):
    """Device-resident MANO constants (a pytree, so it pjits/shards freely)."""

    betas: jax.Array  # [10]
    shapedirs: jax.Array  # [778, 3, 10]
    posedirs: jax.Array  # [778, 3, 135]
    v_template: jax.Array  # [778, 3]
    j_regressor: jax.Array  # [16, 778]
    weights: jax.Array  # [778, 16]
    hands_components: jax.Array  # [45, 45]
    hands_mean: jax.Array  # [45]

    @classmethod
    def from_model(cls, m: ManoModel, dtype=jnp.float32) -> "ManoBuffers":
        return cls(
            betas=jnp.asarray(m.betas, dtype),
            shapedirs=jnp.asarray(m.shapedirs, dtype),
            posedirs=jnp.asarray(m.posedirs, dtype),
            v_template=jnp.asarray(m.v_template, dtype),
            j_regressor=jnp.asarray(m.j_regressor, dtype),
            weights=jnp.asarray(m.weights, dtype),
            hands_components=jnp.asarray(m.hands_components, dtype),
            hands_mean=jnp.asarray(m.hands_mean, dtype),
        )


def _rigid_transform(rot: jax.Array, trans: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation + [..., 3] translation -> [..., 4, 4] homogeneous."""
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)  # [...,3,4]
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def mano_forward(
    buffers: ManoBuffers,
    pose_coeffs: jax.Array,
    betas: Optional[jax.Array] = None,
    trans: Optional[jax.Array] = None,
    *,
    use_pca: bool = False,
    ncomps: int = 45,
    center_idx: Optional[int] = 0,
    flat_hand_mean: bool = True,
    side: str = "right",
    joint_rot_mode: str = "axisang",
):
    """MANO forward: pose/shape -> (verts [B,778,3] mm, joints [B,21,3] mm).

    Mirrors manolayer.py:111-276 with root_rot_mode='axisang'; the
    joint_rot_mode='rotmat' branch (manolayer.py:158-169) takes [B,16,3,3]
    matrices and projects them onto SO(3).

    Args:
      pose_coeffs: [B, 3 + ncomps] — global axis-angle rot then hand pose
        (PCA coefficients when use_pca else 45-d axis-angle); or [B,16,3,3]
        rotation matrices when joint_rot_mode='rotmat'.
      betas: [B, 10] shape params, or None for the template shape.
      trans: [B, 3] translation in metres, or None (recenter on center_idx).
    """
    batch = pose_coeffs.shape[0]
    dtype = pose_coeffs.dtype

    if not use_pca and joint_rot_mode == "rotmat":
        from hoisdf_tpu.ops.rotations import batch_rotprojs

        assert pose_coeffs.shape[1:] == (16, 3, 3), pose_coeffs.shape
        pose_rots = batch_rotprojs(pose_coeffs)
        root_rot = pose_rots[:, 0]
        rot_map = pose_rots[:, 1:]
        eye = jnp.eye(3, dtype=dtype)
        pose_map = (rot_map - eye).reshape(batch, 135)
    else:
        hand_pose = pose_coeffs[:, 3 : 3 + ncomps]
        if use_pca:
            full_hand_pose = jnp.matmul(
                hand_pose, buffers.hands_components[:ncomps], precision=_PREC
            )
        else:
            full_hand_pose = hand_pose
        hands_mean = (
            jnp.zeros_like(buffers.hands_mean) if flat_hand_mean
            else buffers.hands_mean
        )
        full_pose = jnp.concatenate(
            [pose_coeffs[:, :3], hands_mean[None] + full_hand_pose], axis=1
        )  # [B, 48]

        rot_mats = batch_rodrigues(full_pose.reshape(-1, 3)).reshape(
            batch, 16, 3, 3
        )
        root_rot = rot_mats[:, 0]
        rot_map = rot_mats[:, 1:]  # [B, 15, 3, 3]
        eye = jnp.eye(3, dtype=dtype)
        pose_map = (rot_map - eye).reshape(batch, 135)

    # Shape blend (manolayer.py:172-186)
    if betas is None:
        v_shaped = (
            jnp.einsum("vds,s->vd", buffers.shapedirs, buffers.betas, precision=_PREC)
            + buffers.v_template
        )[None]
        joints = jnp.einsum("jv,vd->jd", buffers.j_regressor, v_shaped[0], precision=_PREC)
        joints = jnp.broadcast_to(joints, (batch, 16, 3))
        v_shaped = jnp.broadcast_to(v_shaped, (batch, 778, 3))
    else:
        v_shaped = (
            jnp.einsum("vds,bs->bvd", buffers.shapedirs, betas, precision=_PREC)
            + buffers.v_template[None]
        )
        joints = jnp.einsum("jv,bvd->bjd", buffers.j_regressor, v_shaped, precision=_PREC)

    # Pose-corrective blendshapes (manolayer.py:188-189)
    v_posed = v_shaped + jnp.einsum("vdp,bp->bvd", buffers.posedirs, pose_map, precision=_PREC)

    # FK over the 3-level finger chains (manolayer.py:192-231)
    lev1 = np.asarray(LEV1_IDXS)
    lev2 = np.asarray(LEV2_IDXS)
    lev3 = np.asarray(LEV3_IDXS)
    root_j = joints[:, 0]
    root_t = _rigid_transform(root_rot, root_j)  # [B,4,4]

    lev1_rel = _rigid_transform(rot_map[:, lev1 - 1], joints[:, lev1] - root_j[:, None])
    lev1_t = jnp.matmul(root_t[:, None], lev1_rel, precision=_PREC)  # [B,5,4,4]
    lev2_rel = _rigid_transform(rot_map[:, lev2 - 1], joints[:, lev2] - joints[:, lev1])
    lev2_t = jnp.matmul(lev1_t, lev2_rel, precision=_PREC)
    lev3_rel = _rigid_transform(rot_map[:, lev3 - 1], joints[:, lev3] - joints[:, lev2])
    lev3_t = jnp.matmul(lev2_t, lev3_rel, precision=_PREC)

    all_t = jnp.concatenate([root_t[:, None], lev1_t, lev2_t, lev3_t], axis=1)
    all_t = all_t[:, np.asarray(TRANSFORM_REORDER)]  # [B,16,4,4] global transforms

    # Remove the rest-pose joint location (manolayer.py:233-235)
    joints_h = jnp.concatenate([joints, jnp.zeros((batch, 16, 1), dtype)], axis=-1)
    tmp = jnp.einsum("bjrc,bjc->bjr", all_t, joints_h, precision=_PREC)  # [B,16,4]
    correction = jnp.zeros_like(all_t).at[..., :, 3].set(tmp)
    rel_t = all_t - correction

    # LBS (manolayer.py:237-247): per-vertex blended transform then apply.
    skin_t = jnp.einsum("vj,bjrc->bvrc", buffers.weights, rel_t, precision=_PREC)
    v_posed_h = jnp.concatenate([v_posed, jnp.ones((batch, 778, 1), dtype)], axis=-1)
    verts = jnp.einsum("bvrc,bvc->bvr", skin_t, v_posed_h, precision=_PREC)[..., :3]

    jtr = all_t[:, :, :3, 3]  # [B,16,3]
    tips_idx = np.asarray(
        (745, 317, 444, 556, 673) if side == "right" else (745, 317, 445, 556, 673)
    )
    tips = verts[:, tips_idx]
    jtr = jnp.concatenate([jtr, tips], axis=1)[:, np.asarray(JOINT_REORDER)]  # [B,21,3]

    if trans is None:
        if center_idx is not None:
            center = jtr[:, center_idx : center_idx + 1]
            jtr = jtr - center
            verts = verts - center
    else:
        jtr = jtr + trans[:, None]
        verts = verts + trans[:, None]

    return verts * 1000.0, jtr * 1000.0


class ManoLayer:
    """Thin OO wrapper binding buffers + static options, mirroring the
    reference constructor (manolayer.py:20-109)."""

    def __init__(
        self,
        model: ManoModel,
        *,
        use_pca: bool = False,
        ncomps: int = 45,
        center_idx: Optional[int] = 0,
        flat_hand_mean: bool = True,
        dtype=jnp.float32,
    ):
        self.buffers = ManoBuffers.from_model(model, dtype)
        self.use_pca = use_pca
        self.ncomps = ncomps
        self.center_idx = center_idx
        self.flat_hand_mean = flat_hand_mean
        self.side = model.side
        self.faces = model.faces

    @property
    def hands_mean(self) -> jax.Array:
        return self.buffers.hands_mean

    def __call__(self, pose_coeffs, betas=None, trans=None):
        return mano_forward(
            self.buffers,
            pose_coeffs,
            betas,
            trans,
            use_pca=self.use_pca,
            ncomps=self.ncomps,
            center_idx=self.center_idx,
            flat_hand_mean=self.flat_hand_mean,
            side=self.side,
        )
