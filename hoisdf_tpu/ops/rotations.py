"""Rotation-representation kernels (pure JAX, fully batched).

Parity targets: ``common/nets/mano_head.py:12-217`` (batch_rodrigues / quat2mat /
quat2aa / mat2quat / rot6d2mat / mat2aa), ``manopth/manopth/rodrigues_layer.py``
and ``common/metrics.py:188-210`` (Kabsch rigid align).  Everything is shaped
``[..., ]``-batched so it vmaps/shards cleanly; no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_rodrigues(theta: jax.Array) -> jax.Array:
    """Axis-angle [N,3] -> rotation matrices [N,3,3] via the quaternion map.

    Matches mano_head.py:12-22 (note the reference's `norm(theta + 1e-8)`
    epsilon inside the norm, kept for bitwise-comparable behavior).
    """
    l1norm = jnp.linalg.norm(theta + 1e-8, ord=2, axis=1)
    angle = l1norm[:, None]
    normalized = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=1)
    return quat2mat(quat)


def quat2mat(quat: jax.Array) -> jax.Array:
    """Quaternion [N,4] (w,x,y,z) -> rotation matrix [N,3,3] (mano_head.py:25-51)."""
    norm_quat = quat / jnp.linalg.norm(quat, ord=2, axis=1, keepdims=True)
    w, x, y, z = (norm_quat[:, 0], norm_quat[:, 1], norm_quat[:, 2], norm_quat[:, 3])
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2,
            2 * xy - 2 * wz,
            2 * wy + 2 * xz,
            2 * wz + 2 * xy,
            w2 - x2 + y2 - z2,
            2 * yz - 2 * wx,
            2 * xz - 2 * wy,
            2 * wx + 2 * yz,
            w2 - x2 - y2 + z2,
        ],
        axis=1,
    )
    return rot.reshape(-1, 3, 3)


def quat2aa(quaternion: jax.Array) -> jax.Array:
    """Quaternion [...,4] -> axis-angle [...,3] (mano_head.py:54-87)."""
    q1 = quaternion[..., 1]
    q2 = quaternion[..., 2]
    q3 = quaternion[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    sin_theta = jnp.sqrt(sin_sq)
    cos_theta = quaternion[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    # Guard the sin_theta==0 division; selection below discards the bad lane.
    k_pos = two_theta / jnp.where(sin_theta > 0.0, sin_theta, 1.0)
    k = jnp.where(sin_sq > 0.0, k_pos, 2.0)
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def mat2quat(rotation_matrix: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Rotation matrix [N,3,4] (or [N,3,3] padded) -> quaternion [N,4].

    Branchless Shepperd selection, parity with mano_head.py:90-182.
    """
    rmat_t = jnp.swapaxes(rotation_matrix, 1, 2)

    mask_d2 = rmat_t[:, 2, 2] < eps
    mask_d0_d1 = rmat_t[:, 0, 0] > rmat_t[:, 1, 1]
    mask_d0_nd1 = rmat_t[:, 0, 0] < -rmat_t[:, 1, 1]

    t0 = 1 + rmat_t[:, 0, 0] - rmat_t[:, 1, 1] - rmat_t[:, 2, 2]
    q0 = jnp.stack(
        [
            rmat_t[:, 1, 2] - rmat_t[:, 2, 1],
            t0,
            rmat_t[:, 0, 1] + rmat_t[:, 1, 0],
            rmat_t[:, 2, 0] + rmat_t[:, 0, 2],
        ],
        axis=-1,
    )
    t1 = 1 - rmat_t[:, 0, 0] + rmat_t[:, 1, 1] - rmat_t[:, 2, 2]
    q1 = jnp.stack(
        [
            rmat_t[:, 2, 0] - rmat_t[:, 0, 2],
            rmat_t[:, 0, 1] + rmat_t[:, 1, 0],
            t1,
            rmat_t[:, 1, 2] + rmat_t[:, 2, 1],
        ],
        axis=-1,
    )
    t2 = 1 - rmat_t[:, 0, 0] - rmat_t[:, 1, 1] + rmat_t[:, 2, 2]
    q2 = jnp.stack(
        [
            rmat_t[:, 0, 1] - rmat_t[:, 1, 0],
            rmat_t[:, 2, 0] + rmat_t[:, 0, 2],
            rmat_t[:, 1, 2] + rmat_t[:, 2, 1],
            t2,
        ],
        axis=-1,
    )
    t3 = 1 + rmat_t[:, 0, 0] + rmat_t[:, 1, 1] + rmat_t[:, 2, 2]
    q3 = jnp.stack(
        [
            t3,
            rmat_t[:, 1, 2] - rmat_t[:, 2, 1],
            rmat_t[:, 2, 0] - rmat_t[:, 0, 2],
            rmat_t[:, 0, 1] - rmat_t[:, 1, 0],
        ],
        axis=-1,
    )

    mask_c0 = (mask_d2 & mask_d0_d1)[:, None].astype(q0.dtype)
    mask_c1 = (mask_d2 & ~mask_d0_d1)[:, None].astype(q1.dtype)
    mask_c2 = (~mask_d2 & mask_d0_nd1)[:, None].astype(q2.dtype)
    mask_c3 = (~mask_d2 & ~mask_d0_nd1)[:, None].astype(q3.dtype)

    q = q0 * mask_c0 + q1 * mask_c1 + q2 * mask_c2 + q3 * mask_c3
    denom = jnp.sqrt(
        t0[:, None] * mask_c0
        + t1[:, None] * mask_c1
        + t2[:, None] * mask_c2
        + t3[:, None] * mask_c3
    )
    return q / denom * 0.5


def mat2aa(rotation_matrix: jax.Array) -> jax.Array:
    """Rotation matrix [N,3,3] -> axis-angle [N,3] (mano_head.py:197-217)."""
    if rotation_matrix.shape[-2:] == (3, 3):
        pad = jnp.concatenate(
            [
                jnp.zeros(rotation_matrix.shape[:-1] + (1,), rotation_matrix.dtype)
            ],
            axis=-1,
        )
        rotation_matrix = jnp.concatenate([rotation_matrix, pad], axis=-1)
        rotation_matrix = rotation_matrix.at[..., 2, 3].set(1.0)
    quat = mat2quat(rotation_matrix)
    aa = quat2aa(quat)
    return jnp.nan_to_num(aa, nan=0.0)


def rot6d2mat(x: jax.Array) -> jax.Array:
    """6D rotation rep [N,6] -> [N,3,3] via Gram-Schmidt (mano_head.py:185-194).

    Zhou et al. CVPR'19 continuity representation; columns are (b1,b2,b3).
    """
    a1 = x[:, 0:3]
    a2 = x[:, 3:6]
    # F.normalize semantics: eps=1e-12 clamp on the norm.
    def _normalize(v):
        n = jnp.linalg.norm(v, ord=2, axis=1, keepdims=True)
        return v / jnp.maximum(n, 1e-12)

    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-1)


def batch_rotprojs(mats: jax.Array) -> jax.Array:
    """Project arbitrary [... ,3,3] matrices onto SO(3) via SVD with a
    det-sign fix (parity: manopth/manopth/rotproj.py:4-21; used by the
    MANO layer's joint_rot_mode='rotmat' path)."""
    u, _, vt = jnp.linalg.svd(mats)
    rot = u @ vt
    det = jnp.linalg.det(rot)[..., None, None]
    # flip the last column of u where det < 0
    u_fix = jnp.concatenate([u[..., :2], u[..., 2:] * jnp.sign(det)], axis=-1)
    return u_fix @ vt


def rigid_transform_3d(a: jax.Array, b: jax.Array):
    """Similarity Kabsch: returns (scale c, rotation R, translation t).

    Parity with common/metrics.py:188-204 (numpy svd convention).
    """
    n = a.shape[0]
    centroid_a = jnp.mean(a, axis=0)
    centroid_b = jnp.mean(b, axis=0)
    h = (a - centroid_a).T @ (b - centroid_b) / n
    u, s, vt = jnp.linalg.svd(h)
    v = vt  # numpy's `V` is the returned vt rows
    r = v.T @ u.T
    det = jnp.linalg.det(r)
    # Reflection fix without data-dependent branching.
    flip = det < 0
    s = jnp.where(flip, s.at[-1].multiply(-1.0), s)
    v = jnp.where(flip, v.at[2].multiply(-1.0), v)
    r = v.T @ u.T
    var_a = jnp.var(a, axis=0).sum()
    c = jnp.sum(s) / var_a
    t = -(c * r) @ centroid_a + centroid_b
    return c, r, t


def rigid_align(a: jax.Array, b: jax.Array) -> jax.Array:
    """Procrustes-align point set a onto b (common/metrics.py:207-210)."""
    c, r, t = rigid_transform_3d(a, b)
    return (c * r @ a.T).T + t
