"""Gaussian joint-heatmap rendering.

Parity target: ``main/model.py:128-143`` — per-joint isotropic gaussians at
``joint_coord`` (128-res pixel coords), summed over joints, scaled by 255.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def render_gaussian_heatmap(
    joint_coord: jax.Array, hm_shape=(128, 128), sigma: float = 1.25
) -> jax.Array:
    """joint_coord [B,J,2] (x,y) -> heatmap [B,H,W]."""
    h, w = hm_shape
    xx = jnp.arange(w, dtype=joint_coord.dtype)[None, None, None, :]
    yy = jnp.arange(h, dtype=joint_coord.dtype)[None, None, :, None]
    x = joint_coord[:, :, 0, None, None]
    y = joint_coord[:, :, 1, None, None]
    hm = jnp.exp(-(((xx - x) / sigma) ** 2) / 2 - (((yy - y) / sigma) ** 2) / 2)
    return hm.sum(axis=1) * 255.0
