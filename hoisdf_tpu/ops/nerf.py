"""NeRF-style sinusoidal positional encoding.

Parity target: ``common/utils/sdf_utils.py:96-141`` — log-sampled frequency
bands, sin/cos interleaved per frequency, input NOT included.  With the default
``num_freqs = (33-3)//6 = 5`` the output is 30-d per 3-d point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nerf_positional_encoding(x: jax.Array, num_freqs: int) -> jax.Array:
    """Encode points ``[..., D] -> [..., 2*num_freqs*D]``.

    Output column layout matches the reference Embedder loop order:
    ``[sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]`` each block D-wide.
    """
    # log-sampled bands: 2**linspace(0, num_freqs-1, num_freqs)
    freqs = 2.0 ** jnp.linspace(0.0, num_freqs - 1, num_freqs).astype(x.dtype)
    # [..., F, D]
    xf = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # interleave sin/cos per frequency: [..., F, 2, D] -> [..., F*2*D]
    enc = jnp.stack([sin, cos], axis=-2)
    return enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
