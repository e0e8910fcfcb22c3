"""Fused gather+lerp kernel vs the XLA gather path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.ops.grid_sample import grid_sample_bilinear
from hoisdf_tpu.ops.pallas.gather_lerp import fused_gather_lerp3


def test_fused_gather_lerp3_interpret_parity():
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.rand(2, 300, 2).astype(np.float32) * 2.2 - 1.1)
    f2 = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    f4 = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    f8 = jnp.asarray(rng.randn(2, 4, 4, 32).astype(np.float32))
    got = fused_gather_lerp3(grid, f2, f4, f8, tile=128, interpret=True)
    want = jnp.concatenate(
        [grid_sample_bilinear(f, grid) for f in (f2, f4, f8)], -1
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
