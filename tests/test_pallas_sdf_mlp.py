"""Fused SDF-MLP Pallas kernel vs the flax SDFDecoder (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.models.sdf_decoder import SDFDecoder
from hoisdf_tpu.ops.pallas.sdf_mlp import (
    fold_weight_norm,
    sdf_mlp_fused,
    sdf_mlp_reference,
)


def _decoder_params(latent_size=256):
    dec = SDFDecoder(latent_size=latent_size, point_feat_size=33)
    x = jnp.zeros((4, latent_size + 33))
    return dec, dec.init(jax.random.PRNGKey(0), x)["params"]


def test_folded_weights_match_flax_decoder():
    dec, params = _decoder_params()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 289).astype(np.float32))
    sdf_flax, _ = dec.apply({"params": params}, x)
    sdf_ref = sdf_mlp_reference(x, fold_weight_norm(params))
    np.testing.assert_allclose(np.asarray(sdf_ref), np.asarray(sdf_flax), atol=1e-5)


def test_pallas_kernel_matches_reference_interpret():
    dec, params = _decoder_params()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(300, 289).astype(np.float32))  # non-multiple of tile
    weights = fold_weight_norm(params)
    got = sdf_mlp_fused(x, weights, tile=128, interpret=True)
    want = sdf_mlp_reference(x, weights)
    assert got.shape == (300, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_kernel_handles_non_production_dims():
    """Regression: the kernel once hardcoded the production in_dim (289) in
    its block spec, breaking every reduced config (e.g. hidden 64 -> 97-d
    inputs) on TPU backends — where the fused path is on — while CPU tests
    passed on the plain-XLA fallback (evaluate --synthetic crash, round 4)."""
    dec, params = _decoder_params(latent_size=64)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(100, 97).astype(np.float32))
    weights = fold_weight_norm(params)
    got = sdf_mlp_fused(x, weights, tile=64, interpret=True)
    want = sdf_mlp_reference(x, weights)
    assert got.shape == (100, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
