"""Rotation-kernel parity vs reference goldens (common/nets/mano_head.py)."""

import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.ops import rotations as R


def test_rot6d2mat_golden(golden):
    g = golden("rotations")
    mats = R.rot6d2mat(jnp.asarray(g["x6d"]))
    np.testing.assert_allclose(np.asarray(mats), g["mats"], atol=1e-5)


def test_mat2aa_roundtrip_golden(golden):
    g = golden("rotations")
    aa = R.mat2aa(jnp.asarray(g["mats"]))
    np.testing.assert_allclose(np.asarray(aa), g["aa_back"], atol=1e-4)


def test_batch_rodrigues_golden(golden):
    g = golden("rotations")
    rod = R.batch_rodrigues(jnp.asarray(g["aa"]))
    np.testing.assert_allclose(
        np.asarray(rod), g["rodrigues"].reshape(-1, 3, 3), atol=1e-5
    )


def test_rodrigues_mat2aa_cycle():
    rng = np.random.RandomState(0)
    aa = rng.randn(50, 3).astype(np.float32)
    mats = R.batch_rodrigues(jnp.asarray(aa))
    aa2 = R.mat2aa(mats)
    mats2 = R.batch_rodrigues(aa2)
    np.testing.assert_allclose(np.asarray(mats), np.asarray(mats2), atol=1e-4)


def test_rigid_align_recovers_similarity():
    rng = np.random.RandomState(3)
    a = rng.randn(21, 3).astype(np.float64)
    rot = np.asarray(R.batch_rodrigues(jnp.asarray(rng.randn(1, 3)))[0])
    b = 1.7 * a @ rot.T + np.array([0.1, -0.2, 0.3])
    aligned = np.asarray(R.rigid_align(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(aligned, b, atol=1e-5)
