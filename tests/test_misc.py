"""Smaller parity pieces: random-hand demo, rot projection, mesh helpers."""

import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.data.meshes import bbox21_3d, mesh_diameter, mesh_radius
from hoisdf_tpu.mano.demo import generate_random_hand
from hoisdf_tpu.ops.rotations import batch_rotprojs


def test_generate_random_hand_contract():
    # The reference's only unit test (manopth/test/test_demo.py:6-13).
    out = generate_random_hand(batch_size=3, ncomps=6)
    assert out["verts"].shape == (3, 778, 3)
    assert out["joints"].shape == (3, 21, 3)


def test_batch_rotprojs_produces_rotations():
    rng = np.random.RandomState(0)
    m = jnp.asarray(rng.randn(10, 3, 3).astype(np.float32))
    r = np.asarray(batch_rotprojs(m))
    for i in range(10):
        np.testing.assert_allclose(r[i] @ r[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r[i]) > 0.99


def test_bbox21_and_diameter():
    rng = np.random.RandomState(1)
    verts = rng.rand(500, 3).astype(np.float32)
    box = bbox21_3d(verts)
    assert box.shape == (21, 3)
    # center is the last row
    np.testing.assert_allclose(box[-1], (verts.min(0) + verts.max(0)) / 2, atol=1e-6)
    d = mesh_diameter(verts)
    extents = verts.max(0) - verts.min(0)
    assert d >= extents.max() - 1e-5  # at least the largest axis extent
    assert d <= np.linalg.norm(extents) + 1e-5  # at most the box diagonal
    assert mesh_radius(verts) <= d


def test_cfg_override_lists_become_hashable_tuples():
    """--cfg JSON array overrides must yield a hashable Config (it rides
    jit as a static argument)."""
    from hoisdf_tpu.config import get_config, parse_cfg_overrides

    ov = parse_cfg_overrides(["hier_levels=[[4,64],[2,128]]"])
    cfg = get_config("dexycb", **ov)
    assert cfg.hier_levels == ((4, 64), (2, 128))
    hash(cfg)  # would raise TypeError on a list-typed field
