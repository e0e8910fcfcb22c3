"""MANO layer parity vs the reference manopth implementation
(manopth/manopth/manolayer.py:111-276), via committed goldens."""

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.mano.layer import ManoLayer, mano_forward
from hoisdf_tpu.mano.model import make_synthetic_mano


def _layer():
    return ManoLayer(make_synthetic_mano(seed=0), use_pca=False, ncomps=45,
                     center_idx=0, flat_hand_mean=True)


def test_mano_forward_golden(golden):
    g = golden("mano_forward")
    layer = _layer()
    verts, joints = layer(jnp.asarray(g["pose"]), jnp.asarray(g["betas"]))
    np.testing.assert_allclose(np.asarray(verts), g["verts"], atol=2e-2)  # mm
    np.testing.assert_allclose(np.asarray(joints), g["joints"], atol=2e-2)


def test_mano_forward_template_shape_golden(golden):
    g = golden("mano_forward")
    layer = _layer()
    verts, joints = layer(jnp.asarray(g["pose"]))
    np.testing.assert_allclose(np.asarray(verts), g["verts_template"], atol=2e-2)
    np.testing.assert_allclose(np.asarray(joints), g["joints_template"], atol=2e-2)


def test_mano_shapes_reference_contract():
    # The reference's only test: (B,778,3) verts and (B,21,3) joints in mm
    # (manopth/test/test_demo.py:6-13).
    layer = _layer()
    pose = jnp.zeros((3, 48))
    verts, joints = layer(pose)
    assert verts.shape == (3, 778, 3)
    assert joints.shape == (3, 21, 3)


def test_mano_jit_and_grad():
    layer = _layer()

    @jax.jit
    def loss_fn(pose, betas):
        verts, joints = mano_forward(layer.buffers, pose, betas)
        return jnp.sum(verts**2) * 1e-6 + jnp.sum(joints**2) * 1e-6

    pose = jnp.ones((2, 48)) * 0.1
    betas = jnp.ones((2, 10)) * 0.1
    g = jax.grad(loss_fn, argnums=(0, 1))(pose, betas)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()


def test_mano_vmap_over_decoder_layers():
    # mano_head runs MANO with batch L*B (mano_head.py:232-248); vmap must
    # agree with the flattened call.
    layer = _layer()
    rng = np.random.RandomState(1)
    pose = jnp.asarray(rng.randn(4, 6, 48).astype(np.float32) * 0.3)
    betas = jnp.asarray(rng.randn(4, 6, 10).astype(np.float32) * 0.3)
    v_flat, j_flat = layer(pose.reshape(24, 48), betas.reshape(24, 10))
    v_vmap, j_vmap = jax.vmap(lambda p, b: layer(p, b))(pose, betas)
    np.testing.assert_allclose(
        np.asarray(v_vmap.reshape(24, 778, 3)), np.asarray(v_flat), atol=1e-3
    )


def test_mano_rotmat_mode_matches_axisang():
    # joint_rot_mode='rotmat' with exact rotation matrices must agree with
    # the axis-angle path (manolayer.py:158-169 branch).
    from hoisdf_tpu.ops.rotations import batch_rodrigues

    layer = _layer()
    rng = np.random.RandomState(2)
    pose_aa = jnp.asarray(rng.randn(2, 48).astype(np.float32) * 0.3)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.3)
    v_aa, j_aa = mano_forward(layer.buffers, pose_aa, betas)
    rots = batch_rodrigues(pose_aa.reshape(-1, 3)).reshape(2, 16, 3, 3)
    v_rm, j_rm = mano_forward(
        layer.buffers, rots, betas, joint_rot_mode="rotmat", use_pca=False
    )
    np.testing.assert_allclose(np.asarray(v_aa), np.asarray(v_rm), atol=1e-2)
    np.testing.assert_allclose(np.asarray(j_aa), np.asarray(j_rm), atol=1e-2)
