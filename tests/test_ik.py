"""IK solver: recover MANO pose from its own FK joints (round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.mano.layer import ManoBuffers, mano_forward
from hoisdf_tpu.mano.model import make_synthetic_mano
from hoisdf_tpu.ops.ik import ik_solver_mano


def test_ik_roundtrip_on_fk_joints():
    buffers = ManoBuffers.from_model(make_synthetic_mano(0))
    rng = np.random.RandomState(0)
    # mild articulated pose + shape
    pose = jnp.asarray(rng.randn(2, 48).astype(np.float32) * 0.2)
    shape = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.3)
    verts, joints = mano_forward(buffers, pose, shape)
    joints_m = joints / 1000.0 + jnp.asarray([[0.0, 0.0, 0.5]])[:, None]

    res = ik_solver_mano(buffers, joints_m, shape)
    assert res["pose"].shape == (2, 48)
    assert res["vis"].shape == (2, 1)
    err = jnp.linalg.norm(res["joints"] - joints_m, axis=-1)
    # IK can only rotate about the template bone directions; on the synthetic
    # model the chains are irregular, so allow a loose-but-meaningful bound.
    assert float(err.mean()) < 0.02, float(err.mean())  # < 2 cm mean


def test_ik_zero_pose_exact():
    buffers = ManoBuffers.from_model(make_synthetic_mano(0))
    shape = jnp.zeros((1, 10))
    _, joints = mano_forward(buffers, jnp.zeros((1, 48)), shape)
    joints_m = joints / 1000.0
    res = ik_solver_mano(buffers, joints_m, shape)
    err = jnp.linalg.norm(res["joints"] - joints_m, axis=-1)
    assert float(err.max()) < 1e-3
    # recovered pose should be near zero rotation
    assert float(jnp.abs(res["pose"]).max()) < 0.2
