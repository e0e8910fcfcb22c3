"""Loss-function unit tests against hand-computed values (common/nets/loss.py)."""

import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.config import get_config
from hoisdf_tpu.losses import (
    bce,
    bce_with_logits,
    joint_vote_loss,
    sep_sdf_loss,
    smooth_l1,
    weighted_total,
)


def test_smooth_l1_matches_torch_semantics():
    x = jnp.asarray([0.0, 0.5, 1.0, 2.0, -3.0])
    t = jnp.zeros(5)
    got = np.asarray(smooth_l1(x, t))
    want = np.array([0.0, 0.125, 0.5, 1.5, 2.5])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bce_with_logits_stable():
    logits = jnp.asarray([-50.0, 0.0, 50.0])
    labels = jnp.asarray([0.0, 1.0, 1.0])
    got = np.asarray(bce_with_logits(logits, labels))
    np.testing.assert_allclose(got, [0.0, np.log(2), 0.0], atol=1e-6)
    assert np.isfinite(got).all()


def test_bce_probability_form():
    p = jnp.asarray([0.5, 0.9])
    y = jnp.asarray([1.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(bce(p, y)), [-np.log(0.5), -np.log(0.9)], atol=1e-5
    )


def test_sep_sdf_loss_is_l1_mean():
    pred_h = jnp.full((2, 4, 1), 0.1)
    pred_o = jnp.full((2, 3, 1), -0.2)
    gt_h = jnp.zeros((2, 4))
    gt_o = jnp.zeros((2, 3))
    lh, lo = sep_sdf_loss(pred_h, pred_o, gt_h, gt_o)
    np.testing.assert_allclose(float(lh), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(lo), 0.2, atol=1e-6)


def test_joint_vote_loss_perfect_votes():
    """Votes that point exactly at the GT joints: reg losses ~0, cls BCE
    reflects the membership labels."""
    cfg = get_config("dexycb")
    l_layers, b, p, j = 2, 1, 5, 3
    rng = np.random.RandomState(0)
    joints_gt_m = rng.randn(b, j, 3).astype(np.float32) * 0.02  # metres
    points = rng.randn(b, p, 3).astype(np.float32) * 0.02
    # offsets that vote exactly: off = gt - point
    off = joints_gt_m[:, None, :, :] - points[:, :, None, :]  # [B,P,J,3]
    hand_off = jnp.broadcast_to(
        jnp.asarray(off.reshape(b, p, j * 3))[None], (l_layers, b, p, j * 3)
    )
    hand_cls = jnp.full((l_layers, b, p, j), 10.0)  # all points vote
    l3d, lcls, lall, hand_joints = joint_vote_loss(
        cfg, jnp.asarray(points), hand_off, hand_cls,
        jnp.asarray(joints_gt_m * 1000),
    )
    assert float(l3d) < 1e-4
    assert float(lall) < 1e-4
    np.testing.assert_allclose(
        np.asarray(hand_joints[0, 0]), joints_gt_m[0], atol=1e-5
    )


def test_weighted_total_uses_reference_weights():
    cfg = get_config("dexycb")
    losses = {"sdfhand_loss": jnp.asarray(1.0), "obj_trans": jnp.asarray(1.0),
              "mano_mesh_loss": jnp.asarray(1.0)}
    total = float(weighted_total(cfg, losses))
    # 50 (sdf hand) + 100 (obj trans) + 1 (mano losses are pre-weighted)
    np.testing.assert_allclose(total, 151.0, atol=1e-6)
