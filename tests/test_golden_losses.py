"""Loss-term parity vs the reference torch modules on a dumped batch.

SURVEY §7 build-step 5 exit criterion: every term of ``common/nets/loss.py``
(14-171) plus the train-loop weighting (``main/train.py:115-127``) matches on
fixed synthetic preds/GT.  The fixture also records the reference config
constants (``main/config.py:135-145``) so a drift in our defaults fails
loudly instead of silently rescaling a term.
"""


import jax.numpy as jnp
import numpy as np
import pytest

from hoisdf_tpu import losses
from hoisdf_tpu.config import get_config

TOL = dict(atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def g(golden):
    return golden("losses")


@pytest.fixture(scope="module")
def cfg():
    return get_config("dexycb")


def test_joint_heatmap_loss(g):
    got = losses.joint_heatmap_loss(jnp.asarray(g["hm_pred"]), jnp.asarray(g["hm_gt"]))
    np.testing.assert_allclose(float(got), float(g["hm_loss"]), **TOL)


def test_joint_vote_loss(g, cfg):
    # reference layouts are [L, P, B, ...] (loss.py:31-35); ours are [L, B, P, ...]
    assert float(g["hand_cls_dist"]) == pytest.approx(cfg.hand_cls_dist, rel=1e-6)
    hand_off = jnp.asarray(np.transpose(g["hand_off"], (0, 2, 1, 3)))
    hand_cls = jnp.asarray(np.transpose(g["hand_cls"], (0, 2, 1, 3)))
    l3d, lcls, lall, hand_joints = losses.joint_vote_loss(
        cfg, jnp.asarray(g["hand_points"]), hand_off, hand_cls,
        jnp.asarray(g["joint_gt"]),
    )
    np.testing.assert_allclose(float(l3d), float(g["loss_joint_3d"]), **TOL)
    np.testing.assert_allclose(float(lcls), float(g["loss_joint_cls"]), **TOL)
    np.testing.assert_allclose(float(lall), float(g["loss_all_joint_3d"]), **TOL)
    # aggregated joints are a model output (loss.py:52-57), [L, B, J, 3]
    np.testing.assert_allclose(np.asarray(hand_joints), g["hand_joints"], **TOL)


def test_sep_sdf_loss(g):
    lh, lo = losses.sep_sdf_loss(
        jnp.asarray(g["hand_sdf"]), jnp.asarray(g["obj_sdf"]),
        jnp.asarray(g["hand_sdf_gt"]), jnp.asarray(g["obj_sdf_gt"]),
    )
    np.testing.assert_allclose(float(lh), float(g["sdfhand_loss"]), **TOL)
    np.testing.assert_allclose(float(lo), float(g["sdfobj_loss"]), **TOL)


def test_mano_loss(g, cfg):
    for lam in ("lambda_verts3d", "lambda_joints3d", "lambda_manopose",
                "lambda_manoshape"):
        assert float(g[lam]) == pytest.approx(getattr(cfg, lam), rel=1e-6), lam
    out = losses.mano_loss(
        cfg,
        {"verts3d": jnp.asarray(g["mano_preds_verts3d"]),
         "joints3d": jnp.asarray(g["mano_preds_joints3d"]),
         "mano_pose": jnp.asarray(g["mano_preds_pose"]),
         "mano_shape": jnp.asarray(g["mano_preds_shape"])},
        {"verts3d": jnp.asarray(g["mano_gts_verts3d"]),
         "joints3d": jnp.asarray(g["mano_gts_joints3d"]),
         "mano_pose": jnp.asarray(g["mano_gts_pose"]),
         "mano_shape": jnp.asarray(g["mano_gts_shape"])},
    )
    # lambdas up to 1e4 amplify fp32 noise; keep a relative tolerance
    np.testing.assert_allclose(
        float(out["mano_mesh_loss"]), float(g["mano_mesh_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(out["mano_joint_loss"]), float(g["mano_joint_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(out["pose_param_loss"]), float(g["pose_param_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(out["shape_param_loss"]), float(g["shape_param_loss"]), rtol=1e-4)


def test_mano_shape_loss(g, cfg):
    assert float(g["mano_lambda_regulshape"]) == pytest.approx(cfg.mano_lambda_regulshape, rel=1e-6)
    out = losses.mano_shape_loss(
        cfg, jnp.asarray(g["shapeonly_pred"]), jnp.asarray(g["shapeonly_gt"])
    )
    np.testing.assert_allclose(
        float(out["shape_param_loss"]), float(g["shapeonly_param_loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(out["shape_reg_loss"]), float(g["shapeonly_reg_loss"]), rtol=1e-5)


def test_weighted_total(g, cfg):
    names = [str(n) for n in g["weight_term_names"]]
    values = np.asarray(g["weight_term_values"])
    # our config constants must equal the recorded reference weights
    field_by_term = {
        "sdfhand_loss": "sdf_hand_weight", "sdfobj_loss": "sdf_obj_weight",
        "joint_heatmap": "hm_weight", "obj_seg": "obj_hm_weight",
        "hand_seg": "obj_hm_weight", "obj_rot": "obj_rot_weight",
        "obj_trans": "obj_trans_weight", "loss_joint_3d": "joint_weight",
        "loss_joint_cls": "cls_weight", "loss_all_joint_3d": "joint_weight",
    }
    for name, w in zip(names, np.asarray(g["weight_values"])):
        assert getattr(cfg, field_by_term[name]) == pytest.approx(w, rel=1e-6), name
    total = losses.weighted_total(
        cfg, {n: jnp.asarray(v) for n, v in zip(names, values)}
    )
    np.testing.assert_allclose(float(total), float(g["weighted_total"]), rtol=1e-6)


def test_all_config_presets_share_loss_constants(g):
    """The reference has ONE config (main/config.py); preset drift in loss
    constants would silently break parity for that preset."""
    base = get_config("dexycb")
    fields = ["hand_cls_dist", "sdf_hand_weight", "sdf_obj_weight", "hm_weight",
              "joint_weight", "cls_weight", "obj_hm_weight", "obj_rot_weight",
              "obj_trans_weight", "lambda_verts3d", "lambda_joints3d",
              "lambda_manopose", "lambda_manoshape", "mano_lambda_regulshape"]
    for setting in ("dexycb", "dexycb_full", "ho3d", "ho3d_render"):
        c = get_config(setting)
        for f in fields:
            assert getattr(c, f) == getattr(base, f), (setting, f)
