"""Full-model forward smoke tests: both point-acquisition branches, losses,
and gradient flow — on a shrunken config (1-CPU-friendly compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hoisdf_tpu.config import get_config
from hoisdf_tpu.losses import (
    joint_heatmap_loss,
    joint_vote_loss,
    mano_loss,
    sep_sdf_loss,
    weighted_total,
)
from hoisdf_tpu.models.hoisdf import build_model
from hoisdf_tpu.models.mano_head import mano_head_gt, mano_head_pred
from hoisdf_tpu.mano.layer import ManoBuffers
from hoisdf_tpu.mano.model import make_synthetic_mano


def tiny_config(**over):
    return get_config(
        "dexycb",
        resnet_type=18,
        hidden_dim=64,
        dim_feedforward=128,
        enc_layers=2,
        dec_layers=2,
        num_samp_hand=32,
        num_samp_obj=16,
        input_img_shape=(64, 64),
        output_hm_shape=(32, 32, 32),
        bins_n=16,
        sdf_infer_chunk=2048,
        # Tiny lattices pair with tiny hand cascades; the production
        # hier_levels_obj default would silently mix scales (tests that
        # exercise the override pass their own value).
        **{"hier_levels_obj": None, **over},
    )


def tiny_batch(cfg, b=2, train=True):
    rng = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rng.rand(b, *cfg.input_img_shape, 3).astype(np.float32)),
        "cam_intr": jnp.asarray(
            np.tile(
                np.array([[[200.0, 0, 32], [0, 200, 32], [0, 0, 1]]], np.float32),
                (b, 1, 1),
            )
        ),
        "mano_root": jnp.asarray(
            np.array([[0.0, 0.0, 0.5]] * b, np.float32)
        ),
        "obj_center_cam": jnp.asarray(np.array([[0.02, 0.0, 0.5]] * b, np.float32)),
        "bbox_hand": jnp.asarray(np.array([[0.0, 0.0, 64.0, 64.0]] * b, np.float32)),
        "bbox_obj": jnp.asarray(np.array([[0.0, 0.0, 64.0, 64.0]] * b, np.float32)),
    }
    if train:
        batch.update(
            hand_sdf_points=jnp.asarray(
                rng.randn(b, cfg.num_samp_hand, 3).astype(np.float32) * 0.3
            ),
            obj_sdf_points=jnp.asarray(
                rng.randn(b, cfg.num_samp_obj, 3).astype(np.float32) * 0.3
            ),
            hand_pre_points=jnp.asarray(
                rng.randn(b, cfg.num_samp_hand, 3).astype(np.float32) * 0.3
            ),
            obj_pre_points=jnp.asarray(
                rng.randn(b, cfg.num_samp_obj, 3).astype(np.float32) * 0.3
            ),
        )
    return batch


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = build_model(cfg)
    batch = tiny_batch(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch,
        use_presampled=True,
        dist_range=0.03,
    )
    return cfg, model, variables, batch


def test_presampled_branch_outputs(model_and_params):
    cfg, model, variables, batch = model_and_params
    out = model.apply(
        variables, batch, use_presampled=True, dist_range=0.05,
        rngs={"sample_noise": jax.random.PRNGKey(2)},
    )
    b, ph, po = 2, cfg.num_samp_hand, cfg.num_samp_obj
    assert out["hand_sdf_pred"].shape == (b, ph, 1)
    assert out["decoder_heads"].shape == (b, 32, 32, 3)
    assert out["hand_off"].shape == (cfg.enc_layers, b, ph, 60)
    assert out["hand_cls"].shape == (cfg.enc_layers, b, ph, 20)
    assert out["obj_rot"].shape == (cfg.enc_layers // 2, b, po, 3)
    assert out["mano_pose6d"].shape == (cfg.dec_layers, b, 16, 6)
    assert out["mano_shape"].shape == (cfg.dec_layers, b, 10)
    assert np.isfinite(np.asarray(out["mano_pose6d"])).all()


def test_sdf_infer_branch_outputs(model_and_params):
    cfg, model, variables, batch = model_and_params
    out = model.apply(variables, batch, use_presampled=False)
    b, ph = 2, cfg.num_samp_hand
    assert out["hand_points"].shape == (b, ph, 3)
    assert out["hand_sdf"].shape == (b, ph, 1)
    # selected points must lie inside the unit lattice and be finite
    pts = np.asarray(out["hand_points"])
    assert (np.abs(pts) <= 1.0 + 1e-6).all()
    assert np.isfinite(np.asarray(out["hand_sdf"])).all()
    # |sdf| of selected points should be small-ish (nearest-surface selection)
    assert float(np.abs(np.asarray(out["hand_sdf"])).mean()) <= cfg.clamping_distance


def test_losses_and_grads(model_and_params):
    cfg, model, variables, batch = model_and_params
    mano = ManoBuffers.from_model(make_synthetic_mano(0))
    rng = np.random.RandomState(3)
    targets = {
        "hand_sdf": jnp.asarray(rng.randn(2, cfg.num_samp_hand).astype(np.float32) * 0.05),
        "obj_sdf": jnp.asarray(rng.randn(2, cfg.num_samp_obj).astype(np.float32) * 0.05),
        "joint_gt_mm": jnp.asarray(rng.randn(2, 20, 3).astype(np.float32) * 50),
        "mano_param": jnp.asarray(rng.randn(2, 58).astype(np.float32) * 0.2),
        "obj_rot": jnp.asarray(rng.randn(2, 3).astype(np.float32)),
        "rel_obj_trans": jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.05),
        "gt_hm": jnp.zeros((2, 32, 32)),
    }

    def loss_fn(params):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            batch, use_presampled=True, dist_range=0.03,
            rngs={"sample_noise": jax.random.PRNGKey(4)},
        )
        losses = {}
        losses["sdfhand_loss"], losses["sdfobj_loss"] = sep_sdf_loss(
            out["hand_sdf_pred"], out["obj_sdf_pred"],
            jnp.clip(targets["hand_sdf"], -0.15, 0.15),
            jnp.clip(targets["obj_sdf"], -0.15, 0.15),
        )
        losses["joint_heatmap"] = joint_heatmap_loss(
            out["decoder_heads"][..., 0], targets["gt_hm"]
        )
        (losses["loss_joint_3d"], losses["loss_joint_cls"],
         losses["loss_all_joint_3d"], _) = joint_vote_loss(
            cfg, out["hand_points_notrans"], out["hand_off"], out["hand_cls"],
            targets["joint_gt_mm"],
        )
        pred_mano = mano_head_pred(mano, out["mano_pose6d"], out["mano_shape"])
        gt_mano = mano_head_gt(mano, targets["mano_param"])
        losses.update(mano_loss(cfg, pred_mano, gt_mano))
        return weighted_total(cfg, losses)

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradient must reach the backbone and both transformers
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    total_norms = {
        "backbone": 0.0, "hand_transformer": 0.0, "hand_sdf_decoder": 0.0,
    }
    for path, leaf in flat:
        key = path[0].key if hasattr(path[0], "key") else str(path[0])
        if key in total_norms:
            total_norms[key] += float(jnp.abs(leaf).sum())
    assert all(v > 0 for v in total_norms.values()), total_norms
