"""Training loop: optimizer, LR schedule, train/eval steps, checkpointing.

Parity targets: ``common/base.py:59-150`` (AdamW + StepLR with the 1e-5 floor
from ``adjust_learning_rate``, snapshot save/resume), ``main/train.py:96-163``
(loss weighting, the p<0.4 / warm-up-epoch point-sampling gate, per-epoch
schedule step).

TPU design: one jitted SPMD train step over a ``data`` mesh — batch sharded,
params replicated, gradient all-reduce inserted by XLA over ICI.  The
stochastic branch (jittered GT points vs field-guided sampling) is a static
argument: two compiled variants, selected per step on the host exactly where
the reference draws ``random.uniform`` (main/model.py:426-427).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from hoisdf_tpu.config import Config
from hoisdf_tpu.losses import (
    bce,
    joint_heatmap_loss,
    joint_vote_loss,
    mano_loss,
    mano_shape_loss,
    sdf_part_classifier_loss,
    sep_sdf_loss,
    smooth_l1,
    weighted_total,
)
from hoisdf_tpu.mano.layer import ManoBuffers
from hoisdf_tpu.models.hoisdf import HOISDF
from hoisdf_tpu.ops import wire
from hoisdf_tpu.models.mano_head import mano_head_gt, mano_head_pred
from hoisdf_tpu.ops.heatmap import render_gaussian_heatmap


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    """StepLR gamma^(epoch//drop) with the reference's 1e-5 floor
    (main/config.py:131-134, common/base.py:30-32)."""
    return max(cfg.lr * cfg.lr_decay_gamma ** (epoch // cfg.lr_drop), cfg.lr_floor)


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    def schedule(step):
        epoch = step // steps_per_epoch
        lr = cfg.lr * cfg.lr_decay_gamma ** (epoch // cfg.lr_drop)
        return jnp.maximum(lr, cfg.lr_floor)

    return schedule


def _bn_freeze_mask(params) -> Any:
    """Mask replicating the reference's BN freeze (main/model.py:118-121):
    backbone params whose *name* contains 'bn' — i.e. block bn1/bn2/bn3 and
    the stem bn1, but NOT the downsample BNs (named 'downsample.1' there,
    'downsample_bn' here).  Returns a pytree of 'frozen'/'trainable' labels."""

    def label(path, _):
        keys = [p.key for p in path if hasattr(p, "key")]
        # Match the wrapper module names bn1/bn2/bn3 (stem + block BNs) but
        # not downsample_bn — its torchvision name is 'downsample.1', which
        # the reference's "bn in name" filter does not catch.  The inner _BN
        # submodule is always called 'bn' and must not trigger the match.
        if keys and keys[0] == "backbone":
            if any(k in ("bn1", "bn2", "bn3") for k in keys[1:]):
                return "frozen"
        return "trainable"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg: Config, params, steps_per_epoch: int):
    """AdamW (torch defaults: b1 .9, b2 .999, eps 1e-8, wd 1e-2) with the
    stepped LR schedule and the backbone-BN freeze."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    adamw = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)
    tx = optax.multi_transform(
        {"trainable": adamw, "frozen": optax.set_to_zero()},
        _bn_freeze_mask(params),
    )
    return tx


def create_train_state(
    cfg: Config, model: HOISDF, rng: jax.Array, sample_batch: Dict,
    steps_per_epoch: int = 1000,
) -> TrainState:
    variables = model.init(
        {"params": rng, "sample_noise": jax.random.fold_in(rng, 1),
         "dropout": jax.random.fold_in(rng, 2)},
        sample_batch, use_presampled=True, dist_range=0.03, train=False,
    )
    params = variables["params"]
    if cfg.reference_init:
        # train-mode init parity (main/model.py:744-750); checkpoint
        # restoration/conversion overwrites this, so converter parity holds
        from hoisdf_tpu.models.initializers import apply_reference_init

        params = apply_reference_init(params, jax.random.fold_in(rng, 3))
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, params, steps_per_epoch)
    return TrainState(
        step=jnp.asarray(0), params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), tx=tx,
    )


def compute_losses(
    cfg: Config,
    out: Dict[str, jax.Array],
    targets: Dict[str, jax.Array],
    mano_buffers: ManoBuffers,
    *,
    with_sdf: bool = True,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """All training losses (main/model.py:400-422, 631-662) as scalars.

    Returns (losses, aux outputs incl. aggregated hand joints / mano meshes).
    """
    losses: Dict[str, jax.Array] = {}
    aux: Dict[str, jax.Array] = {}

    if with_sdf:
        hand_gt = jnp.clip(
            targets["hand_sdf"], -cfg.clamping_distance, cfg.clamping_distance
        )
        obj_gt = jnp.clip(
            targets["obj_sdf"], -cfg.clamping_distance, cfg.clamping_distance
        )
        losses["sdfhand_loss"], losses["sdfobj_loss"] = sep_sdf_loss(
            out["hand_sdf_pred"], out["obj_sdf_pred"], hand_gt, obj_gt
        )
        gt_hm = render_gaussian_heatmap(
            targets["joint_coord"],
            (cfg.output_hm_shape[1], cfg.output_hm_shape[2]),
            cfg.sigma,
        )
        heads = out["decoder_heads"]
        losses["joint_heatmap"] = joint_heatmap_loss(heads[..., 0], gt_hm)
        losses["hand_seg"] = jnp.mean(bce(heads[..., 1], targets["hand_seg"]))
        losses["obj_seg"] = jnp.mean(bce(heads[..., 2], targets["obj_seg"]))
        # labels can legitimately be absent: both datasets omit them when the
        # sdf .npy files carry only 5 columns (data/dexycb.py, data/ho3d.py)
        if (cfg.classifier_branch and "hand_cls_logits" in out
                and "hand_part_labels" in targets):
            losses["sdf_cls_loss"] = sdf_part_classifier_loss(
                out["hand_cls_logits"], targets["hand_part_labels"]
            )

    joints_gt = targets["joint_cam_no_trans"][:, 1:]  # mm, root excluded
    (
        losses["loss_joint_3d"],
        losses["loss_joint_cls"],
        losses["loss_all_joint_3d"],
        hand_joints,
    ) = joint_vote_loss(
        cfg, out["hand_points_notrans"], out["hand_off"], out["hand_cls"], joints_gt
    )
    aux["hand_joints"] = hand_joints[-1]

    if cfg.use_inverse_kinematics:
        losses.update(
            mano_shape_loss(cfg, out["mano_shape"], targets["mano_param"][:, -10:])
        )
        aux["mano_shape"] = out["mano_shape"][-1]
    else:
        pred_mano = mano_head_pred(mano_buffers, out["mano_pose6d"], out["mano_shape"])
        gt_mano = mano_head_gt(mano_buffers, targets["mano_param"])
        losses.update(mano_loss(cfg, pred_mano, gt_mano))
        aux["mano_verts"] = pred_mano["verts3d"][-1]
        aux["mano_joints"] = pred_mano["joints3d"][-1]
        aux["mano_joints_gt"] = gt_mano["joints3d"]
        aux["mano_verts_gt"] = gt_mano["verts3d"]

    losses["obj_rot"] = jnp.mean(
        smooth_l1(
            out["obj_rot"],
            jnp.broadcast_to(targets["obj_rot"][None, :, None], out["obj_rot"].shape),
        )
    )
    losses["obj_trans"] = jnp.mean(
        smooth_l1(
            out["obj_trans"],
            jnp.broadcast_to(
                targets["rel_obj_trans"][None, :, None], out["obj_trans"].shape
            ),
        )
    )
    return losses, aux


def make_train_step(
    cfg: Config, model: HOISDF, mano_buffers: ManoBuffers,
    donate_state: bool = False,
    state_shardings=None,
):
    """Build the jitted SPMD train step.  ``use_presampled`` is static.

    ``donate_state=True`` updates params/opt_state buffers in place instead of
    holding old+new trees live — roughly a full params+optimizer copy of HBM
    saved per step.  The caller must then rebind the returned state and never
    touch the old one (the production loops do; tests that diff old-vs-new
    state keep the default).

    ``state_shardings`` (from ``parallel.zero.shard_state``) pins the updated
    state to its ZeRO/FSDP layout so the sharded optimizer update stays
    sharded across steps instead of XLA re-deciding per step.
    """

    @functools.partial(
        jax.jit,
        static_argnames=("use_presampled",),
        donate_argnames=("state",) if donate_state else (),
    )
    def train_step(
        state: TrainState,
        inputs: Dict[str, jax.Array],
        targets: Dict[str, jax.Array],
        rng: jax.Array,
        dist_range: jax.Array,
        *,
        use_presampled: bool,
    ):
        # u8 wire format (Config.transfer_dtype="uint8"): rebuild the exact
        # f32 image/mask values on device — trace-time no-op for f32 wires.
        inputs = wire.decode_inputs(inputs, cfg.compute_dtype)
        targets = wire.decode_targets(targets)
        rng_noise, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs,
                use_presampled=use_presampled,
                dist_range=dist_range,
                train=True,
                rngs={"sample_noise": rng_noise, "dropout": rng_drop},
                mutable=["batch_stats"],
            )
            losses, _ = compute_losses(cfg, out, targets, mano_buffers)
            return weighted_total(cfg, losses), (losses, mutated["batch_stats"])

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        if state_shardings is not None:
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_shardings
            )
        losses["total"] = total
        return new_state, losses

    return train_step


def vote_hand_joints(out: Dict[str, jax.Array]) -> jax.Array:
    """Softmax-aggregated per-point votes -> hand joints [B,20,3] m
    (loss.py:53-56).  Shared by eval, serving export, and the graft entry so
    the aggregation can never drift between them."""
    votes = out["hand_points_notrans"][None, :, :, None, :] + out[
        "hand_off"
    ].reshape(*out["hand_off"].shape[:3], 20, 3)
    weights = jax.nn.softmax(out["hand_cls"], axis=2)[..., None]
    return jnp.sum(votes * weights, axis=2)[-1]


def make_eval_step(
    cfg: Config, model: HOISDF, mano_buffers: ManoBuffers,
    supervise_sdf: Optional[bool] = None,
):
    """Jitted eval forward: field-guided sampling, no dropout, running BN.

    ``supervise_sdf`` defaults to the reference behavior (DexYCB eval feeds
    GT SDF sample points, main/model.py:370); pass False for pure serving.
    """

    supervise = (
        cfg.dataset == "dexycb" if supervise_sdf is None else supervise_sdf
    )

    @jax.jit
    def eval_step(params, batch_stats, inputs):
        inputs = wire.decode_inputs(inputs, cfg.compute_dtype)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs,
            use_presampled=False,
            train=False,
            supervise_sdf=supervise,
        )
        preds = {
            "obj_rot": out["obj_rot"][-1],  # [B, P, 3]
            "obj_trans": out["obj_trans"][-1],
            "hand_points_notrans": out["hand_points_notrans"],
            "hand_off": out["hand_off"],
            "hand_cls": out["hand_cls"],
            "decoder_heads": out["decoder_heads"],
        }
        preds["hand_joints"] = vote_hand_joints(out)  # [B,20,3] m
        if not cfg.use_inverse_kinematics:
            # Eval consumes only the final decoder layer (main/test.py);
            # the per-layer FK is batched as one L*B MANO forward, so XLA
            # cannot DCE the unused layers away from a [-1] slice — feed
            # the final layer only (exact, saves (L-1)/L of eval-time FK).
            pred_mano = mano_head_pred(
                mano_buffers, out["mano_pose6d"][-1:], out["mano_shape"][-1:]
            )
            preds["mano_verts"] = pred_mano["verts3d"][-1]
            preds["mano_joints"] = pred_mano["joints3d"][-1]
        else:
            preds["mano_shape"] = out["mano_shape"][-1]
        return preds

    return eval_step


def presample_gate(
    cfg: Config, epoch: int, batch_ratio: float, p: float
) -> Tuple[bool, float]:
    """Host-side branch selection (main/model.py:426-432): returns
    (use_presampled, dist_range)."""
    use_pre = p < 0.4 or epoch < cfg.point_sampling_epoch
    idx = sum(1 for r in cfg.random_ratio if batch_ratio > r)
    return use_pre, cfg.random_move_dist[idx]
