"""Model-variant smoke tests: the IK (ho3d_render) head and the big decoder
(ho3d) — structurally different graphs from the dexycb flagship."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hoisdf_tpu.config import get_config
from hoisdf_tpu.losses import mano_shape_loss
from hoisdf_tpu.models.hoisdf import build_model
from test_model import tiny_batch


def test_ik_variant_forward_and_shape_loss():
    cfg = get_config(
        "ho3d_render",
        resnet_type=18, hidden_dim=64, dim_feedforward=128, enc_layers=2,
        dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048, use_big_decoder=False,
    )
    assert cfg.use_inverse_kinematics
    model = build_model(cfg)
    batch = tiny_batch(cfg, b=2, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=True, dist_range=0.03,
    )
    # single learned query (main/model.py:75-76)
    assert variables["params"]["mano_query_embed"].shape == (1, 64)
    out = model.apply(
        variables, batch, use_presampled=True, dist_range=0.03,
        rngs={"sample_noise": jax.random.PRNGKey(2)},
    )
    assert "mano_pose6d" not in out
    assert out["mano_shape"].shape == (cfg.dec_layers, 2, 10)
    losses = mano_shape_loss(
        cfg, out["mano_shape"], jnp.zeros((2, 10))
    )
    assert np.isfinite(float(losses["shape_param_loss"]))
    assert np.isfinite(float(losses["shape_reg_loss"]))


def test_classifier_branch_forward_and_loss():
    """ClassifierBranch (main/model.py:236-352, sdf_cls_weight
    main/config.py:138): part-class logits are surfaced from the supervised
    field queries and the CE loss term is applied and differentiable."""
    from hoisdf_tpu.losses import sdf_part_classifier_loss, weighted_total
    from hoisdf_tpu.train import compute_losses
    from hoisdf_tpu.mano.layer import ManoBuffers
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.data.synthetic import synthetic_batch, split_inputs_targets

    cfg = get_config(
        "dexycb", classifier_branch=True,
        resnet_type=18, hidden_dim=64, dim_feedforward=128, enc_layers=2,
        dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048,
    )
    model = build_model(cfg)
    batch_np = synthetic_batch(cfg, batch_size=2, train=True)
    inputs, targets = split_inputs_targets(batch_np)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    targets = {k: jnp.asarray(v) for k, v in targets.items()}
    assert "hand_part_labels" in targets

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        inputs, use_presampled=True, dist_range=0.03,
    )
    out = model.apply(
        variables, inputs, use_presampled=True, dist_range=0.03,
        rngs={"sample_noise": jax.random.PRNGKey(2)},
    )
    assert out["hand_cls_logits"].shape == (2, cfg.num_samp_hand, cfg.num_class)
    assert out["obj_cls_logits"].shape == (2, cfg.num_samp_obj, cfg.num_class)

    mano = ManoBuffers.from_model(make_synthetic_mano(0))
    losses, _ = compute_losses(cfg, out, targets, mano)
    assert "sdf_cls_loss" in losses
    assert np.isfinite(float(losses["sdf_cls_loss"]))
    # weight applied (sdf_cls_weight=10, main/config.py:138)
    base = weighted_total(cfg, {k: v for k, v in losses.items()
                                if k != "sdf_cls_loss"})
    tot = weighted_total(cfg, losses)
    np.testing.assert_allclose(
        float(tot - base), float(losses["sdf_cls_loss"]) * cfg.sdf_cls_weight,
        rtol=1e-5,
    )

    # ignore-label masking: all -1 labels -> zero loss; grads flow otherwise
    zero = sdf_part_classifier_loss(
        out["hand_cls_logits"], -jnp.ones((2, cfg.num_samp_hand), jnp.int32)
    )
    assert float(zero) == 0.0
    g = jax.grad(
        lambda lg: sdf_part_classifier_loss(lg, targets["hand_part_labels"])
    )(out["hand_cls_logits"])
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_big_decoder_variant_forward():
    cfg = get_config(
        "ho3d",
        resnet_type=50, hidden_dim=64, dim_feedforward=128, enc_layers=2,
        dec_layers=2, num_samp_hand=16, num_samp_obj=8,
        input_img_shape=(32, 32), output_hm_shape=(16, 16, 16), bins_n=8,
        sdf_infer_chunk=512,
    )
    assert cfg.use_big_decoder and cfg.multiscale_dim == 3968
    model = build_model(cfg)
    batch = tiny_batch(cfg, b=1, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=True, dist_range=0.03,
    )
    out = model.apply(
        variables, batch, use_presampled=True, dist_range=0.03,
        rngs={"sample_noise": jax.random.PRNGKey(2)},
    )
    assert out["mano_pose6d"].shape == (2, 1, 16, 6)
    assert np.isfinite(np.asarray(out["mano_pose6d"])).all()


def test_hier_sampler_variant_forward():
    """sdf_infer_mode='hier' drives the multi-level cascade end-to-end and
    selects near-surface lattice points like the other modes."""
    import jax
    import numpy as np

    from test_model import tiny_config

    cfg = tiny_config(sdf_infer_mode="hier", hier_levels=((4, 16), (2, 48)))
    model = build_model(cfg)
    batch = tiny_batch(cfg, b=2, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=True, dist_range=0.03,
    )
    out = model.apply(variables, batch, use_presampled=False)
    assert out["hand_points"].shape == (2, cfg.num_samp_hand, 3)
    pts = np.asarray(out["hand_points"])
    assert (np.abs(pts) <= 1.0 + 1e-6).all()
    assert np.isfinite(np.asarray(out["hand_sdf"])).all()


def test_hier_levels_obj_override():
    """cfg.hier_levels_obj gives the object field its own (cheaper) cascade
    while the hand keeps hier_levels: the obj selection must match a model
    whose SHARED levels equal the override, and the hand selection must be
    untouched by it (models/hoisdf.py::sdf_infer level routing)."""
    import dataclasses

    from test_model import tiny_config

    cfg = tiny_config(sdf_infer_mode="hier", hier_levels=((4, 16), (2, 48)))
    obj_levels = ((4, 8), (2, 24))
    cfg_split = dataclasses.replace(cfg, hier_levels_obj=obj_levels)
    cfg_cheap = dataclasses.replace(cfg, hier_levels=obj_levels)
    batch = tiny_batch(cfg, b=2, train=True)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=True, dist_range=0.03,
    )
    out_base = model.apply(variables, batch, use_presampled=False)
    out_split = build_model(cfg_split).apply(
        variables, batch, use_presampled=False
    )
    out_cheap = build_model(cfg_cheap).apply(
        variables, batch, use_presampled=False
    )

    np.testing.assert_array_equal(
        np.asarray(out_split["hand_points"]), np.asarray(out_base["hand_points"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_split["obj_points"]), np.asarray(out_cheap["obj_points"])
    )
    np.testing.assert_allclose(
        np.asarray(out_split["obj_sdf"]), np.asarray(out_cheap["obj_sdf"]),
        atol=1e-6, rtol=0,
    )


def test_paired_sampler_parity():
    """cfg.paired_sdf_infer folds the hand+obj cascades into one grouped
    cascade (models/hoisdf.py::sdf_infer_pair).  Per-group probes, scores
    and top-K are mathematically those of two separate sdf_infer calls, so
    the full forward must produce the SAME selected points/SDFs and (to fp
    tolerance) the same head outputs."""
    import dataclasses

    from test_model import tiny_config

    cfg = tiny_config(sdf_infer_mode="hier", hier_levels=((4, 16), (2, 48)))
    cfg_pair = dataclasses.replace(cfg, paired_sdf_infer=True)
    model = build_model(cfg)
    model_pair = build_model(cfg_pair)
    batch = tiny_batch(cfg, b=2, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=True, dist_range=0.03,
    )
    out_a = model.apply(variables, batch, use_presampled=False)
    # Same variables drive both module variants: sdf_infer_pair materializes
    # the identical submodule tree.
    out_b = model_pair.apply(variables, batch, use_presampled=False)

    np.testing.assert_array_equal(
        np.asarray(out_a["hand_points"]), np.asarray(out_b["hand_points"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_a["obj_points"]), np.asarray(out_b["obj_points"])
    )
    np.testing.assert_allclose(
        np.asarray(out_a["hand_sdf"]), np.asarray(out_b["hand_sdf"]),
        atol=1e-6, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(out_a["obj_sdf"]), np.asarray(out_b["obj_sdf"]),
        atol=1e-6, rtol=0,
    )
    for key in ("mano_shape", "obj_rot", "obj_trans", "hand_off"):
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]),
            atol=1e-5, rtol=1e-5, err_msg=key,
        )


def test_paired_sampler_rejects_per_field_levels():
    """The paired cascade folds both fields into one static-shape group and
    cannot honor hier_levels_obj — a conflicting override must fail loudly
    at trace time, not silently fall back to shared levels."""
    import dataclasses

    from test_model import tiny_config

    cfg = tiny_config(
        sdf_infer_mode="hier", hier_levels=((4, 16), (2, 48)),
        hier_levels_obj=((4, 8), (2, 24)), paired_sdf_infer=True,
    )
    model = build_model(cfg)
    batch = tiny_batch(cfg, b=2, train=True)
    with pytest.raises(ValueError, match="paired_sdf_infer"):
        model.init(
            {"params": jax.random.PRNGKey(0),
             "sample_noise": jax.random.PRNGKey(1)},
            batch, use_presampled=False,
        )
    # equal levels are fine (the guard only rejects a CONFLICT)
    cfg_ok = dataclasses.replace(cfg, hier_levels_obj=((4, 16), (2, 48)))
    build_model(cfg_ok).init(
        {"params": jax.random.PRNGKey(0),
         "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=False,
    )


def test_merged_field_queries_parity():
    """cfg.merged_field_queries reuses one [B, Ph+Po] gather for token
    features AND cross-field queries.  The cross queries sample at the same
    camera points as the tokens (the unmerged path's scaled-frame round trip
    only adds fp rounding), so outputs must agree to fp tolerance, and the
    merged path must stay differentiable.  (merged is the production
    default since round 3 — pin BOTH sides explicitly so the parity claim
    survives default flips.)"""
    import dataclasses

    from test_model import tiny_config

    cfg = tiny_config(
        sdf_infer_mode="hier", hier_levels=((4, 16), (2, 48)),
        merged_field_queries=False,
    )
    cfg_m = dataclasses.replace(cfg, merged_field_queries=True)
    model = build_model(cfg)
    model_m = build_model(cfg_m)
    batch = tiny_batch(cfg, b=2, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=True, dist_range=0.03,
    )
    out_a = model.apply(variables, batch, use_presampled=False)
    out_b = model_m.apply(variables, batch, use_presampled=False)
    np.testing.assert_array_equal(
        np.asarray(out_a["hand_points"]), np.asarray(out_b["hand_points"])
    )
    for key in ("mano_shape", "obj_rot", "obj_trans", "hand_off", "hand_cls"):
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]),
            atol=5e-4, rtol=1e-3, err_msg=key,
        )

    # Gradients flow through the merged gather (presampled train branch).
    def loss_fn(params):
        out = model_m.apply(
            {**variables, "params": params}, batch, use_presampled=True,
            dist_range=0.0, train=False,
            rngs={"sample_noise": jax.random.PRNGKey(2)},
        )
        return jnp.sum(out["hand_off"] ** 2) + jnp.sum(out["obj_rot"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_default_sampler_is_production_hier():
    """The entry-point default sampler IS the promoted production cascade
    (VERDICT r3 #1): a fresh `get_config(...)` — what evaluate.py,
    train_loop.py and bench.py build with zero --cfg — must run the
    oracle-gated hier cascade, not the 927 ms/step dense parity scan."""
    from hoisdf_tpu.config import Config, get_config

    assert Config().sdf_infer_mode == "hier"
    for setting in ("dexycb", "dexycb_full", "ho3d", "ho3d_render"):
        assert get_config(setting).sdf_infer_mode == "hier", setting


def test_hier_mode_end_outputs_match_full_scan():
    """Production-mode end-output golden (VERDICT r3 #6): with the same
    weights, the hier cascade's FULL forward — selected points, SDFs and
    every downstream head (joint votes, MANO pose/shape, object rot/trans)
    — must match the exact dense-scan "full" mode.  The cascade's
    conservative pruning preserves the reference's top-K semantics
    (main/model.py:345-352): on the tiny lattice the selected point set is
    bit-identical, and head outputs agree to fp32 reassociation noise
    (measured max rel diff ~1e-6; the SDF field is evaluated at different
    probe chunkings between the two modes).  Protects accuracy claims from
    future sampler churn."""
    import dataclasses

    from test_model import tiny_config

    cfg_h = tiny_config(sdf_infer_mode="hier", hier_levels=((4, 16), (2, 48)))
    cfg_f = dataclasses.replace(cfg_h, sdf_infer_mode="full")
    batch = tiny_batch(cfg_h, b=2, train=True)
    model_h = build_model(cfg_h)
    variables = model_h.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=True, dist_range=0.03,
    )
    out_h = model_h.apply(variables, batch, use_presampled=False)
    out_f = build_model(cfg_f).apply(variables, batch, use_presampled=False)

    # The field-guided selection itself: identical lattice points.
    for key in ("hand_points", "obj_points", "hand_points_notrans"):
        np.testing.assert_array_equal(
            np.asarray(out_h[key]), np.asarray(out_f[key]), err_msg=key
        )
    # End outputs: everything the Evaluator consumes (joints via
    # hand_off/hand_cls votes, MANO params, object pose).
    for key in (
        "hand_off", "hand_cls", "mano_pose6d", "mano_shape",
        "obj_rot", "obj_trans", "hand_sdf", "obj_sdf",
    ):
        np.testing.assert_allclose(
            np.asarray(out_h[key]), np.asarray(out_f[key]),
            atol=1e-5, rtol=1e-4, err_msg=key,
        )


def test_hier_levels_obj_gate_fallback():
    """The stock hier_levels_obj is oracle-gated at K=num_samp_obj=200 only:
    raising num_samp_obj past the gate while leaving the field at its
    default must route the object cascade to the shared hier_levels
    (ADVICE r3), while an EXPLICIT override is honored at any K.  Since
    round 5 the fallback is a construction-time normalization
    (Config.__post_init__ -> hier_levels_obj=None, with a warning), not a
    trace-time heuristic; verified both directly and structurally via the
    selected-point parity trick from test_hier_levels_obj_override."""
    import dataclasses

    import pytest

    from hoisdf_tpu.config import Config
    from test_model import tiny_config

    stock = Config().hier_levels_obj
    shared = ((4, 16), (2, 48))
    # num_samp_obj above the gate + stock obj levels (they clamp fine at
    # tiny scale, so any difference comes from the routing, not asserts).
    with pytest.warns(UserWarning, match="quality gate"):
        cfg = dataclasses.replace(
            tiny_config(
                sdf_infer_mode="hier", hier_levels=shared, hier_levels_obj=stock
            ),
            num_samp_obj=201,
        )
    assert cfg.hier_levels_obj is None  # normalized at construction
    batch = tiny_batch(cfg, b=2, train=True)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample_noise": jax.random.PRNGKey(1)},
        batch, use_presampled=True, dist_range=0.03,
    )
    out = model.apply(variables, batch, use_presampled=False)
    # fallback => identical to a model with hier_levels_obj=None
    out_shared = build_model(
        dataclasses.replace(cfg, hier_levels_obj=None)
    ).apply(variables, batch, use_presampled=False)
    np.testing.assert_array_equal(
        np.asarray(out["obj_points"]), np.asarray(out_shared["obj_points"])
    )
    # explicit (non-stock) override at the same K IS honored: it selects
    # like a model whose shared levels equal the override
    override = ((4, 12), (2, 36))  # 36*8=288 final candidates >= K=201
    out_ovr = build_model(
        dataclasses.replace(cfg, hier_levels_obj=override)
    ).apply(variables, batch, use_presampled=False)
    out_cheap = build_model(
        dataclasses.replace(cfg, hier_levels=override, hier_levels_obj=None)
    ).apply(variables, batch, use_presampled=False)
    np.testing.assert_array_equal(
        np.asarray(out_ovr["obj_points"]), np.asarray(out_cheap["obj_points"])
    )
