"""Train-step tests: optimizer wiring, BN freeze, LR schedule, checkpointing,
and the 8-device data-parallel path."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hoisdf_tpu.config import get_config
from hoisdf_tpu.data.synthetic import synthetic_batch, split_inputs_targets
from hoisdf_tpu.mano.layer import ManoBuffers
from hoisdf_tpu.mano.model import make_synthetic_mano
from hoisdf_tpu.models.hoisdf import build_model
from hoisdf_tpu.parallel.mesh import make_mesh, shard_batch
from hoisdf_tpu.train import (
    create_train_state,
    lr_for_epoch,
    make_train_step,
    presample_gate,
)
from hoisdf_tpu.utils import checkpoint as ckpt


def tiny_cfg():
    return get_config(
        "dexycb", resnet_type=18, hidden_dim=64, dim_feedforward=128,
        enc_layers=2, dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = build_model(cfg)
    mano = ManoBuffers.from_model(make_synthetic_mano(0))
    batch = synthetic_batch(cfg, batch_size=2, train=True)
    inputs, targets = split_inputs_targets(batch)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    targets = {k: jnp.asarray(v) for k, v in targets.items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), inputs, 100)
    return cfg, model, mano, state, inputs, targets


def test_reference_init_distributions(setup):
    """init_weights parity (main/model.py:668-679, applied :744-750):
    decoder convs normal(0.001), transformer/SDF linears normal(0.01),
    biases 0; weight-normed (g,v), attention in_proj, norms, backbone and
    core-model heads untouched."""
    cfg, model, mano, state, inputs, targets = setup
    from hoisdf_tpu.models.initializers import apply_reference_init

    raw = model.init(
        {"params": jax.random.PRNGKey(0),
         "sample_noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        inputs, use_presampled=True, dist_range=0.03, train=False,
    )["params"]
    p = apply_reference_init(raw, jax.random.PRNGKey(3))

    def std(x):
        return float(jnp.std(jnp.asarray(x)))

    assert abs(std(p["decoder_net"]["conv1"]["conv"]["kernel"]) - 0.001) < 3e-4
    assert abs(std(p["decoder_net"]["deconv1"]["deconv"]["kernel"]) - 0.001) < 3e-4
    assert float(jnp.abs(p["decoder_net"]["conv1"]["conv"]["bias"]).max()) == 0
    enc0 = p["hand_transformer"]["encoder"]["layer0"]
    assert abs(std(enc0["linear1"]["kernel"]) - 0.01) < 3e-3
    assert float(jnp.abs(enc0["linear1"]["bias"]).max()) == 0
    assert abs(std(enc0["self_attn"]["out_proj"]["kernel"]) - 0.01) < 3e-3
    assert abs(std(p["hand_sdf_decoder"]["linh4"]["kernel"]) - 0.01) < 3e-3
    # untouched leaves keep their construction-time values
    for a, b in (
        (p["hand_sdf_decoder"]["linh0"]["v"], raw["hand_sdf_decoder"]["linh0"]["v"]),
        (enc0["self_attn"]["in_proj_weight"],
         raw["hand_transformer"]["encoder"]["layer0"]["self_attn"]["in_proj_weight"]),
        (p["backbone"]["conv1"]["kernel"], raw["backbone"]["conv1"]["kernel"]),
        (p["linear_pose"]["layers_0"]["kernel"],
         raw["linear_pose"]["layers_0"]["kernel"]),
        (enc0["norm1"]["scale"],
         raw["hand_transformer"]["encoder"]["layer0"]["norm1"]["scale"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_decreases_loss(setup):
    cfg, model, mano, state, inputs, targets = setup
    step = make_train_step(cfg, model, mano)
    losses0 = None
    for i in range(3):
        state, losses = step(
            state, inputs, targets, jax.random.PRNGKey(7), jnp.asarray(0.03),
            use_presampled=True,
        )
        if losses0 is None:
            losses0 = float(losses["total"])
    assert np.isfinite(float(losses["total"]))
    assert float(losses["total"]) < losses0  # same batch, must overfit


def test_bn_params_frozen(setup):
    cfg, model, mano, state, inputs, targets = setup
    step = make_train_step(cfg, model, mano)
    before = state.params["backbone"]["bn1"]["bn"]["scale"]
    new_state, _ = step(
        state, inputs, targets, jax.random.PRNGKey(0), jnp.asarray(0.03),
        use_presampled=True,
    )
    after = new_state.params["backbone"]["bn1"]["bn"]["scale"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    # non-BN param must move
    w0 = state.params["backbone"]["conv1"]["kernel"]
    w1 = new_state.params["backbone"]["conv1"]["kernel"]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))
    # downsample BN is NOT frozen (replicates the reference's name-filter quirk,
    # main/model.py:118-121 matches 'bn' in torchvision names only)
    d0 = state.params["backbone"]["layer2_0"]["downsample_bn"]["bn"]["scale"]
    d1 = new_state.params["backbone"]["layer2_0"]["downsample_bn"]["bn"]["scale"]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_lr_schedule_floor():
    cfg = get_config("dexycb")
    assert lr_for_epoch(cfg, 0) == pytest.approx(1e-4)
    assert lr_for_epoch(cfg, 9) == pytest.approx(7e-5)
    assert lr_for_epoch(cfg, 18) == pytest.approx(4.9e-5)
    assert lr_for_epoch(cfg, 69) == pytest.approx(1e-5)  # floored


def test_presample_gate():
    cfg = get_config("dexycb")
    assert presample_gate(cfg, epoch=10, batch_ratio=0.0, p=0.9) == (True, 0.03)
    use, d = presample_gate(cfg, epoch=50, batch_ratio=0.5, p=0.9)
    assert not use and d == 0.05
    assert presample_gate(cfg, epoch=50, batch_ratio=0.9, p=0.1) == (True, 0.07)


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, model, mano, state, inputs, targets = setup
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckpt.save_snapshot(str(tmp_path), 3, payload)
    ckpt.save_snapshot(str(tmp_path), 7, payload)
    assert ckpt.latest_epoch(str(tmp_path)) == 7
    restored = ckpt.restore_snapshot(str(tmp_path), payload)
    assert restored["epoch"] == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["backbone"]["conv1"]["kernel"]),
        np.asarray(state.params["backbone"]["conv1"]["kernel"]),
    )


def test_data_parallel_8dev_matches_single(setup):
    cfg, model, mano, state, inputs, targets = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    step = make_train_step(cfg, model, mano)
    # single-device result
    s1, losses1 = step(
        state, inputs, targets, jax.random.PRNGKey(1), jnp.asarray(0.03),
        use_presampled=True,
    )
    # 8-way data parallel on a batch of 8 (replicate the 2-sample batch 4x)
    mesh = make_mesh(jax.devices()[:8])
    big_inputs = {k: jnp.concatenate([v] * 4, axis=0) for k, v in inputs.items()}
    big_targets = {k: jnp.concatenate([v] * 4, axis=0) for k, v in targets.items()}
    with mesh:
        state_r = jax.device_put(
            state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        bi = shard_batch(big_inputs, mesh)
        bt = shard_batch(big_targets, mesh)
        s8, losses8 = step(
            state_r, bi, bt, jax.random.PRNGKey(1), jnp.asarray(0.03),
            use_presampled=True,
        )
    assert np.isfinite(float(losses8["total"]))
    # 4x-replicated batch != identical loss (noise rng differs per position)
    # but magnitudes must be close
    assert abs(float(losses8["total"]) - float(losses1["total"])) / float(
        losses1["total"]
    ) < 0.2


def test_zero_sharded_state_matches_replicated(setup):
    """ZeRO-1/FSDP via GSPMD annotations (parallel/zero.py): sharding the
    AdamW moments (and params) over the data axis is numerically a no-op —
    the elementwise update is just partitioned — so two steps must produce
    the same losses and params as the replicated-DP path."""
    cfg, model, mano, state, inputs, targets = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from hoisdf_tpu.parallel.zero import shard_state, state_shardings

    mesh = make_mesh(jax.devices()[:8])
    big_inputs = {k: jnp.concatenate([v] * 4, axis=0) for k, v in inputs.items()}
    big_targets = {k: jnp.concatenate([v] * 4, axis=0)
                   for k, v in targets.items()}

    def run(shard_params):
        with mesh:
            if shard_params is None:  # replicated-DP baseline
                s = jax.device_put(
                    state,
                    jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
                )
                step = make_train_step(cfg, model, mano)
            else:
                s, sh = shard_state(state, mesh, shard_params=shard_params,
                                    min_size=1024)
                step = make_train_step(cfg, model, mano, state_shardings=sh)
            bi = shard_batch(big_inputs, mesh)
            bt = shard_batch(big_targets, mesh)
            for k in (1, 2):
                s, losses = step(s, bi, bt, jax.random.PRNGKey(k),
                                 jnp.asarray(0.03), use_presampled=True)
        return s, losses

    s_ref, l_ref = run(None)
    for shard_params in (False, True):
        s_z, l_z = run(shard_params)
        # The elementwise update is exact, but GSPMD partitions the gradient
        # reduction differently (reduce-scatter + all-gather vs all-reduce),
        # so reduction-order drift of ~1e-4 relative across two steps is the
        # expected envelope — not equality-breaking.
        np.testing.assert_allclose(
            float(l_z["total"]), float(l_ref["total"]), rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(s_z.params["linear_shape"]["layers_0"]["kernel"]),
            np.asarray(s_ref.params["linear_shape"]["layers_0"]["kernel"]),
            rtol=1e-3, atol=1e-5,
        )
        # the moments must actually live sharded
        sharded_leaves = [
            x for x in jax.tree.leaves(s_z.opt_state)
            if hasattr(x, "sharding") and x.size >= 1024
            and x.sharding.spec != jax.sharding.PartitionSpec()
        ]
        assert sharded_leaves, "no optimizer moment ended up sharded"


def test_zero_sharding_rule_specs():
    """Largest-divisible-dim rule: big arrays shard one dim, small/indivisible
    arrays replicate."""
    from hoisdf_tpu.parallel.zero import _spec_for

    P = jax.sharding.PartitionSpec
    a = jnp.zeros((7, 9, 11))  # nothing divisible by 8
    assert _spec_for(a, 8, "data", 0) == P()
    b = jnp.zeros((16, 24))  # 24 > 16 but both divisible: largest wins
    assert _spec_for(b, 8, "data", 0) == P(None, "data")
    c = jnp.zeros((512,))
    assert _spec_for(c, 8, "data", 8192) == P()  # under min_size


def test_train_step_deterministic(setup):
    # JAX SPMD is deterministic given identical state and PRNG keys — the
    # framework's replacement for the reference's (uncalled) fix_seeds
    # (main/config.py:16-25).
    cfg, model, mano, state, inputs, targets = setup
    step = make_train_step(cfg, model, mano)
    s_a, l_a = step(state, inputs, targets, jax.random.PRNGKey(5),
                    jnp.asarray(0.03), use_presampled=True)
    s_b, l_b = step(state, inputs, targets, jax.random.PRNGKey(5),
                    jnp.asarray(0.03), use_presampled=True)
    assert float(l_a["total"]) == float(l_b["total"])
    np.testing.assert_array_equal(
        np.asarray(s_a.params["linear_shape"]["layers_0"]["kernel"]),
        np.asarray(s_b.params["linear_shape"]["layers_0"]["kernel"]),
    )


def test_backbone_init_grafts_converted_imagenet_weights(tmp_path):
    """--backbone-init loads an offline-converted torchvision snapshot and
    replaces ONLY the backbone subtree (train_loop.load_backbone_init; the
    reference downloads ImageNet weights at build, resnet.py:89-98)."""
    import jax.tree_util as jtu

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.models.hoisdf import build_model
    from hoisdf_tpu.train import create_train_state
    from hoisdf_tpu.train_loop import load_backbone_init
    from hoisdf_tpu.utils import checkpoint as ckpt_util

    cfg = get_config(
        "dexycb", resnet_type=18, hidden_dim=64, dim_feedforward=128,
        enc_layers=2, dec_layers=2, num_samp_hand=16, num_samp_obj=8,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=8,
        sdf_infer_chunk=512,
    )
    model = build_model(cfg)
    sample = synthetic_batch(cfg, 1, train=True)
    s_inputs, _ = split_inputs_targets(sample)
    s_inputs = {k: jnp.asarray(v) for k, v in s_inputs.items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), s_inputs, 10)

    # fake "converted torchvision" snapshot: backbone subtree, all-sevens
    marked_p = jtu.tree_map(lambda a: np.full_like(a, 7.0),
                            state.params["backbone"])
    marked_s = jtu.tree_map(lambda a: np.full_like(a, 3.0),
                            state.batch_stats["backbone"])
    ckpt_util.save_snapshot(
        str(tmp_path), 0,
        {"params": {"backbone": marked_p},
         "batch_stats": {"backbone": marked_s}, "opt_state": {}, "step": 0},
    )

    head_before = np.asarray(
        jtu.tree_leaves(state.params["linear_shape"])[0]
    ).copy()
    new_state = load_backbone_init(state, str(tmp_path))
    for leaf in jtu.tree_leaves(new_state.params["backbone"]):
        assert (np.asarray(leaf) == 7.0).all()
    for leaf in jtu.tree_leaves(new_state.batch_stats["backbone"]):
        assert (np.asarray(leaf) == 3.0).all()
    # everything outside the backbone untouched
    np.testing.assert_array_equal(
        np.asarray(jtu.tree_leaves(new_state.params["linear_shape"])[0]),
        head_before,
    )


def test_lagged_nan_check_dumps_diagnostic_snapshot(tmp_path, monkeypatch):
    """The pipelined loss window must still catch a NaN (a few steps late)
    and dump the post-update diagnostic snapshot + CRASH.json."""
    import sys

    import pytest as _pytest

    from hoisdf_tpu import train_loop

    real_make = train_loop.make_train_step

    def wrapped_make(cfg, model, mano, **kw):
        step = real_make(cfg, model, mano, **kw)
        calls = {"n": 0}

        def bad_step(state, inputs, targets, rng, dist, *, use_presampled):
            state, losses = step(state, inputs, targets, rng, dist,
                                 use_presampled=use_presampled)
            calls["n"] += 1
            if calls["n"] == 2:  # poison step 2's loss
                losses = dict(losses, total=losses["total"] * jnp.nan)
            return state, losses

        return bad_step

    monkeypatch.setattr(train_loop, "make_train_step", wrapped_make)
    argv = [
        "train_loop", "--setting", "dexycb", "--run_dir_name", "nanrun",
        "--synthetic", "--end_epoch", "1", "--iters-per-epoch", "3", "--cpu",
        "--cfg", f"output_dir={tmp_path}", "--cfg", "train_batch_size=8",
        "--cfg", "num_samp_hand=16", "--cfg", "num_samp_obj=8",
        "--cfg", "bins_n=8", "--cfg", "sdf_infer_chunk=512",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    with _pytest.raises(FloatingPointError):
        train_loop.main()
    crash_dir = os.path.join(
        str(tmp_path), "nanrun", "model_dump", "crash_postupdate_diagnostic"
    )
    assert os.path.exists(os.path.join(crash_dir, "CRASH.json"))
