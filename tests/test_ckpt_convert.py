"""Checkpoint converter: full reference-transformer parity through the
converted weights, plus backbone round-trip mapping."""

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.models.transformer import Transformer, VoteTransformer
from hoisdf_tpu.tools.convert_torch_ckpt import (
    convert_state_dict,
    convert_torchvision_resnet,
)


def test_transformer_converted_weights_match_reference(golden):
    g = golden("transformer")
    state = {}
    for k in g.files:
        if k.startswith("t."):
            state["hand_transformer." + k[2:]] = g[k]
        elif k.startswith("v."):
            state["obj_transformer." + k[2:]] = g[k]
    params, stats = convert_state_dict(state)
    assert not stats  # transformers have no BN

    d, nh = 32, 4
    model = Transformer(
        d_model=d, nhead=nh, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=64, dropout=0.0,
    )
    src = jnp.asarray(g["src"]).transpose(1, 0, 2)  # [S,B,C] -> [B,S,C]
    pos = jnp.zeros_like(src)
    hs, memory, inter, attn = model.apply(
        {"params": params["hand_transformer"]}, src, pos,
        jnp.asarray(g["query"]), jnp.asarray(g["tgt_mask"]),
        jnp.asarray(g["memory_mask"]),
    )
    # reference layouts: hs [L,Q,B,C]; memory [S,B,C]; inter [L,S,B,C]
    np.testing.assert_allclose(
        np.asarray(hs), g["hs"].transpose(0, 2, 1, 3), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(memory), g["memory"].transpose(1, 0, 2), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(inter), g["inter"].transpose(0, 2, 1, 3), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(attn), g["attn"], atol=2e-5)

    vote = VoteTransformer(
        d_model=d, nhead=nh, num_encoder_layers=2, dim_feedforward=64, dropout=0.0
    )
    vmem, vinter = vote.apply({"params": params["obj_transformer"]}, src, pos)
    np.testing.assert_allclose(
        np.asarray(vmem), g["vmem"].transpose(1, 0, 2), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(vinter), g["vinter"].transpose(0, 2, 1, 3), atol=2e-5
    )


def _fake_torchvision_resnet18_state():
    """Shape-correct random torchvision resnet18 state dict."""
    rng = np.random.RandomState(0)
    state = {}

    def conv(name, o, i, k):
        state[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.01

    def bn(name, c):
        state[name + ".weight"] = np.ones(c, np.float32)
        state[name + ".bias"] = np.zeros(c, np.float32)
        state[name + ".running_mean"] = np.zeros(c, np.float32)
        state[name + ".running_var"] = np.ones(c, np.float32)
        state[name + ".num_batches_tracked"] = np.asarray(0)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inplanes = 64
    for stage, planes in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            pre = f"layer{stage}.{b}"
            stride_block = b == 0 and stage > 1
            conv(f"{pre}.conv1", planes, inplanes if b == 0 else planes, 3)
            bn(f"{pre}.bn1", planes)
            conv(f"{pre}.conv2", planes, planes, 3)
            bn(f"{pre}.bn2", planes)
            if stride_block:
                conv(f"{pre}.downsample.0", planes, inplanes, 1)
                bn(f"{pre}.downsample.1", planes)
            if b == 0:
                inplanes = planes
    state["fc.weight"] = rng.randn(1000, 512).astype(np.float32)
    state["fc.bias"] = np.zeros(1000, np.float32)
    return state


def test_torchvision_resnet_conversion_loads():
    from hoisdf_tpu.models.resnet import ResNetBackbone

    state = _fake_torchvision_resnet18_state()
    params, stats = convert_torchvision_resnet(state)

    model = ResNetBackbone(resnet_type=18)
    img = jnp.ones((1, 32, 32, 3))
    init = model.init(jax.random.PRNGKey(0), img)
    # converted trees must match the initialized structure exactly
    want_p = jax.tree_util.tree_structure(init["params"])
    got_p = jax.tree_util.tree_structure({"backbone": params["backbone"]})
    # init params have no 'backbone' wrapper; compare leaf path sets instead
    init_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(init["params"])[0]
    }
    conv_paths = {
        jax.tree_util.keystr(p).replace("['backbone']", "")
        for p, _ in jax.tree_util.tree_flatten_with_path(params["backbone"])[0]
    }
    assert init_paths == conv_paths, init_paths ^ conv_paths
    out, skips = model.apply(
        {"params": params["backbone"], "batch_stats": stats["backbone"]}, img
    )
    assert out.shape == (1, 1, 1, 512)


def _fake_big_decoder_state():
    """Shape-correct torch state dict for Decoder_big (module.py:147-218)."""
    rng = np.random.RandomState(1)
    state = {}
    pre = "decoder_net.resnet_decoder."

    def conv(name, o, i, k):
        state[pre + name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.01
        state[pre + name + ".bias"] = np.zeros(o, np.float32)

    def bn(name, c):
        state[pre + name + ".weight"] = np.ones(c, np.float32)
        state[pre + name + ".bias"] = np.zeros(c, np.float32)
        state[pre + name + ".running_mean"] = np.zeros(c, np.float32)
        state[pre + name + ".running_var"] = np.ones(c, np.float32)

    def deconv(name, i, o):
        state[pre + name + ".weight"] = rng.randn(i, o, 4, 4).astype(np.float32) * 0.01

    dims = [(2048, 1024), (1024, 512), (512, 256), (256, 128)]
    fuse_in = [2048, 1024, 512, 64 + 128]
    for n, ((i, o), fi) in enumerate(zip(dims, fuse_in), start=1):
        deconv(f"deconv{n}.0", i, o)
        bn(f"deconv{n}.1", o)
        conv(f"conv{n}.0", o, fi, 3)
        bn(f"conv{n}.1", o)
    for head in ("convOut_hm", "convOut_hand_seg", "convOut_obj_seg"):
        # [128, 128, 64, 1] chain: convs at 0,3,6; BNs at 1,4
        conv(f"{head}.0", 128, 128, 1)
        bn(f"{head}.1", 128)
        conv(f"{head}.3", 64, 128, 1)
        bn(f"{head}.4", 64)
        conv(f"{head}.6", 1, 64, 1)
    return state


def test_big_decoder_conversion_structure():
    from hoisdf_tpu.models.decoder import DecoderBig

    params, stats = convert_state_dict(_fake_big_decoder_state(), big_decoder=True)
    model = DecoderBig()
    img_feat = jnp.ones((1, 2, 2, 2048))
    skips = {
        "stride16": jnp.ones((1, 4, 4, 1024)),
        "stride8": jnp.ones((1, 8, 8, 512)),
        "stride4": jnp.ones((1, 16, 16, 256)),
        "stride2": jnp.ones((1, 32, 32, 64)),
    }
    init = model.init(jax.random.PRNGKey(0), img_feat, skips)
    init_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(init["params"])[0]
    }
    conv_paths = {
        jax.tree_util.keystr(p).replace("['decoder_net']", "")
        for p, _ in jax.tree_util.tree_flatten_with_path(params["decoder_net"])[0]
    }
    assert init_paths == conv_paths, init_paths ^ conv_paths
    pyr, heads = model.apply(
        {"params": params["decoder_net"], "batch_stats": stats["decoder_net"]},
        img_feat, skips,
    )
    assert heads.shape == (1, 32, 32, 3)


def _tiny_overrides():
    # The one shared definition — a stand-in built with these must load
    # into `evaluate --synthetic` (test_parity_dryrun_standin_to_results_txt
    # exercises exactly that seam).
    from hoisdf_tpu.config import SYNTHETIC_TINY_OVERRIDES

    return dict(SYNTHETIC_TINY_OVERRIDES)


def test_full_model_standin_roundtrip():
    """flax_to_torch_state must be the exact inverse of convert_state_dict
    over EVERY key of the full model (backbone, decoder, SDF decoders,
    transformers, heads, betas, query embed)."""
    import jax.tree_util as jtu

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.models.hoisdf import build_model
    from hoisdf_tpu.tools.make_standin_ckpt import flax_to_torch_state

    cfg = get_config("dexycb", **_tiny_overrides())
    model = build_model(cfg)
    batch = synthetic_batch(cfg, 1, train=True)
    inputs, _ = split_inputs_targets(batch)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "sample_noise": jax.random.PRNGKey(4)},
        inputs, use_presampled=True, dist_range=0.0,
    )
    state = flax_to_torch_state(
        variables["params"], variables["batch_stats"], big_decoder=False
    )
    params, stats = convert_state_dict(state, big_decoder=False)

    for want_tree, got_tree in (
        (variables["params"], params), (variables["batch_stats"], stats)
    ):
        want = dict(
            (jtu.keystr(p), np.asarray(v))
            for p, v in jtu.tree_flatten_with_path(want_tree)[0]
        )
        got = dict(
            (jtu.keystr(p), np.asarray(v))
            for p, v in jtu.tree_flatten_with_path(got_tree)[0]
        )
        assert set(want) == set(got), set(want) ^ set(got)
        for k in want:
            np.testing.assert_array_equal(want[k], got[k], err_msg=k)


def test_full_model_standin_roundtrip_big_decoder():
    """Same inverse-mapping guarantee for the ho3d big-decoder preset — the
    DecoderBig head chain indexes differently (n_chain=2, final conv at
    Sequential index 3*n_chain) and was previously untested (ADVICE r2)."""
    import jax.tree_util as jtu

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.models.hoisdf import build_model
    from hoisdf_tpu.tools.make_standin_ckpt import flax_to_torch_state

    cfg = get_config("ho3d", **dict(_tiny_overrides(), use_big_decoder=True))
    model = build_model(cfg)
    batch = synthetic_batch(cfg, 1, train=True)
    inputs, _ = split_inputs_targets(batch)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(5), "sample_noise": jax.random.PRNGKey(6)},
        inputs, use_presampled=True, dist_range=0.0,
    )
    state = flax_to_torch_state(
        variables["params"], variables["batch_stats"], big_decoder=True
    )
    params, stats = convert_state_dict(state, big_decoder=True)
    for want_tree, got_tree in (
        (variables["params"], params), (variables["batch_stats"], stats)
    ):
        want = dict(
            (jtu.keystr(p), np.asarray(v))
            for p, v in jtu.tree_flatten_with_path(want_tree)[0]
        )
        got = dict(
            (jtu.keystr(p), np.asarray(v))
            for p, v in jtu.tree_flatten_with_path(got_tree)[0]
        )
        assert set(want) == set(got), set(want) ^ set(got)
        for k in want:
            np.testing.assert_array_equal(want[k], got[k], err_msg=k)


def test_parity_dryrun_standin_to_results_txt(tmp_path, monkeypatch):
    """The converted-checkpoint dry run, end to end on a synthetic-weights
    stand-in: reference-layout .npz -> convert -> eval -> results.txt
    (VERDICT round-1 item #9; one asset-drop from real parity)."""
    import sys

    from hoisdf_tpu import evaluate
    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.tools.make_standin_ckpt import build_standin_state

    cfg = get_config("dexycb", **_tiny_overrides())
    state = build_standin_state(cfg, seed=7)
    ckpt = tmp_path / "standin_snapshot.npz"
    np.savez(ckpt, **state)

    out = tmp_path / "res"
    argv = [
        "evaluate", "--setting", "dexycb", "--synthetic", "--cpu",
        "--batches", "1", "--batch-size", "2",
        "--torch-ckpt", str(ckpt), "--out", str(out),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    evaluate.main()
    results = (out / "results.txt").read_text()
    assert "mano_mje" in results and "ADDS_error" in results
