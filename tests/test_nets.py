"""SDF decoder and attention parity vs torch goldens."""

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.models.sdf_decoder import SDFDecoder
from hoisdf_tpu.models.transformer import (
    MultiheadAttention,
    Transformer,
    VoteTransformer,
    get_mano_memory_mask,
    get_mano_tgt_mask,
)


def test_sdf_decoder_golden(golden):
    g = golden("sdf_decoder")
    dec = SDFDecoder(latent_size=256, point_feat_size=33)
    x = jnp.asarray(g["x"])
    params = dec.init(jax.random.PRNGKey(0), x)["params"]

    loaded = dict(params)
    for i in range(4):
        loaded[f"linh{i}"] = {
            "v": jnp.asarray(g[f"linh{i}.weight_v"]),
            "g": jnp.asarray(g[f"linh{i}.weight_g"]).reshape(-1),
            "bias": jnp.asarray(g[f"linh{i}.bias"]),
        }
    loaded["linh4"] = {
        "kernel": jnp.asarray(g["linh4.weight"]).T,
        "bias": jnp.asarray(g["linh4.bias"]),
    }
    sdf, cls = dec.apply({"params": loaded}, x)
    assert cls is None
    np.testing.assert_allclose(np.asarray(sdf), g["sdf"], atol=2e-5)


def test_mha_golden(golden):
    g = golden("mha")
    mha = MultiheadAttention(d_model=32, nhead=4)
    q = jnp.asarray(g["q"]).transpose(1, 0, 2)  # torch [T,B,C] -> [B,T,C]
    k = jnp.asarray(g["k"]).transpose(1, 0, 2)
    v = jnp.asarray(g["v"]).transpose(1, 0, 2)
    params = mha.init(jax.random.PRNGKey(0), q, k, v)["params"]
    loaded = {
        "in_proj_weight": jnp.asarray(g["in_proj_weight"]),
        "in_proj_bias": jnp.asarray(g["in_proj_bias"]),
        "out_proj": {
            "kernel": jnp.asarray(g["out_proj_weight"]).T,
            "bias": jnp.asarray(g["out_proj_bias"]),
        },
    }
    out, wts = mha.apply(
        {"params": loaded}, q, k, v, attn_mask=jnp.asarray(g["attn_mask"])
    )
    np.testing.assert_allclose(
        np.asarray(out), g["out"].transpose(1, 0, 2), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(wts), g["wts"], atol=1e-5)


def test_transformer_shapes_and_masks():
    # Tiny config to keep 1-CPU compile fast; checks the DETR contract:
    # per-layer decoder intermediates, encoder intermediates, attn weights.
    d, nh, q_n, s_hand, s_obj = 32, 4, 17, 12, 4
    model = Transformer(
        d_model=d, nhead=nh, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=64,
    )
    src = jnp.ones((2, s_hand + s_obj, d))
    pos = jnp.zeros_like(src)
    query = jnp.ones((q_n, d))
    tgt_mask = get_mano_tgt_mask(q_n, 16)
    mem_mask = get_mano_memory_mask(q_n, s_hand, s_obj)
    params = model.init(
        jax.random.PRNGKey(0), src, pos, query, tgt_mask, mem_mask
    )["params"]
    hs, memory, enc_inter, attn = model.apply(
        {"params": params}, src, pos, query, tgt_mask, mem_mask
    )
    assert hs.shape == (2, 2, q_n, d)
    assert memory.shape == (2, s_hand + s_obj, d)
    assert enc_inter.shape == (2, 2, s_hand + s_obj, d)
    assert attn.shape == (2, 2, q_n, s_hand + s_obj)
    # memory mask: queries must place zero attention on object tokens
    np.testing.assert_allclose(np.asarray(attn[..., s_hand:]).max(), 0.0, atol=1e-7)


def test_vote_transformer_shapes():
    model = VoteTransformer(d_model=32, nhead=4, num_encoder_layers=2, dim_feedforward=64)
    src = jnp.ones((2, 16, 32))
    pos = jnp.zeros_like(src)
    params = model.init(jax.random.PRNGKey(0), src, pos)["params"]
    memory, inter = model.apply({"params": params}, src, pos)
    assert memory.shape == (2, 16, 32)
    assert inter.shape == (2, 2, 16, 32)


def test_mano_tgt_mask_structure():
    m = np.asarray(get_mano_tgt_mask(17, 16))
    # finger queries attend within their finger only
    assert not m[1, 1] and not m[1, 3] and m[1, 4] and m[1, 0]
    # global rot + shape attend only to themselves
    assert not m[0, 0] and m[0, 5]
    assert not m[16, 16] and m[16, 0]
