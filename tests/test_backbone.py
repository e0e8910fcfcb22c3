"""Backbone + decoder pyramid shape contracts (module.py / resnet.py parity)."""

import jax
import jax.numpy as jnp

from hoisdf_tpu.models.decoder import Decoder, DecoderBig
from hoisdf_tpu.models.resnet import ResNetBackbone


def _run_backbone(resnet_type, img_hw=64):
    model = ResNetBackbone(resnet_type=resnet_type)
    img = jnp.ones((1, img_hw, img_hw, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    out, skips = model.apply(variables, img)
    return out, skips


def test_resnet50_skip_shapes():
    out, skips = _run_backbone(50)
    assert out.shape == (1, 2, 2, 2048)
    assert skips["stride2"].shape == (1, 32, 32, 64)
    assert skips["stride4"].shape == (1, 16, 16, 256)
    assert skips["stride8"].shape == (1, 8, 8, 512)
    assert skips["stride16"].shape == (1, 4, 4, 1024)
    assert skips["stride32"].shape == (1, 2, 2, 2048)


def test_resnet18_skip_shapes():
    out, skips = _run_backbone(18)
    assert out.shape == (1, 2, 2, 512)
    assert skips["stride4"].shape == (1, 16, 16, 64)


def test_decoder_pyramid_dims():
    out, skips = _run_backbone(50)
    dec = Decoder()
    variables = dec.init(jax.random.PRNGKey(0), out, skips)
    pyr, heads = dec.apply(variables, out, skips)
    dims = {k: v.shape[-1] for k, v in pyr.items()}
    # main/config.py:106: 32+64+128+256+512 = 992
    assert dims == {
        "stride32": 512, "stride16": 256, "stride8": 128, "stride4": 64, "stride2": 32,
    }
    assert heads.shape == (1, 32, 32, 3)
    # seg channels pass a sigmoid; heatmap channel is raw
    assert float(heads[..., 1].min()) >= 0 and float(heads[..., 1].max()) <= 1
    assert float(heads[..., 2].min()) >= 0 and float(heads[..., 2].max()) <= 1


def test_decoder_big_pyramid_dims():
    out, skips = _run_backbone(50)
    dec = DecoderBig()
    variables = dec.init(jax.random.PRNGKey(0), out, skips)
    pyr, heads = dec.apply(variables, out, skips)
    dims = {k: v.shape[-1] for k, v in pyr.items()}
    # main/config.py:103: 128+256+512+1024+2048 = 3968
    assert dims == {
        "stride32": 2048, "stride16": 1024, "stride8": 512, "stride4": 256,
        "stride2": 128,
    }
    assert heads.shape == (1, 32, 32, 3)


def test_batchnorm_updates_in_train_mode():
    model = ResNetBackbone(resnet_type=18)
    img = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    _, new_state = model.apply(
        variables, img, train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["bn1"]["bn"]["mean"]
    after = new_state["batch_stats"]["bn1"]["bn"]["mean"]
    assert not jnp.allclose(before, after)
