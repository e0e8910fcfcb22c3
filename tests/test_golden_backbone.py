"""Conv-stack numeric parity vs the reference torch forward.

SURVEY §7 build-step 4 exit criterion: feature-pyramid parity <=1e-3 against
``common/nets/resnet.py:70-87`` and ``common/nets/module.py:51-218``.  The
fixture (tests/golden/backbone_decoder.npz) stores the state-dict *spec* plus
reference inputs/outputs; weights are regenerated deterministically on both
sides (hoisdf_tpu/tools/synth_weights.py), and flow through the SAME
``convert_torch_ckpt`` mapping used for real checkpoints — so this also pins
the converter's layout rules (BN eval stats, ConvT k4s2 padding, skip-concat
order) end to end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hoisdf_tpu.models.decoder import Decoder, DecoderBig
from hoisdf_tpu.models.resnet import ResNetBackbone
from hoisdf_tpu.tools.convert_torch_ckpt import (
    _map_decoder,
    convert_torchvision_resnet,
)
from hoisdf_tpu.tools.synth_weights import synth_state_dict

TOL = dict(atol=1e-3, rtol=1e-3)


def _nhwc(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(a, (0, 2, 3, 1)))


def _synth_sd(g, spec_key: str, prefix: str):
    sd = synth_state_dict(str(g[spec_key]))
    return {k[len(prefix):]: v for k, v in sd.items()}


def _convert_decoder_sd(sd, big: bool):
    params, stats = {}, {}
    for k, v in sd.items():
        assert _map_decoder(params, stats, k, v, big), f"unmapped key {k}"
    return params["decoder_net"], stats["decoder_net"]


@pytest.fixture(scope="module")
def fixture(golden):
    return golden("backbone_decoder")


def test_backbone_pyramid_golden(fixture):
    g = fixture
    sd = _synth_sd(g, "spec_backbone", "backbone.")
    params, stats = convert_torchvision_resnet(sd)
    model = ResNetBackbone(resnet_type=50)
    feat, skips = model.apply(
        {"params": params["backbone"], "batch_stats": stats["backbone"]},
        jnp.asarray(_nhwc(g["img"])),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(feat), _nhwc(g["feat"]), **TOL)
    for s in (2, 4, 8, 16, 32):
        np.testing.assert_allclose(
            np.asarray(skips[f"stride{s}"]), _nhwc(g[f"skip_stride{s}"]),
            err_msg=f"stride{s}", **TOL,
        )


@pytest.mark.parametrize("variant", ["small", "big"])
def test_decoder_pyramid_golden(fixture, variant):
    g = fixture
    big = variant == "big"
    sd = _synth_sd(
        g, "spec_decoder_big" if big else "spec_decoder",
        "decoder_big." if big else "decoder.",
    )
    params, stats = _convert_decoder_sd(sd, big)
    model = DecoderBig() if big else Decoder()
    feat = jnp.asarray(_nhwc(g["feat"]))
    skips = {
        f"stride{s}": jnp.asarray(_nhwc(g[f"skip_stride{s}"]))
        for s in (2, 4, 8, 16, 32)
    }
    pyr, heads = model.apply(
        {"params": params, "batch_stats": stats}, feat, skips, train=False
    )
    pfx = "big" if big else "dec"
    for s in (2, 4, 8, 16, 32):
        np.testing.assert_allclose(
            np.asarray(pyr[f"stride{s}"]), _nhwc(g[f"{pfx}_stride{s}"]),
            err_msg=f"{variant} stride{s}", **TOL,
        )
    np.testing.assert_allclose(
        np.asarray(heads), _nhwc(g[f"{pfx}_heads"]),
        err_msg=f"{variant} heads", **TOL,
    )
