"""u8 wire codec (ops/wire.py): lossless round-trips + the train/eval steps
produce bit-identical results under either wire format.

The contract: for any image whose f32 values came from a u8 source divided
by 255 (all built-in datasets) and any binary {0,1} mask, encoding to the
u8 wire and LUT/cast-decoding on device reproduces the exact f32 bits the
f32 wire would have shipped — so the whole downstream graph is unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hoisdf_tpu.config import get_config
from hoisdf_tpu.data.image_io import to_float_image
from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
from hoisdf_tpu.mano.layer import ManoBuffers
from hoisdf_tpu.mano.model import make_synthetic_mano
from hoisdf_tpu.models.hoisdf import build_model
from hoisdf_tpu.ops import wire
from hoisdf_tpu.train import create_train_state, make_eval_step, make_train_step

import pytest


def test_quantize_roundtrip_exact_every_u8_value():
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    f32 = to_float_image(u8)
    # encode(decode(u8)) == u8 for every representable byte
    np.testing.assert_array_equal(wire.quantize_image_u8(f32), u8)
    # device LUT decode == host normalize, bitwise
    dec = np.asarray(wire.decode_inputs({"img": jnp.asarray(u8)})["img"])
    np.testing.assert_array_equal(dec.view(np.uint32), f32.view(np.uint32))


def test_u8_input_passes_through_encode():
    u8 = np.random.RandomState(0).randint(0, 256, (4, 4, 3), np.uint8)
    assert wire.quantize_image_u8(u8) is u8


def test_decode_inputs_is_noop_for_f32_wire():
    inputs = {"img": jnp.ones((2, 4, 4, 3), jnp.float32), "k": jnp.zeros(3)}
    out = wire.decode_inputs(inputs)
    assert out["img"] is inputs["img"]


def test_encode_targets_binary_masks_and_nonbinary_fallback():
    binary = np.random.RandomState(1).randint(0, 2, (2, 8, 8)).astype(np.float32)
    nonbin = binary.copy()
    nonbin[0, 0, 0] = 0.5
    t = {"hand_seg": binary, "obj_seg": nonbin, "hand_sdf": binary}
    enc = wire.encode_targets(t)
    assert enc["hand_seg"].dtype == np.uint8
    assert enc["obj_seg"].dtype == np.float32  # never silently quantized
    assert enc["hand_sdf"].dtype == np.float32  # not a mask key
    dec = wire.decode_targets({k: jnp.asarray(v) for k, v in enc.items()})
    np.testing.assert_array_equal(np.asarray(dec["hand_seg"]), binary)
    assert dec["hand_seg"].dtype == jnp.float32


@pytest.fixture(scope="module")
def setup():
    cfg = get_config(
        "dexycb", resnet_type=18, hidden_dim=64, dim_feedforward=128,
        enc_layers=2, dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048, hier_levels_obj=None,
    )
    model = build_model(cfg)
    mano = ManoBuffers.from_model(make_synthetic_mano(0))
    batch = synthetic_batch(cfg, batch_size=2, train=True)
    inputs, targets = split_inputs_targets(batch)
    # Pin the synthetic f32 image to the u8 grid (real datasets' images are
    # u8-source by construction) so both wires carry the same exact values.
    inputs["img"] = to_float_image(wire.quantize_image_u8(inputs["img"]))
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in inputs.items()}, 100,
    )
    return cfg, model, mano, state, inputs, targets


def test_train_step_bit_identical_across_wire_formats(setup):
    cfg, model, mano, state, inputs, targets = setup
    step = make_train_step(cfg, model, mano)
    rng = jax.random.PRNGKey(7)

    def run(ins, tgs):
        _, losses = step(
            state,
            {k: jnp.asarray(v) for k, v in ins.items()},
            {k: jnp.asarray(v) for k, v in tgs.items()},
            rng, jnp.asarray(0.03), use_presampled=True,
        )
        return {k: float(v) for k, v in losses.items()}

    ref = run(inputs, targets)
    enc_in, enc_tg = wire.encode_batch(inputs, targets)
    assert enc_in["img"].dtype == np.uint8
    assert enc_tg["hand_seg"].dtype == np.uint8
    got = run(enc_in, enc_tg)
    assert ref.keys() == got.keys()
    for k in ref:
        assert got[k] == ref[k], (k, got[k], ref[k])


def test_mul_decode_bf16_identity_all_bytes():
    """The fast multiply decode (bf16-compute gate): for every byte,
    bf16(mul-decode) == bf16(LUT-decode).  In f32 they differ on 126/256
    values — pin that too, so the gate is provably load-bearing."""
    assert wire._mul_decode_bf16_safe()
    u8 = jnp.asarray(np.arange(256, dtype=np.uint8))
    lut = wire.decode_inputs({"img": u8})["img"]
    mul = wire.decode_inputs({"img": u8}, compute_dtype="bfloat16")["img"]
    np.testing.assert_array_equal(
        np.asarray(lut.astype(jnp.bfloat16)), np.asarray(mul.astype(jnp.bfloat16))
    )
    assert (np.asarray(lut) != np.asarray(mul)).sum() == 126


def test_eval_step_bit_identical_bf16_compute_mul_decode():
    """End-to-end under the PRODUCTION decode path: bf16 compute uses the
    multiply decode (no LUT gather), and eval outputs must still be
    bit-identical across wire formats."""
    cfg = get_config(
        "dexycb", resnet_type=18, hidden_dim=64, dim_feedforward=128,
        enc_layers=2, dec_layers=2, num_samp_hand=16, num_samp_obj=8,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048, hier_levels_obj=None,
        compute_dtype="bfloat16",
    )
    model = build_model(cfg)
    mano = ManoBuffers.from_model(make_synthetic_mano(0))
    batch = synthetic_batch(cfg, batch_size=2, train=True)
    inputs, _ = split_inputs_targets(batch)
    inputs["img"] = to_float_image(wire.quantize_image_u8(inputs["img"]))
    jin = {k: jnp.asarray(v) for k, v in inputs.items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), jin, 100)
    eval_step = make_eval_step(cfg, model, mano)
    ref = eval_step(state.params, state.batch_stats, jin)
    enc = wire.encode_inputs(inputs)
    got = eval_step(
        state.params, state.batch_stats,
        {k: jnp.asarray(v) for k, v in enc.items()},
    )
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(got[k]), err_msg=k
        )


def test_eval_step_bit_identical_across_wire_formats(setup):
    cfg, model, mano, state, inputs, targets = setup
    eval_step = make_eval_step(cfg, model, mano)
    jin = {k: jnp.asarray(v) for k, v in inputs.items()}
    ref = eval_step(state.params, state.batch_stats, jin)
    enc = wire.encode_inputs(inputs)
    got = eval_step(
        state.params, state.batch_stats,
        {k: jnp.asarray(v) for k, v in enc.items()},
    )
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(got[k]), err_msg=k
        )
