"""StableHLO serving export: serialize -> deserialize -> call parity with the
in-process Predictor (tools/export_stablehlo.py)."""

import json
import os

import numpy as np

import jax

from hoisdf_tpu.config import get_config
from hoisdf_tpu.predictor import INPUT_KEYS, Predictor
from hoisdf_tpu.tools.export_stablehlo import (
    export_serving_module,
    flatten_params,
    unflatten_params,
)


def tiny_cfg():
    return get_config(
        "dexycb", resnet_type=18, hidden_dim=64, dim_feedforward=128,
        enc_layers=2, dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048, sdf_infer_mode="hier",
        hier_levels=((4, 16), (2, 48)), hier_levels_obj=None,
    )


def test_flatten_roundtrip():
    tree = {"a": {"b": np.ones((2,)), "c": np.zeros((3,))}, "d": np.eye(2)}
    flat = dict(flatten_params(tree))
    back = unflatten_params(flat)
    assert set(flat) == {"a.b", "a.c", "d"}
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["d"], tree["d"])


def test_export_deserialize_call_matches_predictor(tmp_path):
    from jax import export as jexport

    pred = Predictor(tiny_cfg(), batch_size=2)
    out_dir = str(tmp_path / "export")
    blob_path = export_serving_module(pred, out_dir)
    assert os.path.exists(blob_path)

    sig = json.load(open(os.path.join(out_dir, "signature.json")))
    flat = np.load(os.path.join(out_dir, "params.npz"))
    params = [flat[k] for k in sig["param_order"]]
    inputs = [np.asarray(pred._template[k]) for k in sig["input_order"]]

    exp = jexport.deserialize(open(blob_path, "rb").read())
    outs = exp.call(*params, *inputs)
    # Exported.call returns the pytree of the traced fn (a dict here).
    assert set(outs) == set(sig["outputs"])
    assert np.isfinite(np.asarray(outs["mano_joints"])).all()
    assert outs["mano_joints"].shape == (2, 21, 3)

    # parity vs the in-process forward on the same template inputs
    direct = pred.predict({k: np.asarray(v) for k, v in pred._template.items()})
    np.testing.assert_allclose(
        np.asarray(outs["mano_joints"]), direct["mano_joints"],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(outs["obj_trans"]), direct["obj_trans"].mean(axis=1),
        rtol=1e-4, atol=1e-5,
    )


def test_polymorphic_export_serves_multiple_batch_sizes(tmp_path):
    from jax import export as jexport

    pred = Predictor(tiny_cfg(), batch_size=2)
    out_dir = str(tmp_path / "poly")
    blob_path = export_serving_module(pred, out_dir, polymorphic_batch=True)

    sig = json.load(open(os.path.join(out_dir, "signature.json")))
    assert sig["batch_size"] == "b"
    flat = np.load(os.path.join(out_dir, "params.npz"))
    params = [flat[k] for k in sig["param_order"]]
    tmpl = [np.asarray(pred._template[k]) for k in sig["input_order"]]

    exp = jexport.deserialize(open(blob_path, "rb").read())
    for n in (2, 4):
        inputs = [np.repeat(v, n // 2, axis=0) if v.shape[0] != n else v
                  for v in tmpl]
        outs = exp.call(*params, *inputs)
        assert outs["mano_joints"].shape == (n, 21, 3)
        assert np.isfinite(np.asarray(outs["mano_joints"])).all()
