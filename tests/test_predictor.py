"""Serving Predictor: padding, outputs, latency stats."""

import numpy as np

from hoisdf_tpu.config import get_config
from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
from hoisdf_tpu.predictor import Predictor


def test_predictor_pads_and_trims():
    cfg = get_config(
        "dexycb", resnet_type=18, hidden_dim=64, dim_feedforward=128,
        enc_layers=2, dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048, compute_dtype="float32",
        sdf_infer_mode="coarse2fine", coarse_bins=4, coarse_keep_cells=16,
    )
    pred = Predictor(cfg, batch_size=4)
    pred.warmup()
    frames_np = synthetic_batch(cfg, 3, train=False)
    frames, _ = split_inputs_targets(frames_np)
    out = pred.predict(frames)
    assert out["mano_joints"].shape == (3, 21, 3)
    assert out["obj_rot"].shape[0] == 3
    assert np.isfinite(out["mano_joints"]).all()
    s = pred.latency_summary()
    assert s["n"] == 1 and s["p50_ms"] > 0
