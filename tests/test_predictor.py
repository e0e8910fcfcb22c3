"""Serving Predictor: padding, outputs, latency stats, dynamic batching."""

import threading

import numpy as np
import pytest

from hoisdf_tpu.config import get_config
from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
from hoisdf_tpu.predictor import BatchingServer, Predictor


@pytest.fixture(scope="module")
def tiny_cfg():
    return get_config(
        "dexycb", resnet_type=18, hidden_dim=64, dim_feedforward=128,
        enc_layers=2, dec_layers=2, num_samp_hand=32, num_samp_obj=16,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
        sdf_infer_chunk=2048, compute_dtype="float32",
        sdf_infer_mode="coarse2fine", coarse_bins=4, coarse_keep_cells=16,
    )


@pytest.fixture(scope="module")
def pred(tiny_cfg):
    p = Predictor(tiny_cfg, batch_size=4)
    p.warmup()
    return p


def test_predictor_pads_and_trims(tiny_cfg, pred):
    frames_np = synthetic_batch(tiny_cfg, 3, train=False)
    frames, _ = split_inputs_targets(frames_np)
    out = pred.predict(frames)
    assert out["mano_joints"].shape == (3, 21, 3)
    assert out["obj_rot"].shape[0] == 3
    assert np.isfinite(out["mano_joints"]).all()
    s = pred.latency_summary()
    assert s["n"] >= 1 and s["p50_ms"] > 0


def test_batching_server_matches_direct_predict(tiny_cfg, pred):
    frames_np = synthetic_batch(tiny_cfg, 3, seed=7, train=False)
    frames, _ = split_inputs_targets(frames_np)
    direct = pred.predict(frames)

    with BatchingServer(pred, max_wait_ms=200.0) as srv:
        # submit from threads so the dispatcher coalesces all 3 into one step
        futs = [None] * 3

        def send(i):
            futs[i] = srv.submit({k: v[i] for k, v in frames.items()})

        threads = [threading.Thread(target=send, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        outs = [f.result(timeout=120) for f in futs]
    assert srv.frames_served == 3
    # coalescing must not change results: scattered rows == direct batch rows
    for i, out in enumerate(outs):
        for k in ("mano_joints", "obj_rot", "obj_trans"):
            np.testing.assert_allclose(out[k], direct[k][i], rtol=0, atol=1e-5)


def test_batching_server_cancelled_future_does_not_kill_worker(tiny_cfg, pred):
    """A caller .cancel()ing a queued Future must not crash the dispatcher
    (set_result on a cancelled Future raises InvalidStateError)."""
    frames_np = synthetic_batch(tiny_cfg, 2, seed=13, train=False)
    frames, _ = split_inputs_targets(frames_np)
    with BatchingServer(pred, max_wait_ms=300.0) as srv:
        doomed = srv.submit({k: v[0] for k, v in frames.items()})
        doomed.cancel()  # races the coalescing window; usually wins
        # the server must still serve subsequent traffic either way
        out = srv.submit({k: v[1] for k, v in frames.items()}).result(timeout=120)
        assert out["mano_joints"].shape == (21, 3)
        if doomed.cancelled():
            assert not doomed.running()
        else:  # dispatcher claimed it before cancel(); it must complete
            assert doomed.result(timeout=120)["mano_joints"].shape == (21, 3)


def test_batching_server_close_serves_accepted_requests(tiny_cfg, pred):
    """Requests accepted before close() are served, never failed: the submit
    lock orders them ahead of the shutdown sentinel."""
    frames_np = synthetic_batch(tiny_cfg, 4, seed=17, train=False)
    frames, _ = split_inputs_targets(frames_np)
    srv = BatchingServer(pred, max_wait_ms=50.0)
    futs = [srv.submit({k: v[i] for k, v in frames.items()}) for i in range(4)]
    srv.close()  # drains: every accepted future resolves with a result
    for f in futs:
        assert f.result(timeout=120)["mano_joints"].shape == (21, 3)


def test_batching_server_poisson_saturation(tiny_cfg, pred):
    """Open-loop overload: offered rate far above capacity must build a
    backlog that fully drains (every request completes), with the server
    coalescing toward full batches — the saturation regression for the
    serving load table (docs/PERFORMANCE.md 'Serving')."""
    from hoisdf_tpu.predictor import BatchingServer, run_poisson_load

    frames_np = synthetic_batch(tiny_cfg, 4, seed=23, train=False)
    frames, _ = split_inputs_targets(frames_np)
    pool = [{k: v[i] for k, v in frames.items()} for i in range(4)]
    with BatchingServer(pred, max_wait_ms=5.0) as srv:
        rep = run_poisson_load(srv, pool, rate_hz=30.0, duration_s=2.0, seed=3)
        fill = rep["completed"] / max(srv.batches_dispatched, 1)
    assert rep["submitted"] > 20  # the generator really ran open-loop
    assert rep["completed"] == rep["submitted"]  # backlog fully drained
    assert rep["goodput_hz"] > 0
    # saturation must coalesce multi-frame batches (capacity on this box is
    # far below 30 req/s, so the queue is never empty mid-run)
    assert fill > 1.5, fill
    lats = rep["latencies_s"]
    assert lats == sorted(lats) and lats[-1] < 600


def test_batching_server_single_request_and_close(tiny_cfg, pred):
    frames_np = synthetic_batch(tiny_cfg, 1, seed=11, train=False)
    frames, _ = split_inputs_targets(frames_np)
    srv = BatchingServer(pred, max_wait_ms=1.0)
    out = srv.submit({k: v[0] for k, v in frames.items()}).result(timeout=120)
    assert out["mano_joints"].shape == (21, 3)
    srv.close()
    srv.close()  # idempotent
    with pytest.raises(RuntimeError):
        srv.submit({k: v[0] for k, v in frames.items()})


def test_uint8_transfer_dtype_bit_exact_for_u8_sources(tiny_cfg, pred):
    """The u8 wire format (normalize-on-device) must match the f32 path
    bit-for-bit when the source frames are u8: astype(f32)/255 on device
    is the same IEEE f32 division image_io.to_float_image does on host."""
    from hoisdf_tpu.data.image_io import to_float_image

    rng = np.random.RandomState(29)
    frames_np = synthetic_batch(tiny_cfg, 3, seed=29, train=False)
    frames, _ = split_inputs_targets(frames_np)
    img_u8 = rng.randint(0, 256, frames["img"].shape, dtype=np.uint8)

    pred_u8 = Predictor(tiny_cfg, batch_size=4, transfer_dtype="uint8")
    out_u8 = pred_u8.predict(dict(frames, img=img_u8))
    out_f32 = pred.predict(dict(frames, img=to_float_image(img_u8)))
    for k in out_f32:
        np.testing.assert_array_equal(out_u8[k], out_f32[k], err_msg=k)

    # an f32 [0,1] crop that CAME from u8 re-quantizes losslessly
    out_req = pred_u8.predict(dict(frames, img=to_float_image(img_u8)))
    np.testing.assert_array_equal(out_req["mano_joints"],
                                  out_u8["mano_joints"])

    # the f32 wire format normalizes a raw u8 frame host-side (same result)
    out_host = pred.predict(dict(frames, img=img_u8))
    np.testing.assert_array_equal(out_host["mano_joints"],
                                  out_u8["mano_joints"])
