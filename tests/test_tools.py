"""Offline tool tests: SDF preprocessing round-trip on synthetic AlignSDF npz."""

import os

import numpy as np

from hoisdf_tpu.tools.preprocess_sdf import process_frame, unpack_sdf_samples


def _make_alignsdf_fixture(root, key="seq1_0001"):
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "sdf_hand"), exist_ok=True)
    os.makedirs(os.path.join(root, "sdf_obj"), exist_ok=True)
    os.makedirs(os.path.join(root, "norm"), exist_ok=True)

    def side(n):
        pos = rng.randn(n, 4).astype(np.float32)
        pos[:, 3] = np.abs(pos[:, 3]) * 0.1
        pos[0, 3] = np.nan  # exercise the NaN filter
        neg = rng.randn(n, 4).astype(np.float32)
        neg[:, 3] = -np.abs(neg[:, 3]) * 0.1
        other = rng.randn(2 * n - 1, 1).astype(np.float32) * 0.1
        lab = rng.randint(0, 6, (2 * n, 1)).astype(np.float32)
        return pos, neg, other, lab

    hp, hn, _, hl = side(20)
    op, on, _, ol = side(15)
    np.savez(
        os.path.join(root, "sdf_hand", key + ".npz"),
        pos=hp, neg=hn,
        pos_other=rng.randn(19, 1).astype(np.float32) * 0.1,
        neg_other=rng.randn(20, 1).astype(np.float32) * 0.1,
        lab_pos=hl[:19], lab_neg=hl[:20],
        lab_pos_other=hl[:19], lab_neg_other=hl[:20],
    )
    np.savez(
        os.path.join(root, "sdf_obj", key + ".npz"),
        pos=op, neg=on,
        pos_other=rng.randn(14, 1).astype(np.float32) * 0.1,
        neg_other=rng.randn(15, 1).astype(np.float32) * 0.1,
        lab_pos=ol[:14], lab_neg=ol[:15],
        lab_pos_other=ol[:14], lab_neg_other=ol[:15],
    )
    np.savez(
        os.path.join(root, "norm", key + ".npz"),
        scale=np.float32(2.0), offset=np.asarray([0.1, 0.2, -0.5], np.float32),
    )
    return key


def test_unpack_filters_nans_and_layout(tmp_path):
    key = _make_alignsdf_fixture(str(tmp_path))
    samples, labels = unpack_sdf_samples(str(tmp_path), key, hand=True)
    assert samples.shape[1] == 5
    assert not np.isnan(samples).any()
    assert labels.shape[0] == samples.shape[0]
    obj_samples, obj_labels = unpack_sdf_samples(str(tmp_path), key, hand=False)
    # object side: sdf_obj ends up in column 4, cross-sdf (hand) in column 3
    assert (obj_labels == -1).all()


def test_process_frame_camera_space(tmp_path):
    key = _make_alignsdf_fixture(str(tmp_path))
    out = str(tmp_path / "out")
    h, o = process_frame(str(tmp_path), key, out, filter_dist=False)
    # reference layout: {out}/sdf_processed/{key}.npy (pre_process_sdf.py:141)
    data = np.load(os.path.join(out, "sdf_processed", key + ".npy"))
    assert data.shape == (h + o, 6)
    # camera-space transform: xyz/scale - offset applied
    raw, _ = unpack_sdf_samples(str(tmp_path), key, hand=True)
    np.testing.assert_allclose(
        data[: raw.shape[0], :3],
        raw[:, :3] / 2.0 - np.asarray([0.1, 0.2, -0.5]),
        rtol=1e-5,
    )
    # sdf columns divided by scale
    np.testing.assert_allclose(data[: raw.shape[0], 3], raw[:, 3] / 2.0, rtol=1e-5)
