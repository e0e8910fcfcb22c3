"""HO3DDataset end-to-end on a synthetic on-disk fixture: train (full labels,
OpenGL->OpenCV conversion, seg channels, SDF draws, shared aug) and eval
(bbox+K+root only)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from hoisdf_tpu.config import get_config
from hoisdf_tpu.data.ho3d import HO3DDataset, convert_pose_to_opencv, COORD_CHANGE_MAT
from hoisdf_tpu.data import transforms as T
from hoisdf_tpu.mano.model import make_synthetic_mano


@pytest.fixture(scope="module")
def ho3d_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ho3d")
    rng = np.random.RandomState(0)
    sdf_dir = root / "sdf"
    os.makedirs(sdf_dir)
    for split, frames in (("train", 2), ("evaluation", 2)):
        seq = "ABF10"
        for d in ("rgb", "meta", "seg"):
            os.makedirs(root / split / seq / d, exist_ok=True)
        keys = []
        for i in range(frames):
            frame = f"{i:04d}"
            keys.append(f"{seq}/{frame}")
            Image.fromarray(
                rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
            ).save(root / split / seq / "rgb" / f"{frame}.jpg")
            # seg composite: hand in R channel, object in B channel
            seg = np.zeros((480, 640, 3), np.uint8)
            seg[100:200, 200:300, 0] = 200
            seg[150:250, 250:350, 2] = 200
            Image.fromarray(seg).save(root / split / seq / "seg" / f"{frame}.jpg")

            # OpenGL-convention labels (y/z flipped vs OpenCV)
            j3d_gl = rng.randn(21, 3) * 0.03 + np.array([0, 0, -0.6])
            corners_gl = rng.randn(8, 3) * 0.05 + np.array([0.02, 0, -0.62])
            meta = {
                "camMat": [[600.0, 0, 320], [0, 600, 240], [0, 0, 1]],
                "handJoints3D": j3d_gl.tolist(),
                "handPose": (rng.randn(48) * 0.1).tolist(),
                "handBeta": (rng.randn(10) * 0.1).tolist(),
                "objRot": (rng.randn(3) * 0.3).tolist(),
                "objTrans": [0.02, 0.0, -0.62],
                "objCorners3D": corners_gl.tolist(),
                "objCorners3DRest": (rng.randn(8, 3) * 0.05).tolist(),
                "objName": "006_mustard_bottle",
                "handBoundingBox": [250.0, 180.0, 400.0, 330.0],
            }
            with open(root / split / seq / "meta" / f"{frame}.json", "w") as f:
                json.dump(meta, f)
            # SDF samples (camera space OpenCV)
            n_h, n_o = 200, 150
            pts = rng.randn(n_h + n_o, 3) * 0.05 + np.array([0, 0, 0.6])
            data = np.concatenate(
                [pts, rng.randn(n_h + n_o, 2) * 0.02,
                 rng.randint(0, 6, (n_h + n_o, 1))], axis=1,
            ).astype(np.float32)
            np.save(sdf_dir / f"{seq}_{frame}.npy", data)
            np.save(sdf_dir / f"{seq}_{frame}_index.npy", np.array([n_h, n_o]))
        with open(root / f"{split}.txt", "w") as f:
            f.write("\n".join(keys) + "\n")
    return str(root), str(sdf_dir)


def _cfg(ho3d_root, setting="ho3d", **over):
    root, sdf = ho3d_root
    return get_config(
        setting, data_dir=root, fast_data_dir=sdf,
        num_samp_hand=48, num_samp_obj=24, points_filter_dist=1.0,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32),
        use_big_decoder=False, add_render=False,
        **over,
    )


def test_coord_change_roundtrip():
    rng = np.random.RandomState(1)
    rot = rng.randn(3)
    trans = rng.randn(3)
    r2, t2 = convert_pose_to_opencv(rot.astype(np.float32), trans.astype(np.float32))
    # applying the coordinate change twice returns the original rotation
    r3, t3 = convert_pose_to_opencv(r2, t2)
    np.testing.assert_allclose(
        T.rodrigues_np(r3.astype(np.float64)),
        T.rodrigues_np(rot), atol=1e-5,
    )
    np.testing.assert_allclose(t3, trans, atol=1e-6)


def test_ho3d_train_getitem(ho3d_root):
    cfg = _cfg(ho3d_root)
    ds = HO3DDataset(cfg, "train", make_synthetic_mano(0))
    assert len(ds) == 2
    s = ds.__getitem__(0, epoch=0)
    assert s["img"].shape == (64, 64, 3)
    assert s["hand_sdf_points"].shape == (48, 3)
    assert s["target_mano_param"].shape == (58,)
    assert s["target_hand_seg"].shape == (32, 32)
    # converted joints must sit in front of the OpenCV camera (z > 0)
    # (fixture places them at z=-0.6 in OpenGL convention)
    assert np.isfinite(s["target_joint_cam_no_trans"]).all()
    np.testing.assert_allclose(s["target_joint_cam_no_trans"][0], 0, atol=1e-4)


def test_ho3d_eval_getitem(ho3d_root):
    cfg = _cfg(ho3d_root)
    ds = HO3DDataset(cfg, "evaluation", make_synthetic_mano(0))
    s = ds.__getitem__(0, epoch=0)
    assert s["img"].shape == (64, 64, 3)
    assert s["bbox_hand"].shape == (4,)
    assert "target_mano_param" not in s  # eval split has no labels
    # object center uses the dataset-mean depth (main/config.py:73)
    assert abs(s["obj_center_cam"][2] - cfg.obj_depth_mean_value) < 1e-5
