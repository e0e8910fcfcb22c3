"""DexYCBDataset end-to-end on a synthetic on-disk fixture: annotation JSON,
packbit seg masks, SDF npy files, images — the full __getitem__ pipeline
(decode -> flip -> PCA->aa -> SDF draws -> aug/crop -> normalize -> dict)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from hoisdf_tpu.config import get_config
from hoisdf_tpu.data.dexycb import DexYCBDataset
from hoisdf_tpu.data.loader import DataLoader
from hoisdf_tpu.mano.model import make_synthetic_mano


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dexycb")
    ann_dir = root / "ann"
    img_dir = root / "img"
    sdf_dir = root / "sdf"
    for d in (ann_dir, img_dir, sdf_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)

    samples = {}
    for split in ("train", "test"):
        seg_dir = ann_dir / f"segs_{split}"
        os.makedirs(seg_dir, exist_ok=True)
        for i in range(3):
            key = f"{split}_sample_{i:04d}"
            img = Image.fromarray(
                rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
            )
            img.save(img_dir / f"{key}.png")
            # joints roughly centred, in front of the camera
            j3d = rng.randn(21, 3) * 0.03 + np.array([0, 0, 0.6])
            K = dict(fx=600.0, fy=600.0, ppx=320.0, ppy=240.0)
            j2d = j3d @ np.diag([600, 600, 1.0])
            j2d = (j2d[:, :2] / j3d[:, 2:3]) + np.array([320, 240])
            pose_y = np.concatenate(
                [np.eye(3), np.array([[0.02], [0.0], [0.62]])], axis=1
            )
            samples[key] = {
                "color_file": f"{key}.png",
                "intrinsics": K,
                "pose_m": (rng.randn(51) * 0.1).tolist(),
                "mano_betas": (rng.randn(10) * 0.1).tolist(),
                "joint_3d": j3d.tolist(),
                "joint_2d": j2d.tolist(),
                "mano_side": "left" if i == 2 else "right",
                "pose_y": [pose_y.tolist()],
                "ycb_ids": [5],
                "ycb_grasp_ind": 0,
            }
            # packbit seg masks
            hand = (rng.rand(480, 640) > 0.9).astype(np.uint8)
            obj = (rng.rand(480, 640) > 0.9).astype(np.uint8)
            np.savez(
                seg_dir / f"{key}.npz",
                hand=np.packbits(hand), obj=np.packbits(obj),
            )
            # SDF samples: 300 hand rows then 200 obj rows
            n_h, n_o = 300, 200
            pts = rng.randn(n_h + n_o, 3) * 0.05 + np.array([0, 0, 0.6])
            sdf_h = rng.randn(n_h + n_o) * 0.02
            sdf_o = rng.randn(n_h + n_o) * 0.02
            lab = rng.randint(0, 6, n_h + n_o)
            data = np.concatenate(
                [pts, sdf_h[:, None], sdf_o[:, None], lab[:, None]], axis=1
            ).astype(np.float32)
            np.save(sdf_dir / f"{key}.npy", data)
            np.save(sdf_dir / f"{key}_index.npy", np.array([n_h, n_o]))
        with open(ann_dir / f"dexycb_{split}_annotations.json", "w") as f:
            json.dump({k: v for k, v in samples.items() if k.startswith(split)}, f)

    # object bbox template (.xyz point cloud for class 5)
    obj_dir = root / "models" / "006_mustard_bottle"
    os.makedirs(obj_dir, exist_ok=True)
    np.savetxt(obj_dir / "points.xyz", rng.rand(50, 3) * 0.1)
    return str(ann_dir), str(img_dir), str(sdf_dir), str(root / "models")


def _make_cfg(fixture_dirs, **over):
    ann, img, sdf, models = fixture_dirs
    return get_config(
        "dexycb",
        annotation_dir=ann, image_fast_path=img, fast_data_dir=sdf,
        object_models_dir=models,
        num_samp_hand=64, num_samp_obj=32, points_filter_dist=1.0,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32),
        small_dexycb=False,
        **over,
    )


def test_train_getitem_contract(fixture_dirs):
    cfg = _make_cfg(fixture_dirs)
    ds = DexYCBDataset(cfg, "train", make_synthetic_mano(0))
    assert len(ds) == 3
    s = ds.__getitem__(0, epoch=0)
    assert s["img"].shape == (64, 64, 3) and s["img"].dtype == np.float32
    assert 0.0 <= s["img"].min() and s["img"].max() <= 1.0
    assert s["hand_sdf_points"].shape == (64, 3)
    assert s["hand_pre_points"].shape == (64, 3)
    assert s["target_hand_sdf"].shape == (64,)
    assert s["target_mano_param"].shape == (58,)
    assert s["target_hand_seg"].shape == (32, 32)
    assert s["target_joint_cam_no_trans"].shape == (21, 3)
    # root-relative: joint 0 at origin
    np.testing.assert_allclose(s["target_joint_cam_no_trans"][0], 0, atol=1e-4)
    assert s["cam_intr"].shape == (3, 3)


def test_left_hand_flip_sample(fixture_dirs):
    cfg = _make_cfg(fixture_dirs)
    ds = DexYCBDataset(cfg, "train", make_synthetic_mano(0))
    s = ds.__getitem__(2, epoch=0)  # mano_side == left
    assert np.isfinite(s["target_mano_param"]).all()


def test_eval_getitem_deterministic(fixture_dirs):
    cfg = _make_cfg(fixture_dirs)
    ds = DexYCBDataset(cfg, "test", make_synthetic_mano(0))
    a = ds.__getitem__(0, epoch=0)
    b = ds.__getitem__(0, epoch=5)  # eval crop has no randomness
    np.testing.assert_array_equal(a["img"], b["img"])
    np.testing.assert_array_equal(a["bbox_hand"], b["bbox_hand"])
    assert "hand_pre_points" not in a


def test_train_aug_differs_across_epochs(fixture_dirs):
    cfg = _make_cfg(fixture_dirs)
    ds = DexYCBDataset(cfg, "train", make_synthetic_mano(0))
    a = ds.__getitem__(0, epoch=0)
    b = ds.__getitem__(0, epoch=1)
    assert not np.array_equal(a["img"], b["img"])


def test_loader_over_real_dataset(fixture_dirs):
    cfg = _make_cfg(fixture_dirs)
    ds = DexYCBDataset(cfg, "train", make_synthetic_mano(0))
    dl = DataLoader(ds, batch_size=3, shuffle=True, num_workers=2)
    batch = next(iter(dl))
    assert batch["img"].shape == (3, 64, 64, 3)
    assert batch["target_mano_param"].shape == (3, 58)


def test_train_loop_real_path_end_to_end(fixture_dirs, tmp_path, monkeypatch):
    """Drives hoisdf_tpu.train_loop.main() on the on-disk fixture via the
    REAL-data branch: train step, snapshot, eval-during-training, and the
    debug-image grids the reference dumps to TensorBoard during real
    training (main/train.py:302-440)."""
    import sys

    from hoisdf_tpu import train_loop

    ann, img, sdf, models = fixture_dirs
    argv = [
        "train_loop", "--setting", "dexycb", "--run_dir_name", "realrun",
        "--end_epoch", "1", "--cpu",
        "--cfg", f"annotation_dir={ann}",
        "--cfg", f"image_fast_path={img}",
        "--cfg", f"fast_data_dir={sdf}",
        "--cfg", f"object_models_dir={models}",
        "--cfg", f"output_dir={tmp_path}",
        "--cfg", "num_samp_hand=16", "--cfg", "num_samp_obj=8",
        "--cfg", 'input_img_shape=[64, 64]',
        "--cfg", 'output_hm_shape=[32, 32, 32]',
        "--cfg", "resnet_type=18", "--cfg", "hidden_dim=64",
        "--cfg", "dim_feedforward=128", "--cfg", "enc_layers=2",
        "--cfg", "dec_layers=2", "--cfg", "bins_n=8",
        "--cfg", "sdf_infer_chunk=512", "--cfg", "train_batch_size=3",
        "--cfg", "eval_batch_size=3", "--cfg", "num_data_workers=2",
        "--cfg", "points_filter_dist=1.0", "--cfg", "small_dexycb=false",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train_loop.main()

    run_dir = os.path.join(str(tmp_path), "realrun")
    pngs = [
        f for f in os.listdir(os.path.join(run_dir, "debug_images"))
        if f.endswith(".png")
    ]
    assert pngs, "real-path eval must dump debug-image grids"
    assert os.path.exists(os.path.join(run_dir, "tensorboard", "metrics.jsonl"))
    snaps = os.listdir(os.path.join(run_dir, "model_dump"))
    assert snaps
