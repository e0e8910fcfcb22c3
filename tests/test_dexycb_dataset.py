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
    """Mirrors the reference's real DexYCB asset layout
    (data/dexycb.py:122-217): dex_ycb_s0_{split}_data.json annotation dumps,
    label npz files under the DexYCB root, one global sdf_index.npy per SDF
    split dir, models/{name}/points.xyz clouds."""
    base = tmp_path_factory.mktemp("dexycb")
    root = base / "dexycb_root"  # the reference's cfg.dexycb_data_dir
    ann_dir = base / "ann"
    img_dir = base / "img"
    sdf_root = base / "sdf"
    for d in (root / "labels", ann_dir, img_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)

    for split in ("train", "test"):
        sdf_dir = sdf_root / f"full_{split}" / "sdf_processed"
        os.makedirs(sdf_dir, exist_ok=True)
        samples = {}
        names, rows = [], {}
        for i in range(3):
            key = f"idx{i}"  # sorted numerically by int(key[3:])
            color_file = f"{split}_{key}.png"
            Image.fromarray(
                rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
            ).save(img_dir / color_file)
            # joints roughly centred, in front of the camera
            j3d = rng.randn(21, 3) * 0.03 + np.array([0, 0, 0.6])
            K = dict(fx=600.0, fy=600.0, ppx=320.0, ppy=240.0)
            j2d = j3d @ np.diag([600, 600, 1.0])
            j2d = (j2d[:, :2] / j3d[:, 2:3]) + np.array([320, 240])
            pose_y = np.concatenate(
                [np.eye(3), np.array([[0.02], [0.0], [0.62]])], axis=1
            )
            label_file = f"labels/{split}_{key}_label.npz"
            samples[key] = {
                "color_file": color_file,
                "label_file": label_file,
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
            # label npz: hand pixels 255, object pixels its ycb id
            seg = np.zeros((480, 640), np.uint8)
            seg[rng.rand(480, 640) > 0.95] = 255
            seg[rng.rand(480, 640) > 0.95] = 5
            np.savez(root / label_file, seg=seg)
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
            names.append(key)
            rows[key] = (n_h, n_o)
        # ONE global index aligned with the sorted listing (dexycb.py:149-160)
        np.save(
            sdf_root / f"full_{split}" / "sdf_index.npy",
            np.asarray([rows[n] for n in sorted(names)]),
        )
        with open(ann_dir / f"dex_ycb_s0_{split}_data.json", "w") as f:
            json.dump(samples, f)

    # object bbox template (.xyz point cloud for class 5, {root}/models)
    obj_dir = root / "models" / "006_mustard_bottle"
    os.makedirs(obj_dir, exist_ok=True)
    np.savetxt(obj_dir / "points.xyz", rng.rand(50, 3) * 0.1)
    return str(ann_dir), str(img_dir), str(sdf_root), str(root)


def _make_cfg(fixture_dirs, **over):
    ann, img, sdf, root = fixture_dirs
    kw = dict(
        annotation_dir=ann, image_fast_path=img, fast_data_dir=sdf,
        data_dir=root,
        num_samp_hand=64, num_samp_obj=32, points_filter_dist=1.0,
        input_img_shape=(64, 64), output_hm_shape=(32, 32, 32),
        small_dexycb=False,
    )
    kw.update(over)
    return get_config("dexycb", **kw)


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


def test_left_hand_uses_left_pca_basis(fixture_dirs):
    """A flipped sample must convert its PCA pose with the LEFT-hand basis
    (data/dexycb.py:99-110,449-459), then mirror the axis-angles."""
    mano_r = make_synthetic_mano(0)
    mano_l = make_synthetic_mano(7, side="left")
    cfg = _make_cfg(fixture_dirs)
    ds = DexYCBDataset(cfg, "train", mano_r, mano_left=mano_l)
    assert ds.has_left_basis
    s = ds.__getitem__(2, epoch=0)  # mano_side == left

    info = ds.sample_dict[ds.sample_list[2]]
    pose_pca = np.asarray(info["pose_m"], np.float32).reshape(-1)
    # articulation slice passes through the aug untouched (only the global
    # orient is rotated), so it must equal the left-basis conversion + mean
    # with the y/z mirror applied
    art = (pose_pca[3:48] @ mano_l.hands_components).reshape(15, 3)
    art[:, 1:] *= -1
    expect = art.reshape(-1) + mano_r.hands_mean
    np.testing.assert_allclose(s["target_mano_param"][3:48], expect, atol=1e-5)

    # with the right-hand fallback the articulation would differ
    ds_r = DexYCBDataset(cfg, "train", mano_r)
    s_r = ds_r.__getitem__(2, epoch=0)
    assert not np.allclose(s_r["target_mano_param"][3:48], expect, atol=1e-5)


def test_small_dexycb_cut_layout(fixture_dirs, tmp_path):
    """small_dexycb pairs the _cut jsons with the {train,test} SDF dirs and
    mangles color_file stems into SDF dump names (data/dexycb.py:122-148,
    195-202)."""
    ann, img, sdf, root = fixture_dirs
    rng = np.random.RandomState(1)
    # real-format color_file whose mangled stem names the SDF dump
    color_file = "20200709-subject-01/20200709_141754/932122060861/color_000072.jpg"
    mangled = color_file.split("-")[-1].split(".")[0].replace("/", "_")
    mangled = mangled[:-12] + mangled[-2:]
    assert mangled == "01_20200709_141754_932122060861_72"

    ann2 = tmp_path / "ann"
    img2 = tmp_path / "img"
    sdf2 = tmp_path / "sdf" / "test" / "sdf_processed"
    os.makedirs(ann2), os.makedirs(sdf2)
    os.makedirs(img2 / os.path.dirname(color_file))
    Image.fromarray(
        rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
    ).save(img2 / color_file)
    with open(ann2 / "dex_ycb_s0_test_data_cut.json", "w") as f:
        base = json.load(open(os.path.join(ann, "dex_ycb_s0_test_data.json")))
        row = dict(base["idx0"], color_file=color_file)
        json.dump({"idx0": row}, f)
    n_h, n_o = 120, 80
    data = np.concatenate(
        [rng.randn(n_h + n_o, 3) * 0.05 + np.array([0, 0, 0.6]),
         rng.randn(n_h + n_o, 2) * 0.02, rng.randint(0, 6, (n_h + n_o, 1))],
        axis=1,
    ).astype(np.float32)
    np.save(sdf2 / f"{mangled}.npy", data)
    np.save(tmp_path / "sdf" / "test" / "sdf_index.npy", np.array([[n_h, n_o]]))

    cfg = _make_cfg(
        fixture_dirs, annotation_dir=str(ann2), image_fast_path=str(img2),
        fast_data_dir=str(tmp_path / "sdf"), small_dexycb=True,
    )
    ds = DexYCBDataset(cfg, "test", make_synthetic_mano(0))
    assert len(ds) == 1
    assert ds.sdf_paths[0].endswith(f"{mangled}.npy")
    s = ds.__getitem__(0, epoch=0)
    assert s["img"].shape == (64, 64, 3)
    assert s["hand_sdf_points"].shape == (64, 3)


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


def test_dexycb_real_eval_end_to_end(fixture_dirs, tmp_path, monkeypatch):
    """Drives evaluate.main()'s real (non-synthetic) DexYCB branch over the
    reference-layout fixture to a results.txt with finite MJE/PA-MJE and
    object metrics (main/test.py:119-259)."""
    import sys

    from hoisdf_tpu import evaluate as ev_mod
    from hoisdf_tpu.data.dexycb import YCB_CLASSES

    ann, img, sdf, root = fixture_dirs
    rng = np.random.RandomState(5)
    simple = tmp_path / "simple"
    for name in YCB_CLASSES:
        os.makedirs(simple / name)
        with open(simple / name / "textured_simple_2000.obj", "w") as f:
            for v in rng.randn(50, 3) * 0.04:
                f.write("v %f %f %f\n" % tuple(v))

    out_dir = tmp_path / "out"
    # The test mesh has 8 virtual devices and the module fixture only 3 eval
    # samples, so build an 8-sample copy (annotations duplicated, SDF dumps
    # copied, the global index rewritten to the 8 sorted names) in tmp_path.
    import json as _json
    import shutil

    with open(os.path.join(ann, "dex_ycb_s0_test_data.json")) as f:
        base = _json.load(f)
    big = {}
    src_sdf = os.path.join(sdf, "full_test", "sdf_processed")
    sdf8 = tmp_path / "sdf8" / "full_test"
    os.makedirs(sdf8 / "sdf_processed")
    names = []
    for i in range(8):
        key = f"idx{i}"
        big[key] = dict(base[f"idx{i % 3}"])
        shutil.copyfile(
            os.path.join(src_sdf, f"idx{i % 3}.npy"),
            sdf8 / "sdf_processed" / f"{key}.npy",
        )
        names.append(key)
    np.save(sdf8 / "sdf_index.npy",
            np.asarray([[300, 200] for _ in sorted(names)]))
    ann2 = tmp_path / "ann8"
    os.makedirs(ann2)
    with open(ann2 / "dex_ycb_s0_test_data.json", "w") as f:
        _json.dump(big, f)

    argv = [
        "evaluate", "--setting", "dexycb", "--cpu",
        "--batch-size", "8", "--out", str(out_dir),
        "--cfg", f"annotation_dir={ann2}",
        "--cfg", f"image_fast_path={img}",
        "--cfg", f"fast_data_dir={tmp_path / 'sdf8'}",
        "--cfg", f"data_dir={root}",
        "--cfg", f"simple_object_models_dir={simple}",
        "--cfg", "small_dexycb=false",
        "--cfg", "resnet_type=18", "--cfg", "hidden_dim=64",
        "--cfg", "dim_feedforward=128", "--cfg", "enc_layers=2",
        "--cfg", "dec_layers=2", "--cfg", "num_samp_hand=32",
        "--cfg", "num_samp_obj=16", "--cfg", "input_img_shape=[64, 64]",
        "--cfg", "output_hm_shape=[32, 32, 32]", "--cfg", "bins_n=16",
        "--cfg", "sdf_infer_chunk=2048", "--cfg", "num_data_workers=2",
        "--cfg", "points_filter_dist=1.0",
        # u8 input wire (ops/wire.py): covers evaluate's encode path on
        # real batches; bit-exact vs f32 is pinned by tests/test_wire.py.
        "--cfg", 'transfer_dtype="uint8"',
    ]
    monkeypatch.setattr(sys, "argv", argv)
    ev_mod.main()

    text = open(out_dir / "results.txt").read()
    metrics = {}
    for line in text.splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            metrics[k.strip()] = float(v)
    for k in ("ADDS_error", "mano_mje", "mano_pamje", "OCE_error", "MCE_error"):
        assert np.isfinite(metrics[k]), (k, metrics)


def test_train_loop_real_path_end_to_end(fixture_dirs, tmp_path, monkeypatch):
    """Drives hoisdf_tpu.train_loop.main() on the on-disk fixture via the
    REAL-data branch: train step, snapshot, eval-during-training, and the
    debug-image grids the reference dumps to TensorBoard during real
    training (main/train.py:302-440).  Runs on the u8 input wire
    (transfer_dtype=uint8, ops/wire.py) so the loop's encode path is
    exercised with real fixture batches; step-level bit-exactness vs the
    f32 wire is pinned by tests/test_wire.py, and the f32-wire loop is
    covered by test_train.py's train_loop runs."""
    import sys

    from hoisdf_tpu import train_loop

    ann, img, sdf, root = fixture_dirs
    argv = [
        "train_loop", "--setting", "dexycb", "--run_dir_name", "realrun",
        "--end_epoch", "1", "--cpu",
        "--cfg", f"annotation_dir={ann}",
        "--cfg", f"image_fast_path={img}",
        "--cfg", f"fast_data_dir={sdf}",
        "--cfg", f"data_dir={root}",
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
        "--cfg", 'transfer_dtype="uint8"',
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


def test_native_vs_pil_backend_ab(fixture_dirs):
    """Backend invariance (config.native_pipeline): eval samples bit-identical;
    train samples identical on every target, image within the blur's few-LSB
    compounding. Covers the left-flip sample (idx 2) on both modes."""
    import random as _random

    import hoisdf_tpu.native as N

    if not N.available():
        pytest.skip("native pipeline unavailable")
    cfg_n = _make_cfg(fixture_dirs, native_pipeline="on")
    cfg_p = _make_cfg(fixture_dirs, native_pipeline="off")
    for mode in ("test", "train"):
        ds_n = DexYCBDataset(cfg_n, mode, make_synthetic_mano(0))
        ds_p = DexYCBDataset(cfg_p, mode, make_synthetic_mano(0))
        for idx in (0, 2):  # right + left(flip) samples
            _random.seed(1234)  # jitter factors come from the global stream
            a = ds_n.__getitem__(idx, epoch=1)
            _random.seed(1234)
            b = ds_p.__getitem__(idx, epoch=1)
            assert set(a) == set(b)
            for k in a:
                if k == "img" and mode == "train":
                    # rotated-warp boundary-tie strays are bounded as a
                    # fraction (pipeline.cc warp docstring); everything
                    # else stays within the blur's LSB compounding
                    d = np.abs(a[k] - b[k]) * 255.0
                    assert (d > 5.0).mean() <= 2e-3, (k, d.max())
                else:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=f"{mode}/{k}")
