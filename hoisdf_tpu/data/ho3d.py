"""HO3D dataset: train (full labels + optional rendered extension) and eval
(image + bbox + intrinsics + root only; predictions go to the codalab
leaderboard).

Parity target: ``data/ho3d.py`` — same output contract; OpenGL->OpenCV
coordinate change on poses (ho3d_util.py:44-53), dataset-mean object depth
for the eval object center (main/config.py:73), rendered-data extension gate
(``cfg.add_render``, data/ho3d.py:195-263).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np
from PIL import Image, ImageFilter

from hoisdf_tpu.config import Config
from hoisdf_tpu.data import transforms as T
from hoisdf_tpu.mano.model import ManoModel

# OpenGL -> OpenCV camera flip (data/ho3d_util.py:44-53)
COORD_CHANGE_MAT = np.array(
    [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], dtype=np.float32
)

HO3D_OBJECTS = (
    "003_cracker_box", "004_sugar_box", "006_mustard_bottle",
    "010_potted_meat_can", "011_banana", "019_pitcher_base",
    "021_bleach_cleanser", "025_mug", "035_power_drill", "037_scissors",
)


def convert_pose_to_opencv(rot_aa: np.ndarray, trans: np.ndarray):
    """OpenGL-convention object pose -> OpenCV (ho3d_util.py:44-53)."""
    rot = T.rodrigues_np(rot_aa.astype(np.float64))
    rot = COORD_CHANGE_MAT.astype(np.float64) @ rot
    trans = COORD_CHANGE_MAT @ trans
    return T.inv_rodrigues_np(rot).astype(np.float32), trans.astype(np.float32)


def dump_codalab_json(pred_out_path: str, xyz_pred_list, verts_pred_list) -> str:
    """Write the HO-3D challenge submission json (ho3d_util.py:123-134)."""
    xyz = [x.round(4).tolist() for x in xyz_pred_list]
    verts = [v.round(4).tolist() for v in verts_pred_list]
    path = os.path.join(pred_out_path, "pred_mano.json")
    with open(path, "w") as f:
        json.dump([xyz, verts], f)
    return path


class HO3DDataset:
    """HO3D v2; mirrors the DexYCB class's flat-dict contract.

    Train samples carry full supervision; eval samples only image/bbox/K/root
    (data/ho3d.py:432-653) — eval metrics come from the codalab submission.
    """

    def __init__(
        self,
        cfg: Config,
        mode: str,
        mano_right: ManoModel,
        seed: int = 0,
    ):
        assert mode in ("train", "evaluation")
        self.cfg = cfg
        self.mode = mode
        self.inp_res = cfg.input_img_shape[0]
        self.heatmap_res = cfg.output_hm_shape[1]
        self.seed = seed
        self.hands_mean = mano_right.hands_mean

        self.max_rot = np.pi
        self.scale_jittering = 0.2
        self.center_jittering = 0.1
        self.hue, self.saturation, self.contrast, self.brightness = 0.15, 0.5, 0.5, 0.5
        self.blur_radius = 0.5

        root = cfg.data_dir
        if root is None:
            raise FileNotFoundError(
                "cfg.data_dir is unset — point it at the HO3D_v2 root"
            )
        self.root = root
        split = "train" if mode == "train" else "evaluation"
        with open(os.path.join(root, f"{split}.txt")) as f:
            self.sample_list = [line.strip() for line in f if line.strip()]
        self.fast_data_dir = cfg.fast_data_dir
        self.render_samples: list = []
        self.render_hand_counts: Optional[np.ndarray] = None
        if cfg.add_render and mode == "train":
            # Rendered-data extension (data/ho3d.py:195-263): the sample list
            # is whatever sits in <fast_data_dir>/render/sdf_processed, sorted;
            # rgb/anno/seg live in sibling dirs under render/.
            render_sdf_dir = os.path.join(self.fast_data_dir, "render",
                                          "sdf_processed")
            if os.path.isdir(render_sdf_dir):
                self.render_samples = sorted(
                    f[:-4] for f in os.listdir(render_sdf_dir)
                    if f.endswith(".npy") and not f.endswith("_index.npy")
                )
                index_path = os.path.join(
                    self.fast_data_dir, "render", "sdf_index.npy"
                )
                if os.path.exists(index_path):
                    # global per-sample hand counts (reference ho3d.py:204-222)
                    self.render_hand_counts = np.load(index_path).reshape(
                        len(self.render_samples), -1
                    )[:, 0].astype(np.int64)
                self.sample_list = self.sample_list + [
                    f"render:{s}" for s in self.render_samples
                ]

    def __len__(self) -> int:
        return len(self.sample_list)

    def _rng(self, idx: int, epoch: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, epoch, idx))

    def _load_meta(self, key: str) -> Dict:
        seq, frame = key.split("/")[-2:]
        split = "train" if self.mode == "train" else "evaluation"
        with open(
            os.path.join(self.root, split, seq, "meta", f"{frame}.json")
        ) as f:
            return json.load(f)

    def _draw_sdf_points(
        self, rng: np.random.Generator, sdf_data: np.ndarray, n_hand_avail: int
    ):
        """Draw supervision + near-surface 'pre' points (data/ho3d.py SDF
        sampling, same contract as DexYCB).  Returns
        ([2*(num_samp_hand+num_samp_obj), 5] points, hand part labels or None)."""
        cfg = self.cfg
        hand_idx = rng.choice(n_hand_avail, cfg.num_samp_hand, replace=False)
        obj_idx = rng.choice(
            np.arange(n_hand_avail, sdf_data.shape[0]), cfg.num_samp_obj,
            replace=False,
        )
        hand_near = np.where(
            np.abs(sdf_data[:n_hand_avail, 3]) < cfg.points_filter_dist
        )[0]
        obj_near = np.where(
            np.abs(sdf_data[n_hand_avail:, 4]) < cfg.points_filter_dist
        )[0] + n_hand_avail
        hand_pre_idx = rng.choice(hand_near, cfg.num_samp_hand, replace=False)
        obj_pre_idx = rng.choice(obj_near, cfg.num_samp_obj, replace=False)
        all_idx = np.concatenate([hand_idx, obj_idx, hand_pre_idx, obj_pre_idx])
        labels = None
        if cfg.classifier_branch and sdf_data.shape[1] > 5:
            # part label column; clamp-invalidated -> -1 (sdf_utils.py:87-91)
            labels = np.where(
                np.abs(sdf_data[hand_idx, 3]) > cfg.clamping_distance,
                -1, sdf_data[hand_idx, 5].astype(np.int32),
            ).astype(np.int32)
        return sdf_data[all_idx, :5].copy(), labels

    def _getitem_render(
        self, fname: str, render_idx: int, rng: np.random.Generator
    ) -> Dict[str, np.ndarray]:
        """Rendered-sample decode (data/ho3d.py:195-263): png rgb, json anno,
        png seg, render SDF dir.  Rendered annotations are already in OpenCV
        camera coordinates (no OpenGL flip); objRot is a 3x3 matrix; MANO
        params are zeros (the ho3d_render preset supervises via IK instead).

        Layout deviation from the reference: rest-frame object corners are
        read from the anno json (``objCorners3DRest``) — our preprocessing
        bakes them in — instead of being recomputed from mesh files.
        """
        cfg = self.cfg
        rdir = os.path.join(self.fast_data_dir, "render")
        img = Image.open(os.path.join(rdir, "rgb", f"{fname}.png")).convert("RGB")
        with open(os.path.join(rdir, "anno", f"{fname}.json")) as f:
            anno = json.load(f)
        K = np.asarray(anno["camMat"], np.float64).reshape(3, 3)
        joints_3d = np.asarray(anno["handJoints3D"], np.float32)
        _, joints_uv = T.project_points_np(joints_3d, K)
        mano_param = np.zeros(58, np.float32)  # reference ho3d.py:249

        obj_rot_mat = np.asarray(anno["objRot"], np.float32).reshape(3, 3)
        obj_trans = np.asarray(anno["objTrans"], np.float32)
        obj_rot = T.inv_rodrigues_np(obj_rot_mat.astype(np.float64)).astype(
            np.float32
        )
        obj_corners = np.asarray(anno["objCorners3DRest"], np.float32)
        rt = np.concatenate(
            [obj_rot_mat.astype(np.float32), obj_trans[:, None]], axis=1
        )
        p3d, p2d = T.project_points_np(obj_corners, K, rt=rt)

        seg = np.asarray(Image.open(os.path.join(rdir, "seg", f"{fname}.png")))
        # render seg thresholds at 200 (reference ho3d.py:231-232)
        hand_seg = Image.fromarray((seg[..., 0] > 200).astype(np.uint8))
        obj_seg = Image.fromarray((seg[..., 2] > 200).astype(np.uint8))

        sdf_data = np.load(os.path.join(rdir, "sdf_processed", f"{fname}.npy"))
        if self.render_hand_counts is not None:
            n_hand_avail = int(self.render_hand_counts[render_idx])
        else:
            n_hand_avail = int(
                np.load(
                    os.path.join(rdir, "sdf_processed", f"{fname}_index.npy")
                )[0]
            )
        sdf_points, hand_part_labels = self._draw_sdf_points(
            rng, sdf_data, n_hand_avail
        )

        (img, mano_param, K, hand_seg_a, obj_seg_a, p2d, joints_uv, bbox_hand,
         bbox_obj, sdf_points, joints_3d, p3d, obj_rot, obj_trans) = self._aug(
            rng, img, mano_param, joints_uv, K, hand_seg, obj_seg,
            p2d, sdf_points, joints_3d, p3d, obj_rot, obj_trans,
        )
        return self._assemble(
            cfg, img, mano_param, K, hand_seg_a, obj_seg_a, joints_uv,
            joints_3d, sdf_points, bbox_hand, bbox_obj, obj_rot, obj_trans,
            np.int32(HO3D_OBJECTS.index(anno["objName"]))
            if anno.get("objName") in HO3D_OBJECTS else np.int32(-1),
            hand_part_labels=hand_part_labels,
        )

    def __getitem__(self, idx: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        key = self.sample_list[idx]
        rng = self._rng(idx, epoch)
        if key.startswith("render:"):
            fname = key[len("render:"):]
            return self._getitem_render(
                fname, idx - (len(self.sample_list) - len(self.render_samples)),
                rng,
            )
        seq, frame = key.split("/")[-2:]
        split = "train" if self.mode == "train" else "evaluation"
        img = Image.open(
            os.path.join(self.root, split, seq, "rgb", f"{frame}.jpg")
        ).convert("RGB")
        meta = self._load_meta(key)
        K = np.asarray(meta["camMat"], np.float64).reshape(3, 3)

        if self.mode == "evaluation":
            # Eval: bbox + root joint only (data/ho3d.py:521-556).  The
            # evaluation split stores just the root under handJoints3D.
            hj = np.asarray(
                meta.get("handJointsRoot", meta["handJoints3D"]), np.float32
            )
            if hj.ndim == 2:
                hj = hj[0]
            root_joint = COORD_CHANGE_MAT @ hj
            bbox_hand = np.asarray(meta["handBoundingBox"], np.float32)
            obj_corners = COORD_CHANGE_MAT @ np.asarray(
                meta["objCorners3D"], np.float32
            ).T
            _, p2d = T.project_points_np(obj_corners.T.astype(np.float32), K)
            img, bbox_hand, bbox_obj, K2 = self._crop_eval(img, K, bbox_hand, p2d)
            obj_center_cam = T.get_center_cam(
                bbox_obj, cfg.obj_depth_mean_value, K2
            ).astype(np.float32)
            return {
                "img": np.asarray(img, np.float32) / 255.0,
                "cam_intr": K2.astype(np.float32),
                "mano_root": root_joint.astype(np.float32),
                "obj_center_cam": obj_center_cam,
                "bbox_hand": bbox_hand.astype(np.float32),
                "bbox_obj": bbox_obj.astype(np.float32),
                "obj_cls": np.asarray(
                    HO3D_OBJECTS.index(meta["objName"])
                    if meta.get("objName") in HO3D_OBJECTS else -1, np.int32
                ),
                # pitcher_base is excluded from HO3D object metrics
                # (common/metrics.py:131-143)
                "obj_valid": np.asarray(
                    meta.get("objName") != "019_pitcher_base"
                ),
            }

        # ---- train ----
        joints_3d = (COORD_CHANGE_MAT @ np.asarray(
            meta["handJoints3D"], np.float32
        ).T).T
        mano_pose = np.asarray(meta["handPose"], np.float32)
        # OpenGL->OpenCV on the global orient
        mano_pose[:3] = T.rotation_angle(
            mano_pose[:3].astype(np.float64), COORD_CHANGE_MAT.astype(np.float64)
        )
        mano_betas = np.asarray(meta["handBeta"], np.float32)
        mano_param = np.concatenate(
            [mano_pose[:3], mano_pose[3:48] + self.hands_mean, mano_betas]
        )
        _, joints_uv = T.project_points_np(joints_3d, K)

        obj_rot = np.asarray(meta["objRot"], np.float32).reshape(3)
        obj_trans = np.asarray(meta["objTrans"], np.float32)
        obj_rot, obj_trans = convert_pose_to_opencv(obj_rot, obj_trans)
        obj_corners = np.asarray(meta["objCorners3DRest"], np.float32)
        rt = np.concatenate(
            [T.rodrigues_np(obj_rot.astype(np.float64)).astype(np.float32),
             obj_trans[:, None]], 1,
        )
        p3d, p2d = T.project_points_np(obj_corners, K, rt=rt)

        # seg from the composite jpg channels (data/ho3d.py:146-170 layout)
        seg_path = os.path.join(self.root, split, seq, "seg", f"{frame}.jpg")
        seg = np.asarray(Image.open(seg_path))
        hand_seg = Image.fromarray((seg[..., 0] > 100).astype(np.uint8))
        obj_seg = Image.fromarray((seg[..., 2] > 100).astype(np.uint8))

        sdf_data = np.load(os.path.join(self.fast_data_dir, f"{seq}_{frame}.npy"))
        n_hand_avail = int(
            np.load(os.path.join(self.fast_data_dir, f"{seq}_{frame}_index.npy"))[0]
        )
        sdf_points, hand_part_labels = self._draw_sdf_points(
            rng, sdf_data, n_hand_avail
        )

        (img, mano_param, K, hand_seg_a, obj_seg_a, p2d, joints_uv, bbox_hand,
         bbox_obj, sdf_points, joints_3d, p3d, obj_rot, obj_trans) = self._aug(
            rng, img, mano_param, joints_uv, K, hand_seg, obj_seg,
            p2d, sdf_points, joints_3d, p3d, obj_rot, obj_trans,
        )
        return self._assemble(
            cfg, img, mano_param, K, hand_seg_a, obj_seg_a, joints_uv,
            joints_3d, sdf_points, bbox_hand, bbox_obj, obj_rot, obj_trans,
            np.int32(HO3D_OBJECTS.index(meta["objName"]))
            if meta.get("objName") in HO3D_OBJECTS else np.int32(-1),
            hand_part_labels=hand_part_labels,
        )

    def _crop_eval(self, img, K, bbox_hand, p2d):
        bbox_obj = T.get_bbox_joints(p2d, bbox_factor=1.0)
        crop_obj = T.get_bbox_joints(p2d, bbox_factor=1.5)
        bh = np.asarray(bbox_hand, np.float32)
        crop_hand = T.get_bbox_joints(bh.reshape(2, 2), bbox_factor=1.5)
        center, scale = T.fuse_bbox(crop_hand, crop_obj, img.size)
        affinetrans, post_rot_trans, _ = T.get_affine_transform(
            center, scale, [self.inp_res, self.inp_res], K=K
        )
        bbox_hand = T.transform_coords(bh.reshape(2, 2), affinetrans).flatten()
        bbox_obj = T.transform_coords(bbox_obj.reshape(2, 2), affinetrans).flatten()
        img = T.transform_img(img, affinetrans, [self.inp_res, self.inp_res])
        img = img.crop((0, 0, self.inp_res, self.inp_res))
        return img, bbox_hand.astype(np.float32), bbox_obj.astype(np.float32), (
            post_rot_trans @ K
        )


# Shared augmentation/assembly pipeline: the reference's HO3D train path runs
# the exact same aug code as DexYCB (data/ho3d.py reuses dataset_util the same
# way), so the methods are bound from the DexYCB class.
from hoisdf_tpu.data.dexycb import DexYCBDataset as _DexYCB  # noqa: E402

HO3DDataset._aug = _DexYCB._aug
HO3DDataset._warp_seg = _DexYCB._warp_seg
HO3DDataset._assemble = _DexYCB._assemble
