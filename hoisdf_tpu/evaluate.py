"""Evaluation entry point: checkpointed model -> results.txt metrics.

Parity target: ``main/test.py:77-269`` — DexYCB: ADD-S/OCE/MCE + MANO
MJE/PA-MJE (+ dexycb_full mesh EPE/AUC and F@5/15mm); HO3D: ADD-S/MME +
codalab ``pred_mano.json`` accumulation with the MANO->Simple joint reorder
and the OpenGL coordinate change.

Usage:
    python -m hoisdf_tpu.evaluate --setting dexycb --synthetic        # smoke
    python -m hoisdf_tpu.evaluate --setting dexycb --ckpt <dir> ...   # real
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.config import Config, get_config
from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
from hoisdf_tpu.mano.layer import ManoBuffers
from hoisdf_tpu.mano.model import load_mano_npz, make_synthetic_mano
from hoisdf_tpu.metrics import (
    EvalUtil,
    eval_batched_obj_direct,
    eval_hand_joint,
    mesh_metrics_batch,
)
from hoisdf_tpu.models.hoisdf import build_model
from hoisdf_tpu.models.mano_head import mano_head_gt
from hoisdf_tpu.ops.ik import ik_solver_mano
from hoisdf_tpu.ops import wire
from hoisdf_tpu.train import make_eval_step
from hoisdf_tpu.utils import checkpoint as ckpt_util

# MANO joint order -> "simple" leaderboard order (data/ho3d.py:47-70)
JOINTS_MANO_TO_SIMPLE = np.array(
    [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]
)
JOINTS_SIMPLE_TO_MANO = np.argsort(JOINTS_MANO_TO_SIMPLE)

COORD_CHANGE_MAT = np.array(
    [[1.0, 0.0, 0.0], [0, -1.0, 0.0], [0.0, 0.0, -1.0]], dtype=np.float32
)


def load_obj_vertices(path: str) -> np.ndarray:
    """Minimal OBJ vertex parser for the simplified 1000-vert YCB meshes
    (replaces pytorch3d/meshio at dataset_util.py:353-379)."""
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
    return np.asarray(verts, np.float32)


def prepare_model_templates(obj_root: str):
    templates, obj_names = [], {}
    for obj_id, obj in enumerate(sorted(os.listdir(obj_root)), start=1):
        path = os.path.join(obj_root, obj, "textured_simple_2000.obj")
        templates.append(load_obj_vertices(path))
        obj_names[obj_id] = obj
    return templates, obj_names


class Evaluator:
    """Accumulates the reference's metric set over eval batches."""

    def __init__(self, cfg: Config, mano_buffers: ManoBuffers):
        self.cfg = cfg
        self.mano = mano_buffers
        self.results: Dict[str, float] = {"ADDS_error": 0.0}
        self.total = 0
        if cfg.dataset == "dexycb":
            self.results.update(
                mano_mje=0.0, mano_pamje=0.0, OCE_error=0.0, MCE_error=0.0
            )
            self.mesh_err = EvalUtil(num_kp=778)
            self.mesh_err_aligned = EvalUtil(num_kp=778)
            self.f_scores: List[List[float]] = []
            self.f_scores_aligned: List[List[float]] = []
            self.f_threshs = (0.005, 0.015)
        else:
            self.results["MME_error"] = 0.0
            self.joint_list: List[np.ndarray] = []
            self.mesh_list: List[np.ndarray] = []

    def _obj_valid_mask(self, meta: Dict, b: int) -> np.ndarray:
        """Per-sample object-metric validity.  HO3D excludes 019_pitcher_base
        from ADD-S/MME (common/metrics.py:131-143); the dataset emits
        ``obj_valid`` directly, with an ``obj_cls``-derived fallback."""
        if "obj_valid" in meta:
            return np.asarray(meta["obj_valid"]).astype(bool).reshape(b)
        if self.cfg.dataset == "ho3d" and "obj_cls" in meta:
            from hoisdf_tpu.data.ho3d import HO3D_OBJECTS

            pitcher = HO3D_OBJECTS.index("019_pitcher_base")
            return (np.asarray(meta["obj_cls"]).reshape(b) != pitcher)
        return np.ones(b, bool)

    def feed(self, preds: Dict, targets: Dict, meta: Dict, templates: jax.Array):
        cfg = self.cfg
        b = int(meta["mano_root"].shape[0])
        obj_rot = preds["obj_rot"].mean(axis=1)  # point-avg (test.py:121-122)
        obj_trans = preds["obj_trans"].mean(axis=1)

        obj = eval_batched_obj_direct(
            obj_rot, obj_trans, targets["obj_rot"], targets["rel_obj_trans"],
            templates, ho3d=cfg.dataset == "ho3d",
        )
        mask = self._obj_valid_mask(meta, b)
        n = int(mask.sum())
        if n:
            self.results["ADDS_error"] += float(
                np.asarray(obj["ADDS"])[mask].mean()
            ) * n * 100

        if cfg.dataset == "ho3d":
            if n:
                self.results["MME_error"] += float(
                    np.asarray(obj["MME"])[mask].mean()
                ) * n * 100
            root = np.asarray(meta["mano_root"])[:, None, :]
            if cfg.use_inverse_kinematics:
                hand_joints = np.concatenate(
                    [np.zeros_like(preds["hand_joints"][:, :1]),
                     np.asarray(preds["hand_joints"])], axis=1,
                )
                ik = ik_solver_mano(
                    self.mano, jnp.asarray(hand_joints), preds.get("mano_shape")
                )
                joints = np.asarray(ik["joints"]) + root
                mesh = np.asarray(ik["verts"]) + root
            else:
                joints = np.asarray(preds["mano_joints"]) + root
                mesh = np.asarray(preds["mano_verts"]) + root
            joints = joints @ COORD_CHANGE_MAT
            mesh = mesh @ COORD_CHANGE_MAT
            for x, v in zip(joints, mesh):
                self.joint_list.append(x[JOINTS_SIMPLE_TO_MANO])
                self.mesh_list.append(v)
        else:
            if cfg.use_inverse_kinematics:
                hand_joints = np.concatenate(
                    [np.zeros_like(preds["hand_joints"][:, :1]),
                     np.asarray(preds["hand_joints"])], axis=1,
                )
                ik = ik_solver_mano(
                    self.mano, jnp.asarray(hand_joints), preds.get("mano_shape")
                )
                mje, pamje = eval_hand_joint(
                    ik["joints"], jnp.asarray(targets["joint_cam_no_trans"]) / 1000
                )
            else:
                gt = mano_head_gt(self.mano, jnp.asarray(targets["mano_param"]))
                mje, pamje = eval_hand_joint(preds["mano_joints"], gt["joints3d"])
            self.results["mano_mje"] += float(mje) * b * 100
            self.results["mano_pamje"] += float(pamje) * b * 100
            if n:
                self.results["OCE_error"] += float(
                    np.asarray(obj["OCE"])[mask].mean()
                ) * n * 100
                self.results["MCE_error"] += float(
                    np.asarray(obj["MCE"])[mask].mean()
                ) * n * 100
            if cfg.eval_mesh:
                gt = mano_head_gt(self.mano, jnp.asarray(targets["mano_param"]))
                # One jitted device call per batch (vmapped rigid_align +
                # shared-pairwise F-scores) + one host transfer, replacing
                # the per-sample loop of 5 device round-trips per mesh
                # (main/test.py:214-222,232-259 semantics preserved).
                mm = jax.device_get(
                    mesh_metrics_batch(
                        gt["verts3d"], jnp.asarray(preds["mano_verts"]),
                        self.f_threshs,
                    )
                )
                for i in range(mm["epe_dist"].shape[0]):
                    self.mesh_err.feed_dist(mm["epe_dist"][i])
                    self.mesh_err_aligned.feed_dist(mm["epe_dist_aligned"][i])
                    self.f_scores.append(
                        [float(v) for v in mm["fscores"][i]]
                    )
                    self.f_scores_aligned.append(
                        [float(v) for v in mm["fscores_aligned"][i]]
                    )
        self.total += n if cfg.dataset == "ho3d" else b

    def write_results(self, log_dir: str) -> str:
        path = os.path.join(log_dir, "results.txt")
        with open(path, "w") as f:
            for k, v in self.results.items():
                print(k, ": ", v / max(self.total, 1), file=f)
            if self.cfg.dataset == "dexycb" and self.cfg.eval_mesh:
                m, _, auc, _, _ = self.mesh_err.get_measures(0.0, 0.05, 100)
                print("Evaluation 3D MESH results:", file=f)
                print("auc=%.3f, mean_vert3d_avg=%.2f cm" % (auc, m * 100), file=f)
                ma, _, auca, _, _ = self.mesh_err_aligned.get_measures(0.0, 0.05, 100)
                print("Evaluation 3D MESH ALIGNED results:", file=f)
                print("auc=%.3f, mean_vert3d_avg=%.2f cm\n" % (auca, ma * 100), file=f)
                print("F-scores", file=f)
                fs = np.asarray(self.f_scores).T
                fsa = np.asarray(self.f_scores_aligned).T
                for row, rowa, t in zip(fs, fsa, self.f_threshs):
                    print(
                        "F@%.1fmm = %.3f" % (t * 1000, row.mean()),
                        "\tF_aligned@%.1fmm = %.3f" % (t * 1000, rowa.mean()),
                        file=f,
                    )
        return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--setting", default="dexycb")
    p.add_argument("--ckpt", default=None, help="snapshot dir to restore")
    p.add_argument(
        "--torch-ckpt", default=None,
        help="reference snapshot_*.pth.tar (or an .npz state dict) to convert "
             "and evaluate directly (main/test.py --ckpt_path equivalent)",
    )
    p.add_argument("--mano", default=None, help="MANO .npz path override")
    p.add_argument(
        "--cfg", action="append", default=[], metavar="KEY=VALUE",
        help="config field override (repeatable, JSON-parsed values)",
    )
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batches", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--out", default="outputs/result")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hoisdf_tpu.utils.compile_cache import enable as _enable_cc

    _enable_cc()

    from hoisdf_tpu.config import parse_cfg_overrides

    overrides = {}
    if args.synthetic:
        from hoisdf_tpu.config import SYNTHETIC_TINY_OVERRIDES

        overrides = dict(SYNTHETIC_TINY_OVERRIDES)
    overrides.update(parse_cfg_overrides(args.cfg))
    if args.mano:
        overrides["mano_model_path"] = args.mano
    cfg = get_config(args.setting, **overrides)

    mano_model = (
        load_mano_npz(cfg.mano_model_path) if cfg.mano_model_path
        else make_synthetic_mano(0)
    )
    mano_left = load_mano_npz(cfg.mano_left_path) if cfg.mano_left_path else None
    mano = ManoBuffers.from_model(mano_model)
    model = build_model(cfg)

    batch_np = synthetic_batch(cfg, args.batch_size, train=False)
    inputs0, _ = split_inputs_targets(batch_np)
    inputs0 = {k: jnp.asarray(v) for k, v in inputs0.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, inputs0, use_presampled=False,
        train=False, supervise_sdf=cfg.dataset == "dexycb",
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if args.torch_ckpt:
        from hoisdf_tpu.tools.convert_torch_ckpt import (
            convert_state_dict,
            load_torch_state,
            verify_tree_match,
        )

        state = load_torch_state(args.torch_ckpt)
        cparams, cstats = convert_state_dict(
            state, big_decoder=cfg.use_big_decoder
        )
        verify_tree_match(cparams, params, what="params")
        verify_tree_match(cstats, batch_stats, what="batch_stats")
        params = jax.tree_util.tree_map(jnp.asarray, cparams)
        batch_stats = jax.tree_util.tree_map(jnp.asarray, cstats)
    elif args.ckpt:
        restored = ckpt_util.restore_snapshot(
            args.ckpt, {"params": params, "batch_stats": batch_stats,
                        "opt_state": None, "step": 0},
        )
        if restored:
            params, batch_stats = restored["params"], restored["batch_stats"]

    eval_step = make_eval_step(cfg, model, mano)
    evaluator = Evaluator(cfg, mano)

    # Data-parallel eval over every visible device (batch must divide evenly).
    from hoisdf_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    n_dev = mesh.devices.size
    if args.batch_size % n_dev:
        args.batch_size = max(n_dev, args.batch_size - args.batch_size % n_dev)

    if args.synthetic:
        def batches():
            for i in range(args.batches):
                b = synthetic_batch(cfg, args.batch_size, seed=i, train=False)
                inputs, targets = split_inputs_targets(b)
                templates = np.random.RandomState(0).randn(
                    args.batch_size, 100, 3
                ).astype(np.float32) * 0.05
                yield inputs, targets, templates, args.batch_size
    else:
        # Real dataset eval (main/test.py:84-118): simplified YCB templates
        # + the test/evaluation split.
        from hoisdf_tpu.data.loader import DataLoader

        if cfg.dataset == "dexycb":
            from hoisdf_tpu.data.dexycb import DexYCBDataset

            dataset = DexYCBDataset(cfg, "test", mano_model, mano_left=mano_left)
        else:
            from hoisdf_tpu.data.ho3d import HO3DDataset

            dataset = HO3DDataset(cfg, "evaluation", mano_model)
        templates_by_cls, obj_names = prepare_model_templates(
            cfg.simple_object_models_dir
        )
        # drop_last=False: the reference evaluates EVERY test sample (its
        # test loader never drops the tail, common/base.py:163-169).  The
        # short final batch is padded back to full size below so the jitted
        # eval step keeps one static shape (no tail recompile through the
        # remote-compile tunnel); padded rows are trimmed before metrics.
        # Explicitly UNSHARDED: evaluation is a single-host pass over the
        # full split (metrics aggregate in host Python) — on a pod run it
        # on process 0 only (docs/SCALING.md), never auto-shard it.
        loader = DataLoader(
            dataset, args.batch_size, shuffle=False,
            num_workers=cfg.num_data_workers, drop_last=False,
            shard_id=0, num_shards=1,
        )

        if cfg.dataset == "ho3d":
            # HO3D obj_cls is a 0-based HO3D_OBJECTS index; the reference maps
            # the class NAME to its position in the sorted simple-models
            # listing (common/metrics.py:131-138), so resolve by name.
            from hoisdf_tpu.data.ho3d import HO3D_OBJECTS

            name_pos = {n: i for i, n in enumerate(obj_names.values())}

            def template_for(c: int) -> np.ndarray:
                return templates_by_cls[name_pos[HO3D_OBJECTS[int(c)]]]
        else:
            # DexYCB obj_cls is the 1-based YCB id; template list is the
            # sorted 21-class listing (common/metrics.py:146)
            def template_for(c: int) -> np.ndarray:
                return templates_by_cls[int(c) - 1]

        def batches():
            from hoisdf_tpu.data.loader import pad_batch

            for b in loader:
                inputs = {k: v for k, v in b.items() if not k.startswith("target_")}
                targets = {k[7:]: v for k, v in b.items() if k.startswith("target_")}
                valid = int(next(iter(inputs.values())).shape[0])
                if valid < args.batch_size:
                    inputs = pad_batch(inputs, args.batch_size)
                    targets = pad_batch(targets, args.batch_size)
                templates = np.stack(
                    [template_for(c) for c in inputs["obj_cls"]]
                )
                yield inputs, targets, templates, valid

    # One-batch lookahead: dispatch batch i+1's eval step (JAX async) before
    # pulling batch i's outputs to host for metrics, overlapping the remote
    # dispatch + device compute with the host-side metric work (the
    # reference's loop is fully serial, main/test.py:119-227).
    def _feed(preds, targets, inputs, templates, valid):
        if valid < args.batch_size:  # trim the tail-batch padding
            from hoisdf_tpu.data.loader import trim_batch

            preds, targets, inputs = (
                trim_batch(preds, valid), trim_batch(targets, valid),
                trim_batch(inputs, valid),
            )
            templates = templates[:valid]
        evaluator.feed(preds, targets, inputs, templates)

    pending = None
    for inputs, targets, templates, valid in batches():
        with mesh:
            device_inputs = {
                k: v for k, v in inputs.items()
                if k not in ("obj_cls", "obj_valid")
            }
            if cfg.transfer_dtype == "uint8":
                # u8 image wire (ops/wire.py): 4x fewer bytes to the chip;
                # the jitted step LUT-decodes bit-exactly.  Host-side
                # metrics keep the original f32 `inputs`.
                device_inputs = wire.encode_inputs(device_inputs)
            inputs_j = shard_batch(
                {k: jnp.asarray(v) for k, v in device_inputs.items()}, mesh,
            )
            preds = eval_step(params, batch_stats, inputs_j)
        if pending is not None:
            _feed(*pending)
        pending = (preds, targets, inputs, jnp.asarray(templates), valid)
    if pending is not None:
        _feed(*pending)

    os.makedirs(args.out, exist_ok=True)
    path = evaluator.write_results(args.out)
    if cfg.dataset == "ho3d" and not args.synthetic:
        from hoisdf_tpu.data.ho3d import dump_codalab_json

        dump_codalab_json(args.out, evaluator.joint_list, evaluator.mesh_list)
        print("wrote", os.path.join(args.out, "pred_mano.json"))
    print("wrote", path)
    with open(path) as f:
        print(f.read())


if __name__ == "__main__":
    main()
