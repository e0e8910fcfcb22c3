"""Training entry point: epoch loop, logging, periodic eval + snapshots.

Parity target: ``main/train.py`` — CLI surface (:24-49: --run_dir_name,
--continue, --end_epoch, --point_sampling_epoch, --lr_drop), cfg dump
(:64-81), per-iteration loss logging with speed/ETA (:142-156), scalar
logging every 400 iterations (:129-135), eval every 5 epochs (1 after the
point-sampling switch) with snapshotting (:559-568), resume from the latest
snapshot (--continue; common/base.py:120-150).

Scalars land in ``metrics.jsonl`` (TensorBoard-free observability; load with
pandas or point tensorboard at it via a converter).

Usage:
    python -m hoisdf_tpu.train_loop --setting dexycb --run_dir_name demo \
        --synthetic --end_epoch 2 --iters-per-epoch 4 --batch-size 2 --cpu
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.config import get_config, parse_cfg_overrides
from hoisdf_tpu.data.loader import DataLoader
from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
from hoisdf_tpu.evaluate import Evaluator
from hoisdf_tpu.mano.layer import ManoBuffers
from hoisdf_tpu.mano.model import load_mano_npz, make_synthetic_mano
from hoisdf_tpu.models.hoisdf import build_model
from hoisdf_tpu.ops import wire
from hoisdf_tpu.parallel.mesh import make_mesh, shard_batch
from hoisdf_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
    presample_gate,
)
from hoisdf_tpu.utils import checkpoint as ckpt_util
from hoisdf_tpu.utils.logger import colorlogger
from hoisdf_tpu.utils.timer import Timer


def dump_debug_images(
    out_dir: str, step: int, preds: Dict, targets: Dict, writer=None
) -> None:
    """PNG dumps of predicted heatmap/segmentations vs GT — the JSONL-era
    equivalent of the reference's TensorBoard image grids
    (main/train.py:302-440)."""
    from PIL import Image as PILImage

    os.makedirs(out_dir, exist_ok=True)
    heads = np.asarray(preds["decoder_heads"][0])  # [H,W,3]

    def norm255(x):
        lo, hi = x.min(), x.max()
        return ((x - lo) / (hi - lo + 1e-8) * 255).astype(np.uint8)

    panels = [norm255(heads[..., 0]), norm255(heads[..., 1]), norm255(heads[..., 2])]
    if "hand_seg" in targets:
        panels.append(norm255(np.asarray(targets["hand_seg"][0])))
        panels.append(norm255(np.asarray(targets["obj_seg"][0])))
    grid = np.concatenate(panels, axis=1)
    PILImage.fromarray(grid).save(os.path.join(out_dir, f"debug_{step:08d}.png"))
    if writer is not None:
        writer.add_image(step, "debug/heads", grid)


class ScalarWriter:
    """Append-only JSONL scalar log, mirrored to TensorBoard event files when
    a SummaryWriter implementation is importable (the reference logs through
    tensorboardX, main/train.py:302-440; JSONL stays the source of truth so
    the loop never depends on TB being installed)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
        except Exception:  # noqa: BLE001 — TB is optional observability
            pass

    def add_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        self._f.write(
            json.dumps({"step": step, **{k: float(v) for k, v in scalars.items()}})
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def add_image(self, step: int, tag: str, img_hw_or_hwc) -> None:
        """Log a [H,W] or [H,W,C] uint8 image to TB (no-op without TB)."""
        if self._tb is not None:
            arr = np.asarray(img_hw_or_hwc)
            if arr.ndim == 2:
                arr = arr[..., None]
            self._tb.add_image(tag, arr, step, dataformats="HWC")


def load_backbone_init(state, snapshot_dir: str):
    """Graft ImageNet backbone weights from an OFFLINE-converted torchvision
    snapshot (``tools/convert_torch_ckpt.py --torchvision``) into a fresh
    train state — the no-download equivalent of the reference's model-zoo
    init at build time (common/nets/resnet.py:89-98)."""
    restored = ckpt_util.restore_snapshot(
        snapshot_dir,
        {"params": {"backbone": state.params["backbone"]},
         "batch_stats": {"backbone": state.batch_stats["backbone"]},
         "opt_state": {}, "step": 0},
    )
    if restored is None:
        raise FileNotFoundError(
            f"no snapshot under {snapshot_dir} — produce one with "
            "python -m hoisdf_tpu.tools.convert_torch_ckpt "
            "<resnet50.pth> <dir> --torchvision"
        )
    return state.replace(
        params={**state.params, "backbone": restored["params"]["backbone"]},
        batch_stats={**state.batch_stats,
                     "backbone": restored["batch_stats"]["backbone"]},
    )


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--setting", default="dexycb")
    p.add_argument("--run_dir_name", default="run")
    p.add_argument("--continue", dest="continue_train", action="store_true")
    p.add_argument("--end_epoch", type=int, default=None)
    p.add_argument("--point_sampling_epoch", type=int, default=None)
    p.add_argument("--lr_drop", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument(
        "--backbone-init", default=None, metavar="SNAPSHOT_DIR",
        help="initialize the ResNet backbone from a converted torchvision "
             "ImageNet snapshot (tools/convert_torch_ckpt.py --torchvision); "
             "offline equivalent of common/nets/resnet.py:89-98",
    )
    p.add_argument("--iters-per-epoch", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--zero", choices=["off", "zero1", "fsdp"], default="off",
        help="shard optimizer moments (zero1) or moments+params (fsdp) over "
             "the data mesh via GSPMD annotations (parallel/zero.py); 'off' "
             "replicates like the reference's DataParallel",
    )
    p.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize() before backend use (required "
             "on multi-host pod slices; coordinator/process env comes from "
             "the TPU metadata service — docs/SCALING.md §multi-host)",
    )
    p.add_argument(
        "--cfg", action="append", default=[], metavar="KEY=VALUE",
        help="config field override (repeatable); VALUE is parsed as JSON "
             "with a plain-string fallback, e.g. --cfg annotation_dir=/data "
             "--cfg train_batch_size=8",
    )
    return p.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        # Must precede any backend use; on Cloud TPU the coordinator address
        # and process index auto-resolve from the metadata service.
        jax.distributed.initialize()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hoisdf_tpu.utils.compile_cache import enable as _enable_cc

    _enable_cc()

    overrides = {}
    if args.end_epoch is not None:
        overrides["end_epoch"] = args.end_epoch
    if args.point_sampling_epoch is not None:
        overrides["point_sampling_epoch"] = args.point_sampling_epoch
    if args.lr_drop is not None:
        overrides["lr_drop"] = args.lr_drop
    if args.batch_size is not None:
        overrides["train_batch_size"] = args.batch_size
    if args.synthetic:
        overrides.update(
            resnet_type=18, hidden_dim=64, dim_feedforward=128, enc_layers=2,
            dec_layers=2, num_samp_hand=32, num_samp_obj=16,
            input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
            sdf_infer_chunk=2048, use_big_decoder=False,
        )
    overrides.update(parse_cfg_overrides(args.cfg))
    cfg = get_config(args.setting, **overrides)

    out_root = os.path.join(cfg.output_dir, args.run_dir_name)
    log_dir = os.path.join(out_root, "log")
    model_dir = os.path.join(out_root, "model_dump")
    os.makedirs(model_dir, exist_ok=True)
    logger = colorlogger(log_dir, "train_logs.txt")
    writer = ScalarWriter(os.path.join(out_root, "tensorboard"))

    # cfg/args dump (main/train.py:64-81)
    with open(os.path.join(log_dir, "cfg.txt"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    with open(os.path.join(log_dir, "args.txt"), "w") as f:
        json.dump(vars(args), f, indent=2)

    mano_model = (
        load_mano_npz(cfg.mano_model_path) if cfg.mano_model_path
        else make_synthetic_mano(0)
    )
    mano_left = load_mano_npz(cfg.mano_left_path) if cfg.mano_left_path else None
    mano = ManoBuffers.from_model(mano_model)
    model = build_model(cfg)

    # ---- data ----
    if args.synthetic:
        iters_per_epoch = args.iters_per_epoch or 8
        batch_size = cfg.train_batch_size

        def batches(epoch):
            for i in range(iters_per_epoch):
                yield synthetic_batch(cfg, batch_size, seed=epoch * 10000 + i)
    else:
        if cfg.dataset == "dexycb":
            from hoisdf_tpu.data.dexycb import DexYCBDataset

            dataset = DexYCBDataset(cfg, "train", mano_model, mano_left=mano_left, seed=cfg.seed)
        else:
            from hoisdf_tpu.data.ho3d import HO3DDataset

            dataset = HO3DDataset(cfg, "train", mano_model, seed=cfg.seed)
        # Per-HOST batch: this process feeds its local devices only; the
        # DataLoader's process-keyed shard + shard_batch's
        # make_array_from_process_local_data assemble the global
        # train_batch_size * len(jax.devices()) batch across hosts
        # (docs/SCALING.md §multi-host; single process: local == global).
        n_local = jax.local_device_count()
        loader = DataLoader(
            dataset, cfg.train_batch_size * n_local, shuffle=True,
            num_workers=cfg.num_data_workers, drop_last=True, seed=cfg.seed,
            worker_mode=cfg.data_worker_mode,
        )
        iters_per_epoch = args.iters_per_epoch or len(loader)

        def batches(epoch):
            loader.set_epoch(epoch)
            yield from loader

    # ---- state / resume ----
    sample = synthetic_batch(cfg, 1, train=True)
    s_inputs, _ = split_inputs_targets(sample)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(cfg.seed),
        {k: jnp.asarray(v) for k, v in s_inputs.items()}, iters_per_epoch,
    )
    start_epoch = 0
    if args.backbone_init:
        state = load_backbone_init(state, args.backbone_init)
        logger.info(f"backbone initialized from {args.backbone_init}")
    if args.continue_train:
        restored = ckpt_util.restore_snapshot(
            model_dir,
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step},
        )
        if restored is not None:
            state = state.replace(
                params=restored["params"], batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"], step=restored["step"],
            )
            start_epoch = restored["epoch"] + 1
            logger.info(f"resumed from epoch {restored['epoch']}")

    mesh = make_mesh()
    state_sh = None
    if args.zero != "off":
        from hoisdf_tpu.parallel.zero import shard_state

        state, state_sh = shard_state(
            state, mesh, shard_params=args.zero == "fsdp"
        )
        logger.info(f"sharded train state over the mesh ({args.zero})")
    train_step = make_train_step(
        cfg, model, mano, donate_state=True, state_shardings=state_sh
    )
    eval_step = make_eval_step(cfg, model, mano)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    host_rng = np.random.default_rng(cfg.seed + 2)

    tot_timer, step_timer = Timer(), Timer()

    # Lagged loss fetch (see the dispatch note in the loop): a small window
    # of on-device loss trees; checked loss_lag steps late.
    import collections

    loss_lag = 4
    loss_window: "collections.deque" = collections.deque()
    total = float("nan")

    def _check_finite(l_epoch, l_itr, l_losses) -> float:
        """Host-fetch a lagged step's losses; on non-finite, dump the
        diagnostic snapshot (post-update state, ADVICE r2) and die."""
        t = float(l_losses["total"])
        if np.isfinite(t):
            return t
        crash = {k: float(v) for k, v in l_losses.items()}
        logger.error(
            f"non-finite loss at epoch {l_epoch} itr {l_itr} "
            f"(detected {loss_lag} steps late): {crash}"
        )
        crash_dir = os.path.join(model_dir, "crash_postupdate_diagnostic")
        ckpt_util.save_snapshot(
            crash_dir, l_epoch,
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step},
        )
        with open(os.path.join(crash_dir, "CRASH.json"), "w") as f:
            json.dump(
                {"epoch": l_epoch, "itr": l_itr, "losses": crash,
                 "note": "state captured post-update and up to "
                         f"{loss_lag} steps past the NaN; use the last "
                         "regular snapshot to resume"},
                f, indent=2,
            )
        raise FloatingPointError(f"non-finite training loss: {crash}")

    with mesh:
        for epoch in range(start_epoch, cfg.end_epoch):
            for itr, batch_np in enumerate(batches(epoch)):
                tot_timer.tic()
                batch_ratio = itr / max(iters_per_epoch, 1)
                use_pre, dist_range = presample_gate(
                    cfg, epoch, batch_ratio, float(host_rng.random())
                )
                inputs, targets = split_inputs_targets(batch_np)
                if cfg.transfer_dtype == "uint8":
                    # u8 wire: 3.9x fewer host->device bytes, decoded
                    # bit-exactly inside the jitted step (ops/wire.py).
                    inputs, targets = wire.encode_batch(inputs, targets)
                inputs = shard_batch(inputs, mesh)
                targets = shard_batch(targets, mesh)
                step_timer.tic()
                state, losses = train_step(
                    state, inputs, targets, rng, jnp.asarray(dist_range),
                    use_presampled=use_pre,
                )
                # Pipelined dispatch: never block on THIS step's loss.  The
                # remote-TPU tunnel costs ~29 ms per synchronous round trip
                # (docs/PERFORMANCE.md); fetching the loss a few steps late
                # lets JAX's async dispatch overlap RPC with device compute,
                # the same trick that took eval from 306->413 f/s.  The NaN
                # check just lags loss_lag steps (the crash snapshot was
                # already post-update/diagnostic-only).
                loss_window.append((epoch, itr, losses))
                if len(loss_window) > loss_lag:
                    total = _check_finite(*loss_window.popleft())
                step_timer.toc()
                if itr % 400 == 0:
                    writer.add_scalars(
                        int(state.step), {f"train_{k}": v for k, v in losses.items()}
                    )
                tot_timer.toc()
                logger.info(
                    "Epoch %d/%d itr %d/%d: speed %.2f(%.2f)s/itr %.2fh/epoch "
                    "loss[-%d] %.4f"
                    % (epoch, cfg.end_epoch, itr, iters_per_epoch,
                       tot_timer.average_time, step_timer.average_time,
                       tot_timer.average_time * iters_per_epoch / 3600,
                       loss_lag, total)
                )
            while loss_window:  # epoch boundary: drain the lagged checks
                total = _check_finite(*loss_window.popleft())

            save_gap = 1 if epoch >= cfg.point_sampling_epoch else 5
            if epoch % save_gap == 0 or epoch == cfg.end_epoch - 1:
                ckpt_util.save_snapshot(
                    model_dir, epoch,
                    {"params": state.params, "batch_stats": state.batch_stats,
                     "opt_state": state.opt_state, "step": state.step},
                )
                logger.info(f"snapshot saved at epoch {epoch}")
                if args.synthetic:
                    ev = Evaluator(cfg, mano)
                    eb = synthetic_batch(cfg, 2, seed=999, train=False)
                    e_in, e_tg = split_inputs_targets(eb)
                    preds = eval_step(
                        state.params, state.batch_stats,
                        {k: jnp.asarray(v) for k, v in e_in.items()},
                    )
                    templates = jnp.asarray(
                        np.random.RandomState(0).randn(2, 100, 3).astype(np.float32)
                        * 0.05
                    )
                    ev.feed(preds, e_tg, e_in, templates)
                    dump_debug_images(
                        os.path.join(out_root, "debug_images"), int(state.step),
                        preds, e_tg, writer=writer,
                    )
                elif (
                    cfg.dataset == "dexycb" and cfg.annotation_dir
                    and jax.process_count() == 1
                ):
                    # Real eval-during-training (main/train.py:164-557 /
                    # common/base.py Evaler): same params, eval-mode forward.
                    # Single-process only: metrics aggregate in host Python
                    # and the eval step feeds host-local arrays — on a pod
                    # (--multihost) skip it and run evaluate.py on process 0
                    # against a saved snapshot instead (docs/SCALING.md).
                    from hoisdf_tpu.data.dexycb import DexYCBDataset
                    from hoisdf_tpu.data.meshes import load_object_library
                    from hoisdf_tpu.data.dexycb import YCB_CLASSES

                    eval_ds = DexYCBDataset(cfg, "test", mano_model, mano_left=mano_left, seed=cfg.seed)
                    # drop_last=False like the reference's Evaler
                    # (common/base.py:205-211); the tail batch is padded to
                    # the static jit shape and trimmed before metrics.
                    # Explicitly UNSHARDED: this is a single-host monitoring
                    # pass over the full test split.
                    eval_loader = DataLoader(
                        eval_ds, cfg.eval_batch_size, shuffle=False,
                        num_workers=cfg.num_data_workers, drop_last=False,
                        shard_id=0, num_shards=1,
                    )
                    meshes, _, _ = load_object_library(
                        cfg.simple_object_models_dir or "", YCB_CLASSES,
                        mesh_file="textured_simple_2000.obj",
                    ) if cfg.simple_object_models_dir else ({}, {}, {})
                    ev = Evaluator(cfg, mano)
                    from hoisdf_tpu.data.loader import pad_batch, trim_batch

                    for eval_itr, eb in enumerate(eval_loader):
                        e_in, e_tg = split_inputs_targets(eb)
                        valid = int(next(iter(e_in.values())).shape[0])
                        if valid < cfg.eval_batch_size:
                            e_in = pad_batch(e_in, cfg.eval_batch_size)
                            e_tg = pad_batch(e_tg, cfg.eval_batch_size)
                        e_dev = (wire.encode_inputs(e_in)
                                 if cfg.transfer_dtype == "uint8" else e_in)
                        preds = eval_step(
                            state.params, state.batch_stats,
                            {k: jnp.asarray(v) for k, v in e_dev.items()
                             if k != "obj_cls"},
                        )
                        if valid < cfg.eval_batch_size:
                            preds = trim_batch(preds, valid)
                            e_in = trim_batch(e_in, valid)
                            e_tg = trim_batch(e_tg, valid)
                        if eval_itr == 0:
                            # Debug-image grids during REAL training, matching
                            # the reference's TensorBoard dumps
                            # (main/train.py:302-440).
                            dump_debug_images(
                                os.path.join(out_root, "debug_images"),
                                int(state.step), preds, e_tg, writer=writer,
                            )
                        if meshes:
                            templates = jnp.asarray(np.stack(
                                [meshes[int(c)] for c in e_in["obj_cls"]]
                            ))
                            ev.feed(preds, e_tg, e_in, templates)
                    writer.add_scalars(
                        int(state.step),
                        {k: v / max(ev.total, 1) for k, v in ev.results.items()},
                    )
                    logger.info(
                        "eval: "
                        + " ".join(
                            f"{k}={v / max(ev.total, 1):.3f}"
                            for k, v in ev.results.items()
                        )
                    )

    logger.info("training done")


if __name__ == "__main__":
    main()
