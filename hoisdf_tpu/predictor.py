"""Serving API: load a checkpoint once, predict hand+object pose per batch.

A production-facing wrapper the reference lacks (its only entry points are
the train/test scripts): jitted eval forward + MANO head, fixed batch shape
with automatic padding, per-call latency stats.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.config import Config, get_config
from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
from hoisdf_tpu.mano.layer import ManoBuffers
from hoisdf_tpu.mano.model import load_mano_npz, make_synthetic_mano
from hoisdf_tpu.models.hoisdf import build_model
from hoisdf_tpu.train import make_eval_step
from hoisdf_tpu.utils import checkpoint as ckpt_util
from hoisdf_tpu.utils.profiling import StepStats

INPUT_KEYS = (
    "img", "cam_intr", "mano_root", "obj_center_cam", "bbox_hand", "bbox_obj",
)


class Predictor:
    """Fixed-batch jitted predictor.

    Inputs per frame: img [H,W,3] float in [0,1] (the eval crop), cam_intr
    [3,3], mano_root [3] (hand root in camera space), obj_center_cam [3],
    bbox_hand/bbox_obj [4].  Outputs: MANO joints/verts (root-relative,
    metres), aggregated vote joints, object rot (axis-angle) and relative
    translation.
    """

    def __init__(
        self,
        cfg: Optional[Config] = None,
        ckpt_dir: Optional[str] = None,
        batch_size: int = 8,
    ):
        self.cfg = cfg or get_config(
            "dexycb", sdf_infer_mode="hier", compute_dtype="bfloat16"
        )
        self.batch_size = batch_size
        self.model = build_model(self.cfg)
        mano_model = (
            load_mano_npz(self.cfg.mano_model_path)
            if self.cfg.mano_model_path else make_synthetic_mano(0)
        )
        self.mano = ManoBuffers.from_model(mano_model)

        sample = synthetic_batch(self.cfg, batch_size, train=False)
        inputs, _ = split_inputs_targets(sample)
        self._template = {
            k: jnp.asarray(v) for k, v in inputs.items() if k in INPUT_KEYS
        }
        variables = self.model.init(
            {"params": jax.random.PRNGKey(0)}, self._template,
            use_presampled=False, train=False, supervise_sdf=False,
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        if ckpt_dir:
            restored = ckpt_util.restore_snapshot(
                ckpt_dir,
                {"params": self.params, "batch_stats": self.batch_stats,
                 "opt_state": None, "step": 0},
            )
            if restored is None:
                raise FileNotFoundError(f"no snapshot under {ckpt_dir}")
            self.params = restored["params"]
            self.batch_stats = restored["batch_stats"]
        # Serving never has GT SDF sample points; disable that branch.
        self._eval_step = make_eval_step(
            self.cfg, self.model, self.mano, supervise_sdf=False
        )
        self.stats = StepStats()

    def warmup(self) -> None:
        jax.block_until_ready(
            self._eval_step(self.params, self.batch_stats, self._template)
        )

    def predict(self, frames: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """frames: dict of per-frame arrays with leading dim N <= batch_size
        (padded internally).  Returns numpy outputs trimmed to N."""
        n = frames["img"].shape[0]
        if n > self.batch_size:
            raise ValueError(f"batch {n} > predictor batch {self.batch_size}")
        batch = {}
        for k in INPUT_KEYS:
            if k not in frames and k in self._template:
                batch[k] = self._template[k]
                continue
            v = np.asarray(frames[k])
            if n < self.batch_size:
                pad = np.repeat(v[-1:], self.batch_size - n, axis=0)
                v = np.concatenate([v, pad], axis=0)
            batch[k] = jnp.asarray(v)
        with self.stats.measure():
            preds = self._eval_step(self.params, self.batch_stats, batch)
            jax.block_until_ready(preds)
        return {k: np.asarray(v)[:n] for k, v in preds.items()}

    def latency_summary(self) -> Dict[str, float]:
        return self.stats.summary()
