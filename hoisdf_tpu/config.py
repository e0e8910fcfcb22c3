"""Declarative configuration for the HOISDF-TPU framework.

Replaces the reference's import-time mutable singleton (``main/config.py:38-197``)
with a frozen dataclass.  Four named presets mirror the reference ``setting``
strings: ``ho3d``, ``ho3d_render``, ``dexycb``, ``dexycb_full``
(``main/config.py:39-97``).  No import-time side effects, no sys.path edits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # ---- preset identity ----------------------------------------------------
    setting: str = "dexycb"
    dataset: str = "dexycb"  # "ho3d" | "dexycb"

    # ---- paths (None => synthetic fixtures; mirrors main/config.py:46-58) ---
    object_models_dir: Optional[str] = None
    simple_object_models_dir: Optional[str] = None
    annotation_dir: Optional[str] = None
    data_dir: Optional[str] = None
    fast_data_dir: Optional[str] = None
    image_fast_path: Optional[str] = None
    output_dir: str = "outputs"
    mano_model_path: Optional[str] = None  # npz produced by tools/convert_mano_pkl.py
    # LEFT-hand MANO npz: DexYCB's left-hand flip path converts PCA poses
    # with the left basis (data/dexycb.py:99-110,433-459); without it those
    # samples would silently use the right basis.
    mano_left_path: Optional[str] = None

    # ---- batch sizes (main/config.py:60-62) ---------------------------------
    train_batch_size: int = 22
    test_batch_size: int = 22
    eval_batch_size: int = 22

    # ---- point sampling (main/config.py:64-69) -------------------------------
    num_samp_hand: int = 600
    num_samp_obj: int = 200
    points_filter_dist: float = 0.05
    test_seg_thresh: float = 0.1
    random_ratio: Tuple[float, ...] = (0.3, 0.7)
    random_move_dist: Tuple[float, ...] = (0.03, 0.05, 0.07)

    # ---- dataset-specific (main/config.py:70-85) -----------------------------
    add_render: bool = False
    small_dexycb: bool = True
    obj_depth_mean_value: Optional[float] = None
    hand_sdf_scale: float = 3.1
    obj_sdf_scale: float = 3.1
    hand_cls_dist: float = 0.04
    obj_cls_dist: float = 0.05

    # ---- SDF field config (main/config.py:87-92) ------------------------------
    bins_n: int = 64
    num_class: int = 6
    point_feat_size: int = 33  # 30-d NeRF enc + xyz
    classifier_branch: bool = False
    clamping_distance: float = 0.15

    # ---- model (main/config.py:94-122) ----------------------------------------
    use_big_decoder: bool = False
    use_inverse_kinematics: bool = False
    resnet_type: int = 50
    multiscale_layers: Tuple[str, ...] = (
        "stride2",
        "stride4",
        "stride8",
        "stride16",
        "stride32",
    )
    input_img_shape: Tuple[int, int] = (256, 256)
    output_hm_shape: Tuple[int, int, int] = (128, 128, 128)
    sigma: float = 2.5 / 2

    hidden_dim: int = 256
    dropout: float = 0.1
    nheads: int = 4
    dim_feedforward: int = 1024
    enc_layers: int = 6
    dec_layers: int = 4
    pre_norm: bool = False

    mano_num_queries: int = 17  # 15 finger + 1 global + 1 shape
    mano_shape_indx: int = 16

    # ---- optimization (main/config.py:128-134) --------------------------------
    # from-scratch init parity (main/model.py:668-679, applied :744-750)
    reference_init: bool = True
    end_epoch: int = 70
    point_sampling_epoch: int = 40
    lr: float = 1e-4
    lr_decay_gamma: float = 0.7
    lr_drop: int = 9  # step every N epochs
    lr_floor: float = 1e-5  # common/base.py:30-32

    # ---- loss weights (main/config.py:136-151) --------------------------------
    sdf_hand_weight: float = 50.0
    sdf_obj_weight: float = 25.0
    sdf_cls_weight: float = 10.0
    hm_weight: float = 100 / 100000
    joint_weight: float = 1 / 10
    cls_weight: float = 1.0
    obj_hm_weight: float = 1.0
    obj_rot_weight: float = 0.7
    obj_trans_weight: float = 100.0
    lambda_verts3d: float = 1e4
    lambda_joints3d: float = 1e4
    lambda_manopose: float = 10.0
    lambda_manoshape: float = 0.1
    mano_lambda_regulshape: float = 1e-6

    # ---- test config ----------------------------------------------------------
    eval_mesh: bool = False

    # ---- TPU-native knobs (no reference equivalent) ---------------------------
    compute_dtype: str = "float32"  # "bfloat16" for the TPU hot path
    # "full"  = exact masked 64^3 lattice scan  (parity w/ main/model.py:246-355)
    # "coarse2fine" = 16^3 coarse pass + top-cell refinement (faster, ~same pts)
    # "hier"  = multi-level cell-subdivision cascade (hier_levels; 2.25x fewer
    #           SDF evals than coarse2fine at the defaults)
    #
    # DEFAULT = "hier" (round 4): the production cascade is oracle-gated
    # against the dense scan (ops/selection_quality.py; overlap@K >= 0.995
    # at full 64^3/K=600 scale) and is what every promoted perf number
    # measures.  The reference always runs its sampler at eval
    # (main/model.py:246-355); ours always runs the fast one.  Parity
    # tests / golden generation opt into "full" explicitly.
    sdf_infer_mode: str = "hier"
    sdf_infer_chunk: int = 32768  # lattice points per scan step in "full" mode
    coarse_bins: int = 16
    coarse_keep_cells: int = 512
    # (cell_factor, keep) cascade for sdf_infer_mode="hier".
    #
    # Default-levels decision (round 3, revised after the bbox-edge cell-
    # visibility fix in ops/point_sampling.py::_cell_overlaps_bbox): the
    # 3-level ((8,128),(4,224),(2,448)) cascade PASSES the dense-scan-oracle
    # quality gate (ops/selection_quality.py) at the full 64^3 / K=600
    # production scale on stress geometry, worst-case over seeds 3/5/7:
    # overlap@K 0.995, mean|sdf| ratio 1.0002 — at 6,912 probes/field vs
    # 10,240 for the previous ((4,256),(2,512)) default (which post-fix is
    # oracle-EXACT, overlap 1.0, and remains the conservative choice via
    # --cfg).  Same-session TPU A/B (scripts/ab_eval.py, batch 22):
    # 422 f/s vs 340 f/s for the 2-level default, p50 3.86 vs 4.30 ms.
    # ((8,96),(4,192),(2,384)) (5,888 probes, overlap 0.963) and
    # ((8,128),(4,208),(2,416)) (6,528, 0.983) also pass the >=0.95 gate but
    # sit below the committed >=0.99 bar; ((8,112),(4,176),(2,352)) FAILS.
    # Gate + table: tests/test_point_sampling.py::
    # test_hier_levels_full_scale_quality_gate, `bench_components.py
    # --selection-quality`, scripts/levels_sweep.py.
    #
    # HISTORICAL: (2, 1024) used to trigger a TPU kernel fault (UNAVAILABLE)
    # when the cascade was fused with the backbone+decoder graph at batch 22
    # (rounds 1-2; the empirical cap was 896).  The round-3 retest with the
    # ORIGINAL graph pinned (tools/repro_fused_fault.py, stablehlo
    # fingerprint ff670482d9d2a369) ran CLEAN — the fault is gone on the
    # current jax/libtpu, so large keeps are allowed again (they just lose
    # on probe count; the promoted defaults sit far below the old cap).
    hier_levels: tuple = ((8, 128), (4, 224), (2, 448))
    # Object-field cascade override.  The object sampler keeps only
    # num_samp_obj=200 points (vs 600 for the hand, main/config.py:88-89),
    # so its keeps shrink at equal selection quality — though NOT
    # proportionally to K: the scene's near-surface cell count binds, so
    # the K=200 quality cliff sits at ~5.1k probes, not at K/3 of the hand
    # cascade.  Default-decision record (round 3, K=200 oracle gate via
    # scripts/levels_sweep.py --num-points 200, worst case over seeds
    # 3/5/7): ((8,104),(4,184),(2,368)) = 5,760 probes is the cheapest
    # ORACLE-EXACT setting (overlap@200 = 1.0 on every stress scene);
    # ((8,96),(4,176),(2,352)) (5,504) holds 0.995, ((8,96),(4,160),
    # (2,320)) (5,120) drops to 0.985, cheaper settings fail the gate.
    # Same-session TPU A/B vs the shared default (batch 22, 2 rounds):
    # 441.9/438.6 vs 420.2/418.4 f/s, p50 3.74 vs 4.00 ms — +5%.
    # None = share hier_levels.  The opt-in paired_sdf_infer cascade folds
    # both fields into one group and always uses the shared hier_levels.
    # GATING: this default's evidence covers K = num_samp_obj <= 200 only
    # (exactness at 200 implies exactness below it); if num_samp_obj is
    # raised past 200 while this field is at the stock value, construction
    # normalizes it to None = share hier_levels (see __post_init__) — a
    # non-stock override is honored at any K (the user owns its gating).
    hier_levels_obj: tuple | None = ((8, 104), (4, 184), (2, 368))
    # Fused Pallas SDF-MLP kernel inside sdf_infer (TPU only; the training
    # path keeps the flax module for grads + dropout).
    fused_sdf_infer: bool = True
    # Nearest-texel feature gather for the dense *selection* stage only
    # (4x fewer gathered bytes; final token features stay bilinear-exact).
    infer_gather_nearest: bool = False
    # Fold the hand+obj hier cascades into ONE grouped cascade
    # (models/hoisdf.py::sdf_infer_pair): pyramid gathers / token projection
    # run once on [B, 2M] merged points per stage instead of twice on
    # [B, M]; per-group selection is exactly identical to two separate
    # cascades.  hier mode only (other modes ignore it).
    # MEASURED DEAD END for eval throughput (same-session A/B, batch 22):
    # with merged_field_queries it is 326.6 f/s vs 340.4 for two separate
    # cascades — merging doubles the per-stage tensor sizes without cutting
    # dispatch count, and XLA already overlaps the two small cascades.
    paired_sdf_infer: bool = False
    # Token features + cross-field queries off ONE merged [B, Ph+Po] pyramid
    # gather (models/hoisdf.py::token_and_cross_queries): the cross queries
    # sample at the same camera points as the token features, so the 4
    # sampling passes (and their backward scatter-adds) collapse to 1.
    # Applies to every branch (eval + both train branches).  Default-
    # decision record (round 3): measured ALONE it is a consistent eval
    # win — same-session TPU A/B at batch 22: 430.2/424.3 vs 420.2/418.4
    # f/s (+1.8%), and +1.5% stacked on hier_levels_obj (450.0/451.0 vs
    # 444.8/443.2).  The earlier "dead end" reading only ever measured it
    # COMBINED with paired_sdf_infer (326.6 f/s) — the loss was paired's.
    merged_field_queries: bool = True
    # TPU-hardware approx_max_k for the hier cascade's *pruning* stages
    # (recall 0.95 on the conservative keep-set; the final point top-K stays
    # exact lax.top_k).
    approx_selection_topk: bool = False
    # Route pyramid levels with 256 < H*W <= this onto the MXU via the
    # chunked one-hot matmul (ops/grid_sample.py::
    # grid_sample_bilinear_matmul_chunked; exact bilinear).  1024 moves the
    # stride8 level off the gather unit; 0 keeps it on lax.gather.  TPU
    # backends only (models/hoisdf.py gates it — the formulation loses on
    # CPU, which has no MXU): measured 418.1 vs 412.3 f/s (p50 3.60 vs
    # 3.68 ms) same-session A/B at the default eval point.  4096 (stride4
    # = 16 einsum chunks) is a MEASURED DEAD END: 347-349 vs 418-420 f/s
    # same-session A/B — the chunk loop's one-hot construction overtakes
    # the gather it replaces.  1024 is the sweet spot; do not raise.
    gather_chunked_max_table: int = 1024
    mesh_axis_data: str = "data"
    num_data_workers: int = 15
    # Loader worker pool kind.  Measured (scripts/bench_loader.py, production
    # shapes): 63.5 samples/s/core single-caller, 77% of per-sample time in
    # GIL-releasing C extensions -> Amdahl caps THREAD scaling at ~4.4x one
    # core (~200-280 samples/s), under 2x the 147.9 f/s train step.
    # "process" (fork-inherited ProcessPoolExecutor, the reference's choice —
    # common/base.py:83 uses 15 processes) scales with cores instead; use it
    # for production multi-epoch training on many-core hosts.  The pool
    # forks once, eagerly, in DataLoader.__init__ — construct the loader
    # before jit compiles / TPU dispatches (train_loop's order does).
    data_worker_mode: str = "thread"
    # Host image backend: "auto" uses the native C++ fused pipeline
    # (hoisdf_tpu/native: decode+warp+blur+jitter+normalize in one GIL-free
    # call; geometric/eval results bit-identical to PIL, train photometrics
    # within a few LSB — tests/test_native_pipeline.py) when the library
    # builds, else PIL.  "on" requires it, "off" forces the PIL path (the
    # parity-golden source of truth).  With the native path the per-sample
    # GIL-held fraction drops enough that data_worker_mode="thread" scales
    # with cores (docs/PERFORMANCE.md input-pipeline table).
    native_pipeline: str = "auto"
    # Host->device wire format for the train/eval loops' input batches
    # (ops/wire.py).  "uint8" ships the image as raw bytes (LUT-normalized
    # on device, bit-identical to the host f32 — the Predictor's proven
    # transfer_dtype trick) and the binary seg masks as u8: ~3.9x fewer
    # wire bytes per train batch (17.3 MB img + 2.9 MB segs -> 5.2 MB at
    # batch 22).  Lossless for all built-in datasets (images are u8-source,
    # masks binary; non-binary masks fall back to f32 automatically).
    # Default stays f32 = the parity wire; flip on when input transfer is
    # the bottleneck (remote-attached chips, many-host input pipelines) —
    # measured tables in docs/PERFORMANCE.md "Train/eval input wire".
    transfer_dtype: str = "float32"
    seed: int = 0

    @property
    def multiscale_dim(self) -> int:
        # main/config.py:101-108
        if self.use_big_decoder:
            return 128 + 256 + 512 + 1024 + 2048
        return 32 + 64 + 128 + 256 + 512

    def __post_init__(self):
        if self.transfer_dtype not in ("float32", "uint8"):
            raise ValueError(
                f"transfer_dtype {self.transfer_dtype!r} not in "
                "('float32', 'uint8')"
            )
        # The stock hier_levels_obj is oracle-gated at K=num_samp_obj<=200
        # only (see its field comment): past the gate, the un-gated stock
        # keeps must not silently apply, so normalize to None = share the
        # hand-grade hier_levels.  Done HERE (every construction path,
        # incl. dataclasses.replace) rather than at trace time in the
        # model, so cfg.hier_levels_obj always means what the model runs.
        stock = type(self).__dataclass_fields__["hier_levels_obj"].default
        if self.hier_levels_obj == stock and self.num_samp_obj > 200:
            import warnings

            warnings.warn(
                f"num_samp_obj={self.num_samp_obj} exceeds the stock "
                "hier_levels_obj quality gate (K<=200); falling back to the "
                "shared hier_levels cascade. Override hier_levels_obj "
                "explicitly to keep a per-object cascade at this K.",
                stacklevel=2,
            )
            object.__setattr__(self, "hier_levels_obj", None)

    @property
    def nerf_num_freqs(self) -> int:
        return (self.point_feat_size - 3) // 6  # = 5


# The shrunken model used by every `--synthetic` smoke path (evaluate,
# make_standin_ckpt, CI): small enough to compile on the 1-CPU host in
# seconds while exercising every module.  Tools that must agree on the
# model *structure* (e.g. a stand-in checkpoint later fed to
# `evaluate --synthetic`) must all draw from this one dict.
SYNTHETIC_TINY_OVERRIDES = dict(
    resnet_type=18, hidden_dim=64, dim_feedforward=128, enc_layers=2,
    dec_layers=2, num_samp_hand=32, num_samp_obj=16,
    input_img_shape=(64, 64), output_hm_shape=(32, 32, 32), bins_n=16,
    sdf_infer_chunk=2048, use_big_decoder=False,
)


def get_config(setting: str = "dexycb", **overrides) -> Config:
    """Build a preset config; mirrors main/config.py:39-97 derivations."""
    if setting not in ("ho3d", "ho3d_render", "dexycb", "dexycb_full"):
        raise ValueError(f"unknown setting {setting!r}")
    dataset = "ho3d" if "ho3d" in setting else "dexycb"
    base = dict(
        setting=setting,
        dataset=dataset,
        use_big_decoder=(setting == "ho3d"),
        use_inverse_kinematics=(setting == "ho3d_render"),
        eval_mesh=(setting == "dexycb_full"),
    )
    if dataset == "ho3d":
        base.update(
            add_render=("render" in setting),
            obj_depth_mean_value=0.5244322,
        )
    else:
        base.update(small_dexycb=("full" not in setting))
    base.update(overrides)
    # JSON-sourced overrides (--cfg KEY=[..]) deliver arrays as lists;
    # Config rides jit as a static argument, so every field must stay
    # hashable — normalize (nested) lists to tuples.
    def _tup(v):
        return tuple(_tup(x) for x in v) if isinstance(v, list) else v

    return Config(**{k: _tup(v) for k, v in base.items()})


def parse_cfg_overrides(pairs) -> dict:
    """Parse repeatable CLI ``--cfg KEY=VALUE`` items; VALUE is JSON with a
    plain-string fallback (so paths need no quoting)."""
    import json

    out = {}
    for item in pairs:
        key, _, raw = item.partition("=")
        try:
            out[key] = json.loads(raw)
        except json.JSONDecodeError:
            out[key] = raw
    return out
