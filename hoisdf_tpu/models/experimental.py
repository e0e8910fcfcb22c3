"""Experimental model variants kept OUT of the core forward.

Everything here is opt-in, measured, and currently a performance dead end on
the production configuration — preserved behind this module boundary (with
parity tests) so the core model surface stays small.  Promote a function back
into ``models/hoisdf.py`` only with fresh A/B evidence (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hoisdf_tpu.ops.grid_sample import (
    multiscale_point_features,
    pixels_to_grid,
    project_points,
)
from hoisdf_tpu.ops.nerf import nerf_positional_encoding
from hoisdf_tpu.ops.pallas.sdf_mlp import fold_weight_norm, sdf_mlp_fused
from hoisdf_tpu.ops.point_sampling import (
    scaled_to_cam,
    sdf_guided_sample_hierarchical,
)


def paired_sdf_infer(
    model, pyramid, mano_root, obj_center, cam_intr, bbox_hand, bbox_obj,
    *, train=False,
):
    """Hand + object field-guided sampling as ONE grouped hier cascade.

    Opt-in via ``cfg.paired_sdf_infer``; measured dead end on the promoted
    per-field defaults (-4% eval, 326.6 vs 340.4 f/s — docs/PERFORMANCE.md
    round-3 ledger), kept for configs where a single shared cascade wins.

    The two fields share every image-level input (pyramid, intrinsics),
    so their cascades are folded together: the batch axis carries both
    groups b-major ([b0·hand, b0·obj, b1·hand, ...]) for the selection
    glue (bbox test, per-group top-K, base subdivision), while the field
    query merges the groups along the POINT axis — every pyramid gather,
    ``linear_sdfin`` projection and posenc runs once on [B, 2M] points
    instead of twice on [B, M].  Only the final SDF MLP splits (the two
    decoders have different weights).  Both groups run the SHARED
    ``hier_levels`` (the batch-folded stage tensors need one static
    keep per stage), so a conflicting ``hier_levels_obj`` is rejected
    at trace time — set it to None to opt into pairing.  With that
    constraint, per-group probes, scores and top-K are exactly those
    of two separate ``sdf_infer`` calls (parity: tests/
    test_model_variants.py::test_paired_sampler_parity); the object
    group's K points are the first ``num_samp_obj`` of the shared
    best-first ordering, identical to its own top-K.

    Replaces the reference's two sequential no-grad sampling passes
    (main/model.py:455-463) on the production hier path.

    ``model`` is the bound HOISDF module instance (called from inside
    apply/init, so submodule access through it is live).
    """
    c = model.cfg
    if c.hier_levels_obj not in (None, c.hier_levels):
        raise ValueError(
            "paired_sdf_infer folds both fields into one cascade and "
            "cannot honor a per-field hier_levels_obj="
            f"{c.hier_levels_obj!r}; set hier_levels_obj=None (or equal "
            "to hier_levels) to use the paired sampler"
        )
    b = mano_root.shape[0]

    if model.is_initializing():
        # Materialize both decoders' params outside the cascade
        # (flax cannot create params inside lax control flow).
        dummy = jnp.zeros((b, 1, 3), mano_root.dtype)
        model.sdf_forward(
            pyramid, dummy, mano_root, cam_intr, c.hand_sdf_scale,
            "hand", train=train, clamp=False,
        )
        model.sdf_forward(
            pyramid, dummy, obj_center, cam_intr, c.obj_sdf_scale,
            "obj", train=train, clamp=False,
        )

    use_fused = (
        c.fused_sdf_infer
        and not model.is_initializing()
        and jax.default_backend() in ("tpu", "axon")
    )
    folded = {
        "hand": jax.lax.stop_gradient(
            fold_weight_norm(model.hand_sdf_decoder.variables["params"])
        ),
        "obj": jax.lax.stop_gradient(
            fold_weight_norm(model.obj_sdf_decoder.variables["params"])
        ),
    } if use_fused else None

    centers = jnp.stack([mano_root, obj_center], axis=1).reshape(2 * b, 3)
    bboxes = jnp.stack([bbox_hand, bbox_obj], axis=1).reshape(2 * b, 4)
    scales = jnp.tile(
        jnp.asarray([c.hand_sdf_scale, c.obj_sdf_scale], jnp.float32), b
    )
    cam2 = jnp.repeat(cam_intr, 2, axis=0)

    def sdf_fn(pts):  # [2B, M, 3] b-major -> [2B, M]
        m = pts.shape[1]
        cam_pts = scaled_to_cam(pts, centers, scales)
        merged_cam = cam_pts.reshape(b, 2 * m, 3)
        merged_scaled = pts.reshape(b, 2 * m, 3)
        pix = project_points(merged_cam, cam_intr)
        grid = jax.lax.stop_gradient(pixels_to_grid(pix, c.input_img_shape))
        feats = multiscale_point_features(
            pyramid, grid, c.multiscale_layers,
            nearest=c.infer_gather_nearest, slice_gather=True,
            chunked_max_table=model._chunked_table(),
        )
        points_fea = model.linear_sdfin(feats)
        posenc = nerf_positional_encoding(merged_scaled, c.nerf_num_freqs)
        dec_in = jnp.concatenate(
            [points_fea.astype(jnp.float32), posenc, merged_scaled], axis=-1
        )
        if model.compute_dt is not None:
            dec_in = dec_in.astype(model.compute_dt)
        halves = dec_in.reshape(b, 2, m, dec_in.shape[-1])
        outs = []
        for g, which in enumerate(("hand", "obj")):
            flat = halves[:, g].reshape(b * m, -1)
            if use_fused:
                # Whole sampler is no-grad (main/model.py:463); sever at
                # the kernel inputs to keep the Pallas call (no VJP rule)
                # out of the autodiff graph.
                flat = jax.lax.stop_gradient(flat)
                sdf = sdf_mlp_fused(flat, folded[which]).astype(jnp.float32)
            else:
                decoder = (
                    model.hand_sdf_decoder if which == "hand"
                    else model.obj_sdf_decoder
                )
                sdf, _ = decoder(flat, train=train)
                sdf = sdf.astype(jnp.float32)
            outs.append(sdf.reshape(b, m))
        return jnp.stack(outs, axis=1).reshape(2 * b, m)

    k = max(c.num_samp_hand, c.num_samp_obj)
    points, sdf = sdf_guided_sample_hierarchical(
        sdf_fn, centers, cam2, bboxes,
        sdf_scale=scales, num_points=k, bins_n=c.bins_n,
        levels=c.hier_levels, clamp=c.clamping_distance,
        approx_topk=c.approx_selection_topk,
    )
    points = jax.lax.stop_gradient(points).reshape(b, 2, k, 3)
    sdf = jax.lax.stop_gradient(sdf).reshape(b, 2, k, 1)
    hand_points = points[:, 0, : c.num_samp_hand]
    obj_points = points[:, 1, : c.num_samp_obj]
    hand_sdf = sdf[:, 0, : c.num_samp_hand]
    obj_sdf = sdf[:, 1, : c.num_samp_obj]
    hand_posenc = nerf_positional_encoding(hand_points, c.nerf_num_freqs)
    obj_posenc = nerf_positional_encoding(obj_points, c.nerf_num_freqs)
    return (
        (hand_points, hand_sdf, hand_posenc),
        (obj_points, obj_sdf, obj_posenc),
    )
