"""HOISDF: global-SDF-guided hand+object pose estimation (full model).

Parity target: ``main/model.py:28-665``.  The network is a pure flax module
returning predictions; losses (hoisdf_tpu/losses.py) and the MANO head
(models/mano_head.py) compose with it inside the train/eval steps — JAX-side
replacement for the reference's loss-fused forward, which exists there only to
ride DataParallel.

Branch structure (reference main/model.py:427-481): point acquisition is
either (a) jittered ground-truth-near points (train, p<0.4 or warm-up epochs)
or (b) field-guided sampling from the predicted SDF (eval; 60% of train iters
after epoch 40).  The branch flag is a *static* argument — two compiled
variants — because the two graphs differ structurally (SURVEY.md §7 hard
part c).

TPU notes: everything static-shaped; the detached feature-gather grid
(reference ``grids.detach()``) becomes ``stop_gradient``; the field-guided
sampler is the batched masked-lattice scan in ops/point_sampling.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from hoisdf_tpu.config import Config
from hoisdf_tpu.models.decoder import Decoder, DecoderBig
from hoisdf_tpu.models.resnet import ResNetBackbone
from hoisdf_tpu.models.sdf_decoder import SDFDecoder
from hoisdf_tpu.models.transformer import (
    Transformer,
    VoteTransformer,
    get_mano_memory_mask,
    get_mano_tgt_mask,
    get_manoshape_memory_mask,
)
from hoisdf_tpu.ops.grid_sample import (
    multiscale_point_features,
    pixels_to_grid,
    project_points,
)
from hoisdf_tpu.ops.nerf import nerf_positional_encoding
from hoisdf_tpu.ops.pallas.sdf_mlp import fold_weight_norm, sdf_mlp_fused
from hoisdf_tpu.ops.point_sampling import (
    scaled_to_cam,
    sdf_guided_sample,
    sdf_guided_sample_coarse2fine,
    sdf_guided_sample_hierarchical,
)


class MLP(nn.Module):
    """Plain ReLU MLP mirroring common/nets/layer.py:168-202.

    ``features`` lists every layer's output dim (hidden dims + final).
    """

    features: Sequence[int]
    relu_last: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < len(self.features) - 1 or self.relu_last:
                x = nn.relu(x)
        return x


def sdf_attention_weight(sdf: jax.Array, beta: jax.Array) -> jax.Array:
    """Learned SDF->attention weighting sigma = sigmoid(s/beta)/beta
    (main/model.py:123-126).  The reference projects beta to >=2e-3 in-place
    each call; here the clamp is applied functionally at use."""
    b = jnp.maximum(beta, 2e-3)
    return jax.nn.sigmoid(sdf / b) / b


class HOISDF(nn.Module):
    cfg: Config
    bn_axis: Optional[str] = None

    def setup(self):
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype) if c.compute_dtype != "float32" else None
        self.compute_dt = dt
        self.backbone = ResNetBackbone(c.resnet_type, self.bn_axis, dt)
        self.decoder_net = (
            DecoderBig(self.bn_axis, dt) if c.use_big_decoder
            else Decoder(self.bn_axis, dt)
        )
        self.hand_sdf_decoder = SDFDecoder(
            c.hidden_dim, c.point_feat_size, use_classifier=c.classifier_branch,
            dtype=dt,
        )
        self.obj_sdf_decoder = SDFDecoder(
            c.hidden_dim, c.point_feat_size, use_classifier=c.classifier_branch,
            dtype=dt,
        )
        self.hand_transformer = Transformer(
            c.hidden_dim, c.nheads, c.enc_layers, c.dec_layers,
            c.dim_feedforward, c.dropout, dt,
        )
        self.obj_transformer = VoteTransformer(
            c.hidden_dim, c.nheads, c.enc_layers // 2, c.dim_feedforward,
            c.dropout, dt,
        )
        out_dim = c.hidden_dim - c.point_feat_size  # 223: room for posenc+xyz
        self.linear_transformerin = MLP((1024, 512, 256, out_dim), relu_last=True, dtype=dt)
        self.linear_sdfin = MLP((512, c.hidden_dim), relu_last=True, dtype=dt)
        self.hand_sigmoid_beta = self.param(
            "hand_sigmoid_beta", nn.initializers.constant(0.1), (1,)
        )
        self.obj_sigmoid_beta = self.param(
            "obj_sigmoid_beta", nn.initializers.constant(0.1), (1,)
        )
        n_queries = 1 if c.use_inverse_kinematics else c.mano_num_queries
        self.mano_query_embed = self.param(
            "mano_query_embed",
            nn.initializers.normal(1.0),
            (n_queries, c.hidden_dim),
        )
        if not c.use_inverse_kinematics:
            self.linear_pose = MLP((c.hidden_dim, c.hidden_dim, 6), dtype=dt)
        self.linear_shape = MLP((c.hidden_dim, c.hidden_dim, 10), dtype=dt)
        self.linear_handvote = MLP((c.hidden_dim,) * 3 + (20 * 3,), dtype=dt)
        self.linear_handcls = MLP((c.hidden_dim, c.hidden_dim, 20), dtype=dt)
        self.linear_obj_rel_trans = MLP((c.hidden_dim, c.hidden_dim, 3), dtype=dt)
        self.linear_obj_rot = MLP((c.hidden_dim, c.hidden_dim, 3), dtype=dt)
        # NOTE: the reference also constructs linear_objvote / linear_objcls
        # but never calls them (main/model.py:86-87; SURVEY.md "dead heads");
        # they are intentionally omitted here.

    # ---- field queries -------------------------------------------------------

    def _chunked_table(self) -> int:
        """cfg.gather_chunked_max_table, active on MXU backends only — the
        chunked one-hot matmul loses to lax.gather on CPU (no MXU), so CPU
        runs (and the test suite) stay on the gather unit.  Results are
        exact either way (ops/grid_sample.py)."""
        return (
            self.cfg.gather_chunked_max_table
            if jax.default_backend() in ("tpu", "axon") else 0
        )

    def _gather_grid(self, points_scaled, center, cam_intr, sdf_scale):
        """Scaled-frame points -> detached [-1,1] sampling grid + camera pts
        (main/model.py:145-157 / 190-198; grids are detached there)."""
        cam_pts = points_scaled / sdf_scale + center[:, None, :]
        pix = project_points(cam_pts, cam_intr)
        grid = pixels_to_grid(pix, self.cfg.input_img_shape)
        return jax.lax.stop_gradient(grid), cam_pts

    def point_transformer_features(
        self, pyramid, points_scaled, center, cam_intr, sdf_scale
    ):
        """Pixel-aligned 223-d token features (main/model.py:145-179)."""
        grid, cam_pts = self._gather_grid(points_scaled, center, cam_intr, sdf_scale)
        feats = multiscale_point_features(
            pyramid, grid, self.cfg.multiscale_layers,
            chunked_max_table=self._chunked_table(),
        )
        return self.linear_transformerin(feats), cam_pts

    def _sdf_decoder_inputs(
        self, pyramid, points_scaled, center, cam_intr, sdf_scale,
        nearest: bool = False, slice_gather: bool = False,
    ):
        """Assemble the flat [B*P, 289] decoder inputs + posenc."""
        c = self.cfg
        grid, _ = self._gather_grid(points_scaled, center, cam_intr, sdf_scale)
        feats = multiscale_point_features(
            pyramid, grid, c.multiscale_layers, nearest=nearest,
            slice_gather=slice_gather,
            chunked_max_table=self._chunked_table(),
        )
        points_fea = self.linear_sdfin(feats)
        posenc = nerf_positional_encoding(points_scaled, c.nerf_num_freqs)
        dec_in = jnp.concatenate(
            [points_fea.astype(jnp.float32), posenc, points_scaled], axis=-1
        )
        if self.compute_dt is not None:
            dec_in = dec_in.astype(self.compute_dt)
        return dec_in.reshape(-1, dec_in.shape[-1]), posenc

    def sdf_forward(
        self, pyramid, points_scaled, center, cam_intr, sdf_scale, which,
        *, train=False, clamp=True,
    ):
        """SDF field query at arbitrary scaled-frame points
        (main/model.py:181-244).  Returns (sdf [B,P,1], class logits, posenc)."""
        c = self.cfg
        flat, posenc = self._sdf_decoder_inputs(
            pyramid, points_scaled, center, cam_intr, sdf_scale
        )
        decoder = self.hand_sdf_decoder if which == "hand" else self.obj_sdf_decoder
        sdf, cls = decoder(flat, train=train)
        sdf = sdf.reshape(*points_scaled.shape[:2], 1).astype(jnp.float32)
        if clamp:
            sdf = jnp.clip(sdf, -c.clamping_distance, c.clamping_distance)
        if cls is not None:
            cls = cls.reshape(*points_scaled.shape[:2], c.num_class)
        return sdf, cls, posenc

    def sdf_infer(
        self, pyramid, center, cam_intr, bbox, sdf_scale, num_points, which,
        *, train=False,
    ):
        """Batched field-guided sampling (replaces main/model.py:246-355).

        Reference runs this under no_grad; stop_gradient reproduces that."""
        c = self.cfg

        if self.is_initializing():
            # Materialize the field-query params outside the scan body:
            # flax cannot create params inside lax.scan during init.
            dummy = jnp.zeros((center.shape[0], 1, 3), center.dtype)
            self.sdf_forward(
                pyramid, dummy, center, cam_intr, sdf_scale, which,
                train=train, clamp=False,
            )

        decoder = self.hand_sdf_decoder if which == "hand" else self.obj_sdf_decoder
        use_fused = (
            c.fused_sdf_infer
            and not self.is_initializing()
            and jax.default_backend() in ("tpu", "axon")
        )
        folded = (
            jax.lax.stop_gradient(fold_weight_norm(decoder.variables["params"]))
            if use_fused else None
        )

        def sdf_fn(pts):  # [B, C, 3] -> [B, C]; raw sdf like the reference sort
            if use_fused:
                flat, _ = self._sdf_decoder_inputs(
                    pyramid, pts, center, cam_intr, sdf_scale,
                    nearest=c.infer_gather_nearest, slice_gather=True,
                )
                # The whole sampler is no-grad (reference main/model.py:463);
                # severing gradients at the kernel INPUTS keeps the Pallas
                # call (which has no VJP rule) out of the autodiff graph.
                flat = jax.lax.stop_gradient(flat)
                sdf = sdf_mlp_fused(flat, folded).astype(jnp.float32)
                return sdf.reshape(pts.shape[0], pts.shape[1])
            sdf, _, _ = self.sdf_forward(
                pyramid, pts, center, cam_intr, sdf_scale, which,
                train=train, clamp=False,
            )
            return sdf[..., 0]

        if c.sdf_infer_mode == "coarse2fine":
            points, sdf = sdf_guided_sample_coarse2fine(
                sdf_fn, center, cam_intr, bbox,
                sdf_scale=sdf_scale, num_points=num_points, bins_n=c.bins_n,
                coarse_factor=c.bins_n // c.coarse_bins,
                keep_cells=c.coarse_keep_cells, clamp=c.clamping_distance,
            )
        elif c.sdf_infer_mode == "hier":
            # hier_levels_obj=None means "share the hand cascade"; the
            # K>200 quality-gate fallback happens at config construction
            # (Config.__post_init__), so the field here is authoritative.
            use_obj_levels = which == "obj" and c.hier_levels_obj is not None
            levels = c.hier_levels_obj if use_obj_levels else c.hier_levels
            points, sdf = sdf_guided_sample_hierarchical(
                sdf_fn, center, cam_intr, bbox,
                sdf_scale=sdf_scale, num_points=num_points, bins_n=c.bins_n,
                levels=levels, clamp=c.clamping_distance,
                approx_topk=c.approx_selection_topk,
            )
        else:
            points, sdf = sdf_guided_sample(
                sdf_fn, center, cam_intr, bbox,
                sdf_scale=sdf_scale, num_points=num_points, bins_n=c.bins_n,
                chunk=c.sdf_infer_chunk, clamp=c.clamping_distance,
            )
        points = jax.lax.stop_gradient(points)
        sdf = jax.lax.stop_gradient(sdf)
        posenc = nerf_positional_encoding(points, c.nerf_num_freqs)
        return points, sdf, posenc

    def sdf_infer_pair(
        self, pyramid, mano_root, obj_center, cam_intr, bbox_hand, bbox_obj,
        *, train=False,
    ):
        """Opt-in grouped hand+obj cascade (cfg.paired_sdf_infer) — a
        measured dead end on the promoted defaults (-4% eval), so the
        implementation lives behind the experimental module boundary.
        See models/experimental.py::paired_sdf_infer for the full design
        notes and parity guarantees."""
        from hoisdf_tpu.models.experimental import paired_sdf_infer

        return paired_sdf_infer(
            self, pyramid, mano_root, obj_center, cam_intr,
            bbox_hand, bbox_obj, train=train,
        )

    def token_and_cross_queries(
        self, pyramid, hand_points, obj_points, mano_root, obj_center,
        cam_intr, *, train=False,
    ):
        """Token features + cross-field SDF queries off ONE merged gather.

        The reference runs four pyramid-sampling passes here (hand tokens,
        obj tokens, hand-in-obj-field, obj-in-hand-field;
        main/model.py:145-179 + 495-518).  But the cross queries sample at
        the SAME camera points as the token features — the reference's
        scaled-frame round trip ``((cam - c)·s)/s + c`` reproduces the same
        pixels up to fp rounding — so the gathered features can be reused
        outright, and the two token gathers merge along the point axis.
        One [B, Ph+Po] gather (and one backward scatter-add) replaces four.

        Returns everything the token-assembly stage consumes.
        """
        c = self.cfg
        ph = hand_points.shape[1]
        hand_cam = scaled_to_cam(hand_points, mano_root, c.hand_sdf_scale)
        obj_cam = scaled_to_cam(obj_points, obj_center, c.obj_sdf_scale)
        merged_cam = jnp.concatenate([hand_cam, obj_cam], axis=1)
        pix = project_points(merged_cam, cam_intr)
        grid = jax.lax.stop_gradient(pixels_to_grid(pix, c.input_img_shape))
        feats = multiscale_point_features(
            pyramid, grid, c.multiscale_layers,
            chunked_max_table=self._chunked_table(),
        )  # [B, Ph+Po, sum(C_l)] — grad path (custom-VJP slice gather)

        tok = self.linear_transformerin(feats)
        hand_fea, obj_fea = tok[:, :ph], tok[:, ph:]

        # Cross-field queries, reusing the merged gather.  The *_notrans
        # frames reproduce the reference's self-annotated "# bug" (unscaled
        # cross frames, main/model.py:498,508) for checkpoint parity.
        hand_o_points = (hand_cam - obj_center[:, None, :]) * c.obj_sdf_scale
        obj_h_points = (obj_cam - mano_root[:, None, :]) * c.hand_sdf_scale
        cross_fea = self.linear_sdfin(feats)
        hand_o_posenc = nerf_positional_encoding(hand_o_points, c.nerf_num_freqs)
        obj_h_posenc = nerf_positional_encoding(obj_h_points, c.nerf_num_freqs)

        def cross_sdf(fea, posenc, pts, decoder):
            dec_in = jnp.concatenate(
                [fea.astype(jnp.float32), posenc, pts], axis=-1
            )
            if self.compute_dt is not None:
                dec_in = dec_in.astype(self.compute_dt)
            sdf, _ = decoder(dec_in.reshape(-1, dec_in.shape[-1]), train=train)
            sdf = sdf.reshape(*pts.shape[:2], 1).astype(jnp.float32)
            return jnp.clip(sdf, -c.clamping_distance, c.clamping_distance)

        hand_o_sdf = cross_sdf(
            cross_fea[:, :ph], hand_o_posenc, hand_o_points,
            self.obj_sdf_decoder,
        )
        obj_h_sdf = cross_sdf(
            cross_fea[:, ph:], obj_h_posenc, obj_h_points,
            self.hand_sdf_decoder,
        )
        return (
            hand_fea, obj_fea, hand_cam, obj_cam,
            hand_o_sdf, hand_o_posenc, obj_h_sdf, obj_h_posenc,
        )

    # ---- full forward --------------------------------------------------------

    def __call__(
        self,
        batch: Dict[str, jax.Array],
        *,
        use_presampled: bool = False,
        dist_range: float = 0.0,
        train: bool = False,
        supervise_sdf: bool = True,
    ) -> Dict[str, Any]:
        c = self.cfg
        out: Dict[str, Any] = {}

        mano_root = batch["mano_root"]
        obj_center = batch["obj_center_cam"]
        cam_intr = batch["cam_intr"]

        img = batch["img"]
        if self.compute_dt is not None:
            img = img.astype(self.compute_dt)
        img_feat, skips = self.backbone(img, train=train)
        pyramid, heads = self.decoder_net(img_feat, skips, train=train)
        out["decoder_heads"] = heads.astype(jnp.float32)

        if supervise_sdf:
            # SDF supervision at the dataset's sampled points (model.py:370-401)
            hand_sdf_pred, hand_cls_logits, _ = self.sdf_forward(
                pyramid, batch["hand_sdf_points"], mano_root, cam_intr,
                c.hand_sdf_scale, "hand", train=train,
            )
            obj_sdf_pred, obj_cls_logits, _ = self.sdf_forward(
                pyramid, batch["obj_sdf_points"], obj_center, cam_intr,
                c.obj_sdf_scale, "obj", train=train,
            )
            out["hand_sdf_pred"] = hand_sdf_pred
            out["obj_sdf_pred"] = obj_sdf_pred
            if hand_cls_logits is not None:
                # ClassifierBranch (main/model.py:236-239): part-class logits
                # at the supervised hand points.  (The sampler's selected-point
                # cls output is captured-then-discarded in the reference,
                # main/model.py:464 — not propagated here.)
                out["hand_cls_logits"] = hand_cls_logits.astype(jnp.float32)
                out["obj_cls_logits"] = obj_cls_logits.astype(jnp.float32)

        # ---- token point acquisition (model.py:424-481) ----
        if use_presampled:
            rng = self.make_rng("sample_noise")
            r_h, r_o = jax.random.split(rng)
            hand_points = batch["hand_pre_points"] + jax.random.uniform(
                r_h, batch["hand_pre_points"].shape, minval=-dist_range,
                maxval=dist_range,
            )
            obj_points = batch["obj_pre_points"] + jax.random.uniform(
                r_o, batch["obj_pre_points"].shape, minval=-dist_range,
                maxval=dist_range,
            )
            hand_sdf, _, hand_posenc = self.sdf_forward(
                pyramid, hand_points, mano_root, cam_intr, c.hand_sdf_scale,
                "hand", train=train,
            )
            obj_sdf, _, obj_posenc = self.sdf_forward(
                pyramid, obj_points, obj_center, cam_intr, c.obj_sdf_scale,
                "obj", train=train,
            )
        elif c.sdf_infer_mode == "hier" and c.paired_sdf_infer:
            (hand_points, hand_sdf, hand_posenc), (
                obj_points, obj_sdf, obj_posenc,
            ) = self.sdf_infer_pair(
                pyramid, mano_root, obj_center, cam_intr,
                batch["bbox_hand"], batch["bbox_obj"], train=train,
            )
        else:
            hand_points, hand_sdf, hand_posenc = self.sdf_infer(
                pyramid, mano_root, cam_intr, batch["bbox_hand"],
                c.hand_sdf_scale, c.num_samp_hand, "hand", train=train,
            )
            obj_points, obj_sdf, obj_posenc = self.sdf_infer(
                pyramid, obj_center, cam_intr, batch["bbox_obj"],
                c.obj_sdf_scale, c.num_samp_obj, "obj", train=train,
            )

        sigma_hand = sdf_attention_weight(
            jax.lax.stop_gradient(hand_sdf), self.hand_sigmoid_beta
        )
        sigma_obj = sdf_attention_weight(
            jax.lax.stop_gradient(obj_sdf), self.obj_sigmoid_beta
        )

        if c.merged_field_queries:
            (
                hand_fea, obj_fea, hand_cam, obj_cam,
                hand_o_sdf, hand_o_posenc, obj_h_sdf, obj_h_posenc,
            ) = self.token_and_cross_queries(
                pyramid, hand_points, obj_points, mano_root, obj_center,
                cam_intr, train=train,
            )
            hand_points_notrans = hand_cam - mano_root[:, None, :]
            obj_points_notrans = obj_cam - obj_center[:, None, :]
            hand_o_points_notrans = hand_cam - obj_center[:, None, :]
            obj_h_points_notrans = obj_cam - mano_root[:, None, :]
        else:
            hand_fea, hand_cam = self.point_transformer_features(
                pyramid, hand_points, mano_root, cam_intr, c.hand_sdf_scale
            )
            hand_points_notrans = hand_cam - mano_root[:, None, :]
            obj_fea, obj_cam = self.point_transformer_features(
                pyramid, obj_points, obj_center, cam_intr, c.obj_sdf_scale
            )
            obj_points_notrans = obj_cam - obj_center[:, None, :]

            # Cross-field queries (model.py:495-518).  The *_notrans frames
            # reproduce the reference's self-annotated "# bug" (unscaled cross
            # frames, main/model.py:498,508) for checkpoint parity.
            hand_o_points = (hand_cam - obj_center[:, None, :]) * c.obj_sdf_scale
            hand_o_points_notrans = hand_cam - obj_center[:, None, :]
            hand_o_sdf, _, hand_o_posenc = self.sdf_forward(
                pyramid, hand_o_points, obj_center, cam_intr, c.obj_sdf_scale,
                "obj", train=train,
            )
            obj_h_points = (obj_cam - mano_root[:, None, :]) * c.hand_sdf_scale
            obj_h_points_notrans = obj_cam - mano_root[:, None, :]
            obj_h_sdf, _, obj_h_posenc = self.sdf_forward(
                pyramid, obj_h_points, mano_root, cam_intr, c.hand_sdf_scale,
                "hand", train=train,
            )
        sigma_hand_o = sdf_attention_weight(
            jax.lax.stop_gradient(hand_o_sdf), self.obj_sigmoid_beta
        )
        sigma_obj_h = sdf_attention_weight(
            jax.lax.stop_gradient(obj_h_sdf), self.hand_sigmoid_beta
        )

        # Token assembly (model.py:520-562): [xyz_rel ++ posenc ++ sigma*feat]
        hand_tokens = jnp.concatenate(
            [hand_points_notrans, hand_posenc, hand_fea * sigma_hand], axis=-1
        )
        obj_h_tokens = jnp.concatenate(
            [obj_h_points_notrans, obj_h_posenc, obj_fea * sigma_obj_h], axis=-1
        )
        hand_src = jnp.concatenate(
            [hand_tokens, jax.lax.stop_gradient(obj_h_tokens)], axis=1
        )
        obj_tokens = jnp.concatenate(
            [obj_points_notrans, obj_posenc, obj_fea * sigma_obj], axis=-1
        )
        hand_o_tokens = jnp.concatenate(
            [hand_o_points_notrans, hand_o_posenc, hand_fea * sigma_hand_o], axis=-1
        )
        obj_src = jnp.concatenate(
            [obj_tokens, jax.lax.stop_gradient(hand_o_tokens)], axis=1
        )
        if self.compute_dt is not None:
            hand_src = hand_src.astype(self.compute_dt)
            obj_src = obj_src.astype(self.compute_dt)
        pos = jnp.zeros_like(hand_src)

        if c.use_inverse_kinematics:
            tgt_mask = None
            memory_mask = get_manoshape_memory_mask(c.num_samp_hand, c.num_samp_obj)
        else:
            tgt_mask = get_mano_tgt_mask(c.mano_num_queries, c.mano_shape_indx)
            memory_mask = get_mano_memory_mask(
                c.mano_num_queries, c.num_samp_hand, c.num_samp_obj
            )

        hs, memory, hand_enc_out, attn_wts = self.hand_transformer(
            hand_src, pos, self.mano_query_embed, tgt_mask, memory_mask, train=train
        )
        obj_memory, obj_enc_out = self.obj_transformer(
            obj_src, jnp.zeros_like(obj_src), train=train
        )

        # Heads (model.py:586-604)
        f32 = lambda x: x.astype(jnp.float32)
        hand_enc_hand = hand_enc_out[:, :, : c.num_samp_hand]
        out["hand_off"] = f32(self.linear_handvote(hand_enc_hand))  # [L,B,600,60]
        out["hand_cls"] = f32(self.linear_handcls(hand_enc_hand))  # [L,B,600,20]
        obj_enc_obj = obj_enc_out[:, :, : c.num_samp_obj]
        out["obj_rot"] = f32(self.linear_obj_rot(obj_enc_obj))  # [L,B,200,3]
        out["obj_trans"] = f32(self.linear_obj_rel_trans(obj_enc_obj))

        if c.use_inverse_kinematics:
            out["mano_shape"] = f32(self.linear_shape(hs[:, :, 0]))  # [L,B,10]
        else:
            out["mano_pose6d"] = f32(self.linear_pose(
                hs[:, :, : c.mano_shape_indx]
            ))  # [L,B,16,6]
            out["mano_shape"] = f32(self.linear_shape(hs[:, :, c.mano_shape_indx]))

        out["hand_points_notrans"] = hand_points_notrans
        out["hand_points"] = hand_points
        out["obj_points"] = obj_points
        out["hand_sdf"] = hand_sdf
        out["obj_sdf"] = obj_sdf
        out["attn_wts"] = attn_wts
        return out


def build_model(cfg: Config, bn_axis: Optional[str] = None) -> HOISDF:
    return HOISDF(cfg=cfg, bn_axis=bn_axis)
