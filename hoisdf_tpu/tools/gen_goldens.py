"""Generate golden parity fixtures for the test suite.

Runs the *reference* PyTorch implementation (mounted read-only at
/root/reference) plus torch-core ops on synthetic inputs and dumps the results
to ``tests/golden/*.npz``.  The committed fixtures keep the test suite hermetic;
re-run this script only when the fixtures need to change and the reference is
available.

Usage:  python -m hoisdf_tpu.tools.gen_goldens [--out tests/golden]
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import tempfile
import types

import numpy as np

REFERENCE = os.environ.get("HOISDF_REFERENCE", "/root/reference")


@contextlib.contextmanager
def _chdir_tmp():
    """Import reference modules from a throwaway cwd: importing
    ``main.config`` creates an ``outputs/`` tree relative to cwd
    (main/config.py:194-197) which must not land in this repo."""
    prev = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        os.chdir(tmp)
        try:
            yield
        finally:
            os.chdir(prev)


def _patch_cuda_to_cpu():
    """The reference hardcodes .cuda() in metrics/IK paths
    (common/metrics.py:19,25, inverse_kinematics.py:23); run them on CPU."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]


def _install_torchvision_shim():
    """Provide ``torchvision.models.resnet`` (BasicBlock/Bottleneck/
    model_urls) — torchvision is not installed in this environment, and the
    reference backbone imports these (common/nets/resnet.py:9).  This is the
    standard public torchvision v1.5 residual-block layout (stride on the
    3x3 conv), written here independently."""
    if "torchvision.models.resnet" in sys.modules:
        return
    import torch.nn as nn

    def conv3x3(inp, outp, stride=1):
        return nn.Conv2d(inp, outp, 3, stride=stride, padding=1, bias=False)

    def conv1x1(inp, outp, stride=1):
        return nn.Conv2d(inp, outp, 1, stride=stride, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv1x1(inplanes, planes)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = conv3x3(planes, planes, stride)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = conv1x1(planes, planes * self.expansion)
            self.bn3 = nn.BatchNorm2d(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    model_urls = {
        f"resnet{n}": f"shim://resnet{n}" for n in (18, 34, 50, 101, 152)
    }

    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.model_urls = model_urls
    models_mod = types.ModuleType("torchvision.models")
    models_mod.resnet = resnet_mod
    tv_mod = types.ModuleType("torchvision")
    tv_mod.models = models_mod
    sys.modules["torchvision"] = tv_mod
    sys.modules["torchvision.models"] = models_mod
    sys.modules["torchvision.models.resnet"] = resnet_mod


def _install_open3d_shim():
    """Provide the two open3d entry points ``common/eval_util.py:104-123``
    uses: PointCloud + exact nearest-neighbour point-to-cloud distances."""
    if "open3d" in sys.modules:
        return

    class _PointCloud:
        def __init__(self):
            self.points = None

        def paint_uniform_color(self, _c):
            return self

        def compute_point_cloud_distance(self, other):
            a = np.asarray(self.points, dtype=np.float64)
            b = np.asarray(other.points, dtype=np.float64)
            d = np.sqrt(
                ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            ).min(axis=1)
            return d.tolist()

    o3d = types.ModuleType("open3d")
    o3d.geometry = types.SimpleNamespace(PointCloud=_PointCloud)
    o3d.utility = types.SimpleNamespace(
        Vector3dVector=lambda x: np.asarray(x, dtype=np.float64)
    )
    sys.modules["open3d"] = o3d


def _install_kornia_shim():
    """Provide ``kornia.geometry.conversions.rotation_matrix_to_axis_angle``
    (inverse_kinematics.py:9).  The conversion rotmat -> quaternion ->
    axis-angle is mathematically unique for non-degenerate rotations; this is
    the standard numerically-stable branching implementation."""
    if "kornia" in sys.modules:
        return
    import torch

    def rotation_matrix_to_axis_angle(R: "torch.Tensor") -> "torch.Tensor":
        # rotmat -> quaternion (wxyz), stable 4-branch form
        m = R
        t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]

        def _case(w2, x_, y_, z_, w_):
            s = torch.sqrt(torch.clamp(w2, min=1e-12)) * 2
            return torch.stack([w_ / s, x_ / s, y_ / s, z_ / s], dim=-1)

        q0 = _case(
            1 + t,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
            (1 + t),
        )
        q1 = _case(
            1 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
            (1 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2]),
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 2, 1] - m[..., 1, 2],
        )
        q2 = _case(
            1 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
            m[..., 0, 1] + m[..., 1, 0],
            (1 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2]),
            m[..., 1, 2] + m[..., 2, 1],
            m[..., 0, 2] - m[..., 2, 0],
        )
        q3 = _case(
            1 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            (1 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2]),
            m[..., 1, 0] - m[..., 0, 1],
        )
        cond1 = (m[..., 0, 0] > m[..., 1, 1]) & (m[..., 0, 0] > m[..., 2, 2])
        cond2 = m[..., 1, 1] > m[..., 2, 2]
        q = torch.where(
            (t > 0)[..., None],
            q0,
            torch.where(
                cond1[..., None], q1, torch.where(cond2[..., None], q2, q3)
            ),
        )
        q = q / q.norm(dim=-1, keepdim=True)
        # quaternion (wxyz) -> axis-angle, kornia's negative-w branch
        # (angle folded into (-pi, pi] rather than [0, 2pi))
        w, xyz = q[..., 0], q[..., 1:]
        sin_half = xyz.norm(dim=-1)
        angle = 2 * torch.where(
            w < 0, torch.atan2(-sin_half, -w), torch.atan2(sin_half, w)
        )
        small = sin_half < 1e-8
        scale = torch.where(
            small, torch.full_like(sin_half, 2.0), angle / sin_half.clamp(min=1e-12)
        )
        return xyz * scale[..., None]

    conv_mod = types.ModuleType("kornia.geometry.conversions")
    conv_mod.rotation_matrix_to_axis_angle = rotation_matrix_to_axis_angle
    geom_mod = types.ModuleType("kornia.geometry")
    geom_mod.conversions = conv_mod
    kornia_mod = types.ModuleType("kornia")
    kornia_mod.geometry = geom_mod
    sys.modules["kornia"] = kornia_mod
    sys.modules["kornia.geometry"] = geom_mod
    sys.modules["kornia.geometry.conversions"] = conv_mod


def _gen_mano(out_dir: str) -> None:
    """Golden: reference ManoLayer forward on the synthetic MANO model.

    Bypasses the chumpy .pkl load by injecting synthetic buffers directly
    (the license-gated MANO files are not redistributable).
    """
    import torch

    sys.path.insert(0, REFERENCE)
    from manopth.manopth.manolayer import ManoLayer as RefManoLayer

    from hoisdf_tpu.mano.model import make_synthetic_mano

    m = make_synthetic_mano(seed=0)

    layer = RefManoLayer.__new__(RefManoLayer)
    torch.nn.Module.__init__(layer)
    layer.center_idx = 0
    layer.robust_rot = False
    layer.rot = 3
    layer.flat_hand_mean = True
    layer.side = "right"
    layer.use_pca = False
    layer.joint_rot_mode = "axisang"
    layer.root_rot_mode = "axisang"
    layer.ncomps = 45
    layer.register_buffer("th_betas", torch.from_numpy(m.betas).unsqueeze(0))
    layer.register_buffer("th_shapedirs", torch.from_numpy(m.shapedirs))
    layer.register_buffer(
        "th_posedirs", torch.from_numpy(m.posedirs.reshape(778, 3, 135))
    )
    layer.register_buffer("th_v_template", torch.from_numpy(m.v_template).unsqueeze(0))
    layer.register_buffer("th_J_regressor", torch.from_numpy(m.j_regressor))
    layer.register_buffer("th_weights", torch.from_numpy(m.weights))
    layer.register_buffer("th_faces", torch.from_numpy(m.faces).long())
    layer.register_buffer(
        "th_hands_mean", torch.zeros(1, 45)
    )  # flat_hand_mean=True
    layer.register_buffer(
        "th_selected_comps", torch.from_numpy(m.hands_components)
    )
    layer.kintree_parents = [0] * 16

    rng = np.random.RandomState(42)
    pose = rng.randn(4, 48).astype(np.float32) * 0.5
    betas = rng.randn(4, 10).astype(np.float32) * 0.5

    with torch.no_grad():
        verts, joints = layer(
            th_pose_coeffs=torch.from_numpy(pose), th_betas=torch.from_numpy(betas)
        )
        # Template-shape variant (th_betas omitted -> model betas)
        verts_t, joints_t = layer(th_pose_coeffs=torch.from_numpy(pose))

    np.savez(
        os.path.join(out_dir, "mano_forward.npz"),
        pose=pose,
        betas=betas,
        verts=verts.numpy(),
        joints=joints.numpy(),
        verts_template=verts_t.numpy(),
        joints_template=joints_t.numpy(),
    )
    print("wrote mano_forward.npz")


def _gen_grid_sample(out_dir: str) -> None:
    """Golden: torch F.grid_sample (bilinear, border, align_corners=True)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    feats = rng.randn(2, 7, 16, 24).astype(np.float32)
    # Grid includes in-range and out-of-range coords to test border padding.
    grid = (rng.rand(2, 1, 50, 2).astype(np.float32) * 2.8 - 1.4)
    with torch.no_grad():
        out = F.grid_sample(
            torch.from_numpy(feats),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="border",
            align_corners=True,
        )
    np.savez(
        os.path.join(out_dir, "grid_sample.npz"),
        feats=feats,
        grid=grid,
        out=out.numpy(),
    )
    print("wrote grid_sample.npz")


def _gen_mha(out_dir: str) -> None:
    """Golden: torch nn.MultiheadAttention with explicit weights + masks."""
    import torch

    torch.manual_seed(3)
    d_model, nhead = 32, 4
    mha = torch.nn.MultiheadAttention(d_model, nhead, dropout=0.0)
    mha.eval()
    q = torch.randn(5, 2, d_model)  # [tgt, B, C]
    k = torch.randn(9, 2, d_model)
    v = torch.randn(9, 2, d_model)
    attn_mask = torch.zeros(5, 9, dtype=torch.bool)
    attn_mask[:, 6:] = True  # mask out last 3 keys (True = disallowed)
    with torch.no_grad():
        out, wts = mha(q, k, v, attn_mask=attn_mask)
    np.savez(
        os.path.join(out_dir, "mha.npz"),
        q=q.numpy(),
        k=k.numpy(),
        v=v.numpy(),
        attn_mask=attn_mask.numpy(),
        in_proj_weight=mha.in_proj_weight.detach().numpy(),
        in_proj_bias=mha.in_proj_bias.detach().numpy(),
        out_proj_weight=mha.out_proj.weight.detach().numpy(),
        out_proj_bias=mha.out_proj.bias.detach().numpy(),
        out=out.numpy(),
        wts=wts.numpy(),
    )
    print("wrote mha.npz")


def _gen_sdf_decoder(out_dir: str) -> None:
    """Golden: reference SDFDecoder (weight-norm DeepSDF MLP), eval mode."""
    import torch

    sys.path.insert(0, REFERENCE)
    from common.nets.sdf_net import SDFDecoder as RefSDFDecoder

    torch.manual_seed(7)
    dec = RefSDFDecoder(latent_size=256, point_feat_size=33, use_classifier=False)
    dec.eval()
    # Patch the cuda() call in the classifier-off return path.
    rng = np.random.RandomState(5)
    x = rng.randn(64, 289).astype(np.float32)
    with torch.no_grad():
        sdf = dec.forward_no_cuda(torch.from_numpy(x)) if hasattr(
            dec, "forward_no_cuda"
        ) else None
        if sdf is None:
            # Reference returns (sdf, torch.Tensor([0]).cuda()); run the body
            # manually to avoid the .cuda() on a CPU-only host.
            xh = torch.from_numpy(x)
            input_hand = xh
            for layer_i in range(0, dec.num_hand_layers - 1):
                lin = getattr(dec, "linh" + str(layer_i))
                if layer_i in dec.latent_in:
                    xh = torch.cat([xh, input_hand], 1)
                xh = lin(xh)
                if layer_i < dec.num_hand_layers - 2:
                    xh = dec.relu(xh)
            xh = dec.th(xh)
            sdf = xh[:, 0].unsqueeze(1)

    state = {k: v.detach().numpy() for k, v in dec.state_dict().items()}
    np.savez(os.path.join(out_dir, "sdf_decoder.npz"), x=x, sdf=sdf.numpy(), **state)
    print("wrote sdf_decoder.npz")


def _gen_rotations(out_dir: str) -> None:
    """Golden: reference rotation chain rot6d -> mat -> aa (mano_head.py)."""
    import torch

    sys.path.insert(0, REFERENCE)
    from common.nets import mano_head as ref

    rng = np.random.RandomState(11)
    x6d = rng.randn(37, 6).astype(np.float32)
    aa = rng.randn(37, 3).astype(np.float32) * 1.5
    with torch.no_grad():
        mats = ref.rot6d2mat(torch.from_numpy(x6d))
        aa_back = ref.mat2aa(mats)
        rod = ref.batch_rodrigues(torch.from_numpy(aa))
    np.savez(
        os.path.join(out_dir, "rotations.npz"),
        x6d=x6d,
        aa=aa,
        mats=mats.numpy(),
        aa_back=aa_back.numpy(),
        rodrigues=rod.numpy(),
    )
    print("wrote rotations.npz")


def _gen_transformer(out_dir: str) -> None:
    """Golden: the reference DETR transformer + vote transformer end-to-end
    (common/nets/transformer.py), small dims, eval mode, with the MANO masks."""
    import torch

    sys.path.insert(0, REFERENCE)
    from common.nets.transformer import Transformer as RefT
    from common.nets.transformer import VoteTransformer as RefVT

    torch.manual_seed(21)
    d, nh, ffn = 32, 4, 64
    n_hand, n_obj, n_q = 12, 4, 17
    model = RefT(
        d_model=d, nhead=nh, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=ffn, dropout=0.0, return_intermediate_dec=True,
    )
    model.eval()
    vote = RefVT(
        d_model=d, nhead=nh, num_encoder_layers=2, dim_feedforward=ffn,
        dropout=0.0, return_intermediate_dec=True,
    )
    vote.eval()

    src = torch.randn(n_hand + n_obj, 2, d)  # [S, B, C] seq-first
    pos = torch.zeros_like(src)
    query = torch.randn(n_q, d)
    tgt_mask = torch.zeros(n_q, n_q, dtype=torch.bool)
    tgt_mask[0, :] = True
    tgt_mask[0, 0] = False
    for i in range(5):
        s, e = 3 * i + 1, 3 * i + 4
        tgt_mask[s:e, :] = True
        tgt_mask[s:e, s:e] = False
    tgt_mask[16, :] = True
    tgt_mask[16, 16] = False
    memory_mask = torch.zeros(n_q, n_hand + n_obj, dtype=torch.bool)
    memory_mask[:, n_hand:] = True

    with torch.no_grad():
        hs, memory, inter, attn = model(
            src=src, mask=None, pos_embed=pos, src_mask=None,
            query_embed=query, tgt_mask=tgt_mask, memory_mask=memory_mask,
        )
        vmem, vinter = vote(src=src, mask=None, pos_embed=pos, src_mask=None)

    state = {f"t.{k}": v.numpy() for k, v in model.state_dict().items()}
    state.update({f"v.{k}": v.numpy() for k, v in vote.state_dict().items()})
    np.savez(
        os.path.join(out_dir, "transformer.npz"),
        src=src.numpy(), query=query.numpy(),
        tgt_mask=tgt_mask.numpy(), memory_mask=memory_mask.numpy(),
        hs=hs.numpy(), memory=memory.numpy(), inter=inter.numpy(),
        attn=torch.stack(attn).numpy(), vmem=vmem.numpy(),
        vinter=vinter.numpy(), **state,
    )
    print("wrote transformer.npz")


def _load_synth_weights(module, prefix: str):
    """Overwrite every param/buffer of a torch module with the deterministic
    per-key values from synth_weights; returns the serialized spec."""
    import torch

    from hoisdf_tpu.tools.synth_weights import spec_from_items, synth_value

    sd = module.state_dict()
    items = [
        (k, tuple(v.shape))
        for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
    ]
    spec = spec_from_items([(f"{prefix}.{k}", s) for k, s in items])
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            new_sd[k] = v
        else:
            new_sd[k] = torch.from_numpy(
                synth_value(f"{prefix}.{k}", tuple(v.shape))
            )
    module.load_state_dict(new_sd)
    return spec


def _gen_backbone_decoder(out_dir: str) -> None:
    """Golden: reference ResNet-50 backbone + BOTH decoder variants
    (common/nets/resnet.py:70-87, module.py:51-218) in eval mode on
    deterministic synthetic weights (see synth_weights.py) — the SURVEY §7
    step-4 exit criterion 'feature-pyramid parity <=1e-3'."""
    import torch

    _install_torchvision_shim()
    sys.path.insert(0, REFERENCE)
    with _chdir_tmp():
        from common.nets.module import Decoder as RefDecoder
        from common.nets.module import Decoder_big as RefDecoderBig
        from common.nets.resnet import ResNetBackbone as RefBackbone

        backbone = RefBackbone(50)
        dec = RefDecoder()  # cfg default setting is ho3d -> resnet_type 50
        big = RefDecoderBig()
    backbone.eval(), dec.eval(), big.eval()

    spec_backbone = _load_synth_weights(backbone, "backbone")
    spec_decoder = _load_synth_weights(dec, "decoder")
    spec_decoder_big = _load_synth_weights(big, "decoder_big")

    rng = np.random.RandomState(17)
    img = rng.rand(2, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        feat, skips = backbone(torch.from_numpy(img))
        pyr, heads = dec(feat, skips)
        pyr_b, heads_b = big(feat, skips)

    arrays = {
        "img": img,
        "feat": feat.numpy(),
        "dec_heads": heads.numpy(),
        "big_heads": heads_b.numpy(),
    }
    for s in (2, 4, 8, 16, 32):
        arrays[f"skip_stride{s}"] = skips[f"stride{s}"].numpy()
        arrays[f"dec_stride{s}"] = pyr[f"stride{s}"].numpy()
        arrays[f"big_stride{s}"] = pyr_b[f"stride{s}"].numpy()
    np.savez_compressed(
        os.path.join(out_dir, "backbone_decoder.npz"),
        spec_backbone=spec_backbone,
        spec_decoder=spec_decoder,
        spec_decoder_big=spec_decoder_big,
        **arrays,
    )
    print("wrote backbone_decoder.npz")


def _gen_losses(out_dir: str) -> None:
    """Golden: every reference loss term (common/nets/loss.py:14-171) on
    fixed synthetic preds/GT, plus the train-loop weighting constants
    (main/train.py:115-127, main/config.py:135-145)."""
    import torch

    sys.path.insert(0, REFERENCE)
    with _chdir_tmp():
        from common.nets.loss import (
            JointHeatmapLoss,
            JointvoteLoss,
            ManoLoss,
            ManoShapeLoss,
            SepSDFLoss,
        )
        from main.config import cfg as ref_cfg

    rng = np.random.RandomState(23)
    out = {}

    # JointHeatmapLoss (elementwise MSE; train loop .mean()s it)
    hm_pred = rng.randn(2, 3, 8, 8).astype(np.float32)
    hm_gt = rng.randn(2, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        hm_loss = (
            JointHeatmapLoss()(torch.from_numpy(hm_pred), torch.from_numpy(hm_gt))
            .mean()
            .item()
        )
    out.update(hm_pred=hm_pred, hm_gt=hm_gt, hm_loss=np.float32(hm_loss))

    # JointvoteLoss: reference layouts hand_off [L,P,B,J*3], hand_cls
    # [L,P,B,J] (loss.py:31-35); joints scattered near points so the 4 cm
    # membership gate (cfg.hand_cls_dist) has both members and non-members.
    l, p, b, j = 2, 16, 3, 20
    hand_points = (rng.rand(b, p, 3).astype(np.float32) - 0.5) * 0.2
    joint_gt = (
        hand_points[:, rng.randint(0, p, j), :] * 1000.0
        + rng.randn(b, j, 3).astype(np.float32) * 30.0
    ).astype(np.float32)
    hand_off = (rng.randn(l, p, b, j * 3).astype(np.float32) * 0.05)
    hand_cls = rng.randn(l, p, b, j).astype(np.float32)
    with torch.no_grad():
        l3d, lcls, lall, hand_joints = JointvoteLoss()(
            torch.from_numpy(hand_points),
            torch.from_numpy(hand_off),
            torch.from_numpy(hand_cls),
            torch.from_numpy(joint_gt),
        )
    out.update(
        hand_points=hand_points,
        joint_gt=joint_gt,
        hand_off=hand_off,
        hand_cls=hand_cls,
        loss_joint_3d=np.float32(l3d.item()),
        loss_joint_cls=np.float32(lcls.item()),
        loss_all_joint_3d=np.float32(lall.item()),
        hand_joints=hand_joints.numpy(),
        hand_cls_dist=np.float32(ref_cfg.hand_cls_dist),
    )

    # SepSDFLoss (L1, gts unsqueezed)
    hand_sdf = rng.randn(b, 12, 1).astype(np.float32) * 0.1
    obj_sdf = rng.randn(b, 7, 1).astype(np.float32) * 0.1
    hand_sdf_gt = rng.randn(b, 12).astype(np.float32) * 0.1
    obj_sdf_gt = rng.randn(b, 7).astype(np.float32) * 0.1
    with torch.no_grad():
        lh, lo = SepSDFLoss()(
            torch.from_numpy(hand_sdf),
            torch.from_numpy(obj_sdf),
            torch.from_numpy(hand_sdf_gt),
            torch.from_numpy(obj_sdf_gt),
        )
    out.update(
        hand_sdf=hand_sdf,
        obj_sdf=obj_sdf,
        hand_sdf_gt=hand_sdf_gt,
        obj_sdf_gt=obj_sdf_gt,
        sdfhand_loss=np.float32(lh.item()),
        sdfobj_loss=np.float32(lo.item()),
    )

    # ManoLoss with the model's lambdas (main/model.py:106-110 <- config)
    preds = {
        "verts3d": rng.randn(l, b, 24, 3).astype(np.float32) * 0.1,
        "joints3d": rng.randn(l, b, 21, 3).astype(np.float32) * 0.1,
        "mano_pose": rng.randn(l, b, 16 * 9).astype(np.float32),
        "mano_shape": rng.randn(l, b, 10).astype(np.float32),
    }
    gts = {
        "verts3d": rng.randn(b, 24, 3).astype(np.float32) * 0.1,
        "joints3d": rng.randn(b, 21, 3).astype(np.float32) * 0.1,
        "mano_pose": rng.randn(b, 16 * 9).astype(np.float32),
        "mano_shape": rng.randn(b, 10).astype(np.float32),
    }
    mano_loss_mod = ManoLoss(
        lambda_verts3d=ref_cfg.lambda_verts3d,
        lambda_joints3d=ref_cfg.lambda_joints3d,
        lambda_manopose=ref_cfg.lambda_manopose,
        lambda_manoshape=ref_cfg.lambda_manoshape,
    )
    with torch.no_grad():
        # GT leading dim broadcasts across decoder layers via
        # unsqueeze(0).expand (loss.py:101-123)
        mesh_l, joint_l, pose_l, shape_l, _, _ = mano_loss_mod(
            {k: torch.from_numpy(v) for k, v in preds.items()},
            {k: torch.from_numpy(v) for k, v in gts.items()},
        )
    out.update(
        mano_preds_verts3d=preds["verts3d"],
        mano_preds_joints3d=preds["joints3d"],
        mano_preds_pose=preds["mano_pose"],
        mano_preds_shape=preds["mano_shape"],
        mano_gts_verts3d=gts["verts3d"],
        mano_gts_joints3d=gts["joints3d"],
        mano_gts_pose=gts["mano_pose"],
        mano_gts_shape=gts["mano_shape"],
        mano_mesh_loss=np.float32(mesh_l.item()),
        mano_joint_loss=np.float32(joint_l.item()),
        pose_param_loss=np.float32(pose_l.item()),
        shape_param_loss=np.float32(shape_l.item()),
        lambda_verts3d=np.float32(ref_cfg.lambda_verts3d),
        lambda_joints3d=np.float32(ref_cfg.lambda_joints3d),
        lambda_manopose=np.float32(ref_cfg.lambda_manopose),
        lambda_manoshape=np.float32(ref_cfg.lambda_manoshape),
    )

    # ManoShapeLoss (the IK/ho3d_render head, loss.py:155-171)
    pred_shape = rng.randn(l, 10).astype(np.float32)
    gt_shape = rng.randn(10).astype(np.float32)
    shape_mod = ManoShapeLoss(
        lambda_manoshape=ref_cfg.lambda_manoshape,
        lambda_regulshape=ref_cfg.mano_lambda_regulshape,
    )
    with torch.no_grad():
        sp, sr = shape_mod(
            torch.from_numpy(pred_shape), torch.from_numpy(gt_shape)
        )
    out.update(
        shapeonly_pred=pred_shape,
        shapeonly_gt=gt_shape,
        shapeonly_param_loss=np.float32(sp.item()),
        shapeonly_reg_loss=np.float32(sr.item()),
        mano_lambda_regulshape=np.float32(ref_cfg.mano_lambda_regulshape),
    )

    # Train-loop weighting (main/train.py:115-127): synthetic scalar losses
    # -> weighted sum, with the exact config constants recorded.
    term_names = [
        "sdfhand_loss", "sdfobj_loss", "joint_heatmap", "obj_seg",
        "hand_seg", "obj_rot", "obj_trans", "loss_joint_3d",
        "loss_joint_cls", "loss_all_joint_3d",
    ]
    weights = {
        "sdfhand_loss": ref_cfg.sdf_hand_weight,
        "sdfobj_loss": ref_cfg.sdf_obj_weight,
        "joint_heatmap": ref_cfg.hm_weight,
        "obj_seg": ref_cfg.obj_hm_weight,
        "hand_seg": ref_cfg.obj_hm_weight,
        "obj_rot": ref_cfg.obj_rot_weight,
        "obj_trans": ref_cfg.obj_trans_weight,
        "loss_joint_3d": ref_cfg.joint_weight,
        "loss_joint_cls": ref_cfg.cls_weight,
        "loss_all_joint_3d": ref_cfg.joint_weight,
    }
    term_values = rng.rand(len(term_names)).astype(np.float64)
    weighted = float(
        sum(term_values[i] * weights[n] for i, n in enumerate(term_names))
    )
    out.update(
        weight_term_names=np.array(term_names),
        weight_term_values=term_values,
        weight_values=np.array([weights[n] for n in term_names], np.float64),
        weighted_total=np.float64(weighted),
    )

    np.savez(os.path.join(out_dir, "losses.npz"), **out)
    print("wrote losses.npz")


def _make_ref_mano_layer():
    """Reference ManoLayer on the synthetic MANO buffers (chumpy-free),
    matching _gen_mano's construction and ops/ik.py's solver settings
    (flat_hand_mean=True, right, use_pca=False, center_idx=0)."""
    import torch

    from manopth.manopth.manolayer import ManoLayer as RefManoLayer

    from hoisdf_tpu.mano.model import make_synthetic_mano

    m = make_synthetic_mano(seed=0)
    layer = RefManoLayer.__new__(RefManoLayer)
    torch.nn.Module.__init__(layer)
    layer.center_idx = 0
    layer.robust_rot = False
    layer.rot = 3
    layer.flat_hand_mean = True
    layer.side = "right"
    layer.use_pca = False
    layer.joint_rot_mode = "axisang"
    layer.root_rot_mode = "axisang"
    layer.ncomps = 45
    layer.register_buffer("th_betas", torch.from_numpy(m.betas).unsqueeze(0))
    layer.register_buffer("th_shapedirs", torch.from_numpy(m.shapedirs))
    layer.register_buffer(
        "th_posedirs", torch.from_numpy(m.posedirs.reshape(778, 3, 135))
    )
    layer.register_buffer(
        "th_v_template", torch.from_numpy(m.v_template).unsqueeze(0)
    )
    layer.register_buffer("th_J_regressor", torch.from_numpy(m.j_regressor))
    layer.register_buffer("th_weights", torch.from_numpy(m.weights))
    layer.register_buffer("th_faces", torch.from_numpy(m.faces).long())
    layer.register_buffer("th_hands_mean", torch.zeros(1, 45))
    layer.register_buffer(
        "th_selected_comps", torch.from_numpy(m.hands_components)
    )
    layer.kintree_parents = [0] * 16
    return layer


def _gen_ik(out_dir: str) -> None:
    """Golden: the reference analytic IK solver
    (common/utils/inverse_kinematics.py:15-150) on FK-generated joints."""
    import torch

    _patch_cuda_to_cpu()
    _install_kornia_shim()
    sys.path.insert(0, REFERENCE)
    import common.utils.inverse_kinematics as ref_ik

    # the solver constructs ManoLayer from license-gated pkls; inject the
    # synthetic-buffer layer instead (same stand-in as mano_forward.npz)
    ref_ik.ManoLayer = lambda **kw: _make_ref_mano_layer()

    layer = _make_ref_mano_layer()
    rng = np.random.RandomState(31)
    bsz = 4
    pose = rng.randn(bsz, 48).astype(np.float32) * 0.3
    shape = rng.randn(bsz, 10).astype(np.float32) * 0.5
    root = rng.randn(bsz, 1, 3).astype(np.float32) * 0.1
    with torch.no_grad():
        _, joints_mm = layer(
            th_pose_coeffs=torch.from_numpy(pose),
            th_betas=torch.from_numpy(shape),
        )
        pred_joints = joints_mm / 1000.0 + torch.from_numpy(root)
        res = ref_ik.ik_solver_mano(
            torch.from_numpy(shape), pred_joints.clone()
        )
    np.savez(
        os.path.join(out_dir, "ik.npz"),
        pred_joints=pred_joints.numpy(),
        mano_shape=shape,
        verts=res["verts"].numpy(),
        joints=res["joints"].numpy(),
        pose=res["pose"].numpy(),
        vis=res["vis"].numpy(),
    )
    print("wrote ik.npz")


def _gen_metrics(out_dir: str) -> None:
    """Golden: reference eval metrics — eval_batched_obj_direct dexycb + ho3d
    branches (common/metrics.py:116-185), eval_hand_joint (:213-232), and
    open3d F-score (common/eval_util.py:117-140)."""
    import torch

    _patch_cuda_to_cpu()
    _install_open3d_shim()
    sys.path.insert(0, REFERENCE)
    from common import metrics as ref_metrics
    from common.eval_util import calculate_fscore

    rng = np.random.RandomState(41)
    out = {}

    # --- eval_batched_obj_direct, dexycb branch (obj_cls = 1-based tensor)
    bsz, pts, nverts = 4, 6, 50
    templates = [
        {"verts": torch.from_numpy(rng.rand(nverts, 3).astype(np.float32) * 0.1)}
        for _ in range(3)
    ]
    obj_rot_out = rng.randn(bsz, pts, 3).astype(np.float32) * 0.5
    obj_trans_out = rng.randn(bsz, pts, 3).astype(np.float32) * 0.1
    gt_rot = rng.randn(bsz, 3).astype(np.float32) * 0.5
    gt_trans = rng.randn(bsz, 3).astype(np.float32) * 0.1
    obj_cls = np.array([1, 2, 3, 1], np.int64)
    with torch.no_grad():
        adds, mce, oce, mme, n = ref_metrics.eval_batched_obj_direct(
            {"obj_rot": torch.from_numpy(obj_rot_out),
             "obj_trans": torch.from_numpy(obj_trans_out)},
            {"obj_rot": torch.from_numpy(gt_rot),
             "rel_obj_trans": torch.from_numpy(gt_trans)},
            {"cam_intr": torch.eye(3).repeat(bsz, 1, 1),
             "obj_cls": torch.from_numpy(obj_cls)},
            templates, None, None,
        )
    out.update(
        obj_rot_out=obj_rot_out, obj_trans_out=obj_trans_out,
        gt_rot=gt_rot, gt_trans=gt_trans, obj_cls=obj_cls,
        templates=np.stack([t["verts"].numpy() for t in templates]),
        dexycb_ADDS=np.float64(adds), dexycb_MCE=np.float64(mce),
        dexycb_OCE=np.float64(oce), dexycb_n=np.int64(n),
    )

    # --- ho3d branch (string classes, pitcher_base excluded)
    obj_names = {i: name for i, name in enumerate(
        ["021_bleach_cleanser", "019_pitcher_base", "006_mustard_bottle"]
    )}
    ho3d_cls = ["021_bleach_cleanser", "019_pitcher_base",
                "006_mustard_bottle", "021_bleach_cleanser"]
    with torch.no_grad():
        adds_h, _, _, mme_h, n_h = ref_metrics.eval_batched_obj_direct(
            {"obj_rot": torch.from_numpy(obj_rot_out),
             "obj_trans": torch.from_numpy(obj_trans_out)},
            {"obj_rot": torch.from_numpy(gt_rot),
             "rel_obj_trans": torch.from_numpy(gt_trans)},
            {"cam_intr": torch.eye(3).repeat(bsz, 1, 1),
             "obj_cls": ho3d_cls},
            templates, None, obj_names,
        )
    out.update(
        ho3d_cls_ids=np.array(
            [list(obj_names.values()).index(c) for c in ho3d_cls], np.int64
        ),
        ho3d_used=np.array(
            [c != "019_pitcher_base" for c in ho3d_cls], bool
        ),
        ho3d_ADDS=np.float64(adds_h), ho3d_MME=np.float64(mme_h),
        ho3d_n=np.int64(n_h),
    )

    # --- eval_hand_joint (MJE / PA-MJE with Procrustes rigid_align)
    preds_joint = rng.randn(bsz, 21, 3).astype(np.float32) * 0.1
    gts_joint = (preds_joint + rng.randn(bsz, 21, 3).astype(np.float32) * 0.02)
    mje, pamje = ref_metrics.eval_hand_joint(
        torch.from_numpy(preds_joint), torch.from_numpy(gts_joint)
    )
    out.update(
        hand_pred=preds_joint, hand_gt=gts_joint,
        MJE=np.float64(mje), PAMJE=np.float64(pamje),
    )

    # --- F-score @ two thresholds (shimmed open3d = exact NN distances)
    gt_pts = rng.rand(60, 3).astype(np.float32) * 0.1
    pr_pts = gt_pts + rng.randn(60, 3).astype(np.float32) * 0.01
    f5, p5, r5 = calculate_fscore(gt_pts, pr_pts, th=0.005)
    f15, p15, r15 = calculate_fscore(gt_pts, pr_pts, th=0.015)
    out.update(
        fscore_gt=gt_pts, fscore_pred=pr_pts,
        f5=np.float64(f5), f15=np.float64(f15),
        p5=np.float64(p5), r5=np.float64(r5),
    )

    np.savez(os.path.join(out_dir, "metrics.npz"), **out)
    print("wrote metrics.npz")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="tests/golden")
    args = parser.parse_args()
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    _gen_mano(out)
    _gen_grid_sample(out)
    _gen_mha(out)
    _gen_sdf_decoder(out)
    _gen_rotations(out)
    _gen_transformer(out)
    _gen_backbone_decoder(out)
    _gen_losses(out)
    _gen_ik(out)
    _gen_metrics(out)


if __name__ == "__main__":
    main()
