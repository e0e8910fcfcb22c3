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
import os
import sys

import numpy as np

REFERENCE = os.environ.get("HOISDF_REFERENCE", "/root/reference")


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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="tests/golden")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    _gen_mano(args.out)
    _gen_grid_sample(args.out)
    _gen_mha(args.out)
    _gen_sdf_decoder(args.out)
    _gen_rotations(args.out)
    _gen_transformer(args.out)


if __name__ == "__main__":
    main()
