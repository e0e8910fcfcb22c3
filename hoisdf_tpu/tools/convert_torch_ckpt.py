"""Convert reference PyTorch checkpoints to this framework's parameter trees.

Covers the full reference model state dict (``main/model.py:682-766`` module
tree, saved by ``common/base.py:113-118`` as snapshot_*.pth.tar with a
``network`` entry and DataParallel ``module.`` prefixes) plus torchvision
ImageNet ResNet state dicts for backbone init (``common/nets/resnet.py:89-98``).

Layout rules:
  conv      torch [O,I,Kh,Kw]    -> flax kernel [Kh,Kw,I,O]
  deconv    torch [I,O,Kh,Kw]    -> flax kernel [Kh,Kw,O,I] (transpose_kernel)
  linear    torch [O,I]          -> flax kernel [I,O]
  batchnorm weight/bias          -> scale/bias; running stats -> batch_stats
  weightnorm weight_g/_v/bias    -> g/v/bias (direct)
  MHA packed in_proj_weight/bias -> direct; out_proj.weight -> kernel.T

Intentionally skipped keys: the dead heads linear_objvote/linear_objcls and
the unused model-level norm1 (main/model.py:55,86-87); MANO buffers (th_*)
come from the ManoModel instead.

Usage:
    python -m hoisdf_tpu.tools.convert_torch_ckpt snapshot.pth.tar out_dir \
        --setting dexycb
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict, Tuple

import numpy as np

SKIP_PATTERNS = (
    r"^norm1\.",  # dead model-level LayerNorm (main/model.py:55)
    r"^linear_objvote\.",
    r"^linear_objcls\.",
    r"^mano_head\.mano_layer\.",  # MANO buffers supplied separately
    r"num_batches_tracked$",
)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # [I,O,Kh,Kw]->[Kh,Kw,O,I]


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _bn(params, stats, prefix: Tuple[str, ...], key: str, v: np.ndarray):
    if key == "weight":
        _set(params, prefix + ("scale",), v)
    elif key == "bias":
        _set(params, prefix + ("bias",), v)
    elif key == "running_mean":
        _set(stats, prefix + ("mean",), v)
    elif key == "running_var":
        _set(stats, prefix + ("var",), v)


def _map_backbone(params, stats, rest: str, v: np.ndarray) -> bool:
    """backbone_net.resnet.* -> backbone/* (common/nets/resnet.py layout)."""
    parts = rest.split(".")
    if parts[0] == "conv1":
        _set(params, ("backbone", "conv1", "kernel"), _conv_w(v))
    elif parts[0] == "bn1":
        _bn(params, stats, ("backbone", "bn1", "bn"), parts[1], v)
    elif parts[0].startswith("layer"):
        stage, block = parts[0], parts[1]
        base = ("backbone", f"{stage}_{block}")
        if parts[2].startswith("conv"):
            _set(params, base + (parts[2], "kernel"), _conv_w(v))
        elif parts[2].startswith("bn"):
            _bn(params, stats, base + (parts[2], "bn"), parts[3], v)
        elif parts[2] == "downsample":
            if parts[3] == "0":
                _set(params, base + ("downsample_conv", "kernel"), _conv_w(v))
            else:
                _bn(params, stats, base + ("downsample_bn", "bn"), parts[4], v)
        else:
            return False
    else:
        return False
    return True


_HEAD_RENAME = {"convOut_hm": "hm", "convOut_hand_seg": "hand_seg",
                "convOut_obj_seg": "obj_seg"}


def _map_decoder(params, stats, rest: str, v: np.ndarray, big: bool) -> bool:
    """decoder_net.resnet_decoder.* -> decoder_net/* (common/nets/module.py)."""
    parts = rest.split(".")
    name = parts[0]
    if name in _HEAD_RENAME:
        head = _HEAD_RENAME[name]
        idx = int(parts[1])
        kind = parts[2]  # weight|bias|running_*
        # Sequential indices: conv at 0,3,6,...; bn at 1,4,...
        chain_pos = idx // 3
        is_conv = idx % 3 == 0
        n_chain = 2 if big else 1  # hidden convs before the final 1-ch conv
        if is_conv and chain_pos == n_chain:
            target = ("decoder_net", "heads", f"{head}_out")
            if kind == "weight":
                _set(params, target + ("kernel",), _conv_w(v))
            else:
                _set(params, target + ("bias",), v)
        elif is_conv:
            target = ("decoder_net", "heads", f"{head}_{chain_pos}", "conv")
            if kind == "weight":
                _set(params, target + ("kernel",), _conv_w(v))
            else:
                _set(params, target + ("bias",), v)
        else:  # bn
            _bn(params, stats,
                ("decoder_net", "heads", f"{head}_{chain_pos}", "bn", "bn"),
                kind, v)
        return True
    if name.startswith("deconv"):
        base = ("decoder_net", name)
        if parts[1] == "0":  # ConvTranspose2d
            _set(params, base + ("deconv", "kernel"), _deconv_w(v))
        else:  # BN at index 1
            _bn(params, stats, base + ("bn", "bn"), parts[2], v)
        return True
    if name.startswith("conv"):
        base = ("decoder_net", name)
        if parts[1] == "0":
            if parts[2] == "weight":
                _set(params, base + ("conv", "kernel"), _conv_w(v))
            else:
                _set(params, base + ("conv", "bias"), v)
        else:
            _bn(params, stats, base + ("bn", "bn"), parts[2], v)
        return True
    return False


def _map_sdf_decoder(params, which: str, rest: str, v: np.ndarray) -> bool:
    m = re.match(r"linh(\d)\.(weight_g|weight_v|weight|bias)$", rest)
    if not m:
        return False
    layer, kind = f"linh{m.group(1)}", m.group(2)
    base = (which, layer)
    if kind == "weight_g":
        _set(params, base + ("g",), v.reshape(-1))
    elif kind == "weight_v":
        _set(params, base + ("v",), v)
    elif kind == "weight":
        _set(params, base + ("kernel",), _linear_w(v))
    else:
        _set(params, base + ("bias",), v)
    return True


def _map_mha(params, base: Tuple[str, ...], rest: str, v: np.ndarray) -> bool:
    if rest == "in_proj_weight":
        _set(params, base + ("in_proj_weight",), v)
    elif rest == "in_proj_bias":
        _set(params, base + ("in_proj_bias",), v)
    elif rest == "out_proj.weight":
        _set(params, base + ("out_proj", "kernel"), _linear_w(v))
    elif rest == "out_proj.bias":
        _set(params, base + ("out_proj", "bias"), v)
    else:
        return False
    return True


def _map_transformer(params, which: str, rest: str, v: np.ndarray) -> bool:
    parts = rest.split(".")
    if parts[0] in ("encoder", "decoder"):
        stack = parts[0]
        if parts[1] == "layers":
            layer = f"layer{parts[2]}"
            sub = parts[3]
            tail = ".".join(parts[4:])
            base = (which, stack, layer)
            if sub in ("self_attn", "multihead_attn"):
                return _map_mha(params, base + (sub,), tail, v)
            if sub in ("linear1", "linear2"):
                _set(params, base + (sub, "kernel" if tail == "weight" else "bias"),
                     _linear_w(v) if tail == "weight" else v)
                return True
            if sub.startswith("norm"):
                _set(params, base + (sub, "scale" if tail == "weight" else "bias"), v)
                return True
            return False
        if parts[1] in ("inter_norm", "norm"):
            _set(params, (which, stack, parts[1],
                          "scale" if parts[2] == "weight" else "bias"), v)
            return True
    return False


def _map_mlp(params, name: str, rest: str, v: np.ndarray) -> bool:
    m = re.match(r"layers\.(\d+)\.(weight|bias)$", rest)
    if not m:
        return False
    target = (name, f"layers_{m.group(1)}")
    if m.group(2) == "weight":
        _set(params, target + ("kernel",), _linear_w(v))
    else:
        _set(params, target + ("bias",), v)
    return True


def convert_state_dict(
    state: Dict[str, Any], *, big_decoder: bool = False
) -> Tuple[Dict, Dict]:
    """torch state dict (numpy values) -> (params, batch_stats) pytrees."""
    params: Dict = {}
    stats: Dict = {}
    unmapped = []
    for key, val in state.items():
        k = key
        if k.startswith("module."):
            k = k[len("module."):]
        if any(re.search(p, k) for p in SKIP_PATTERNS):
            continue
        v = np.asarray(val)
        ok = False
        if k.startswith("backbone_net.resnet."):
            ok = _map_backbone(params, stats, k[len("backbone_net.resnet."):], v)
        elif k.startswith("decoder_net.resnet_decoder."):
            ok = _map_decoder(
                params, stats, k[len("decoder_net.resnet_decoder."):], v,
                big_decoder,
            )
        elif k.startswith("hand_sdf_decoder."):
            ok = _map_sdf_decoder(params, "hand_sdf_decoder",
                                  k[len("hand_sdf_decoder."):], v)
        elif k.startswith("obj_sdf_decoder."):
            ok = _map_sdf_decoder(params, "obj_sdf_decoder",
                                  k[len("obj_sdf_decoder."):], v)
        elif k.startswith("hand_transformer."):
            ok = _map_transformer(params, "hand_transformer",
                                  k[len("hand_transformer."):], v)
        elif k.startswith("obj_transformer."):
            ok = _map_transformer(params, "obj_transformer",
                                  k[len("obj_transformer."):], v)
        elif k == "hand_sigmoid_beta":
            _set(params, ("hand_sigmoid_beta",), v)
            ok = True
        elif k == "obj_sigmoid_beta":
            _set(params, ("obj_sigmoid_beta",), v)
            ok = True
        elif k == "mano_query_embed.weight":
            _set(params, ("mano_query_embed",), v)
            ok = True
        else:
            m = re.match(
                r"(linear_transformerin|linear_sdfin|linear_pose|linear_shape|"
                r"linear_handvote|linear_handcls|linear_obj_rel_trans|"
                r"linear_obj_rot)\.(.*)$", k,
            )
            if m:
                ok = _map_mlp(params, m.group(1), m.group(2), v)
        if not ok:
            unmapped.append(key)
    if unmapped:
        raise ValueError(f"unmapped checkpoint keys: {unmapped[:20]}")
    return params, stats


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint's state dict as numpy arrays.

    Accepts the reference's snapshot_*.pth.tar (torch.save with a 'network'
    entry, common/base.py:113-118) or a plain .npz of state-dict keys (the
    torch-free stand-in format from tools/make_standin_ckpt.py).
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    state = raw.get("network", raw) if isinstance(raw, dict) else raw
    return {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}


def verify_tree_match(converted: Dict, expected: Dict, *, what: str) -> None:
    """Raise with the exact path diff if a converted tree does not line up
    with the model's initialized structure (catches setting mismatches like
    evaluating a big-decoder checkpoint under the small-decoder preset)."""
    import jax.tree_util as jtu

    got = {jtu.keystr(p) for p, _ in jtu.tree_flatten_with_path(converted)[0]}
    want = {jtu.keystr(p) for p, _ in jtu.tree_flatten_with_path(expected)[0]}
    if got != want:
        missing = sorted(want - got)[:10]
        extra = sorted(got - want)[:10]
        raise ValueError(
            f"converted {what} do not match the model structure; "
            f"missing={missing} extra={extra}"
        )


def convert_torchvision_resnet(state: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision ImageNet ResNet state dict -> backbone params/batch_stats
    (reference init path, common/nets/resnet.py:89-98; fc.* dropped)."""
    params: Dict = {}
    stats: Dict = {}
    for key, val in state.items():
        if key.startswith("fc."):
            continue
        if key.endswith("num_batches_tracked"):
            continue
        if not _map_backbone(params, stats, key, np.asarray(val)):
            raise ValueError(f"unmapped torchvision key: {key}")
    return params, stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_path")
    p.add_argument("out_dir")
    p.add_argument("--setting", default="dexycb")
    p.add_argument("--torchvision", action="store_true",
                   help="input is a torchvision ResNet state dict")
    args = p.parse_args()

    import torch

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.utils import checkpoint as ckpt_util

    raw = torch.load(args.ckpt_path, map_location="cpu", weights_only=False)
    state = raw.get("network", raw) if isinstance(raw, dict) else raw
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}

    if args.torchvision:
        params, stats = convert_torchvision_resnet(state)
        epoch = 0
    else:
        cfg = get_config(args.setting)
        params, stats = convert_state_dict(state, big_decoder=cfg.use_big_decoder)
        epoch = raw.get("epoch", 0) if isinstance(raw, dict) else 0

    path = ckpt_util.save_snapshot(
        args.out_dir, epoch,
        {"params": params, "batch_stats": stats, "opt_state": {}, "step": 0},
    )
    print("wrote", path)


if __name__ == "__main__":
    main()
