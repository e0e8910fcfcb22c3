"""Generate a reference-layout stand-in checkpoint from a flax init tree.

Produces a state dict with EXACTLY the torch key names and tensor layouts the
reference saves in ``snapshot_*.pth.tar`` (``main/model.py:682-766`` module
tree via ``common/base.py:113-118``), by inverse-mapping this framework's
initialized parameter tree.  Two uses:

  * the converted-checkpoint parity dry run (VERDICT round-1 item #9): the
    full convert -> evaluate -> results.txt flow can be exercised without the
    license-gated reference assets — real parity is then a single asset-drop
    (`--torch-ckpt snapshot_70.pth.tar`) away;
  * a round-trip test of tools/convert_torch_ckpt.py over EVERY model key
    (convert(make_standin(params)) must reproduce params bit-exactly).

The stand-in is saved as .npz (torch-free); ``load_torch_state`` accepts it
anywhere a .pth.tar is accepted.

Usage:
    python -m hoisdf_tpu.tools.make_standin_ckpt out/standin.npz \
        --setting dexycb [--cfg KEY=VALUE ...]
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

_BN_PARAM = {"scale": "weight", "bias": "bias"}
_BN_STAT = {"mean": "running_mean", "var": "running_var"}
_HEAD_TO_TORCH = {"hm": "convOut_hm", "hand_seg": "convOut_hand_seg",
                  "obj_seg": "convOut_obj_seg"}


def _inv_conv(w: np.ndarray) -> np.ndarray:  # [Kh,Kw,I,O] -> [O,I,Kh,Kw]
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))


def _inv_deconv(w: np.ndarray) -> np.ndarray:  # [Kh,Kw,O,I] -> [I,O,Kh,Kw]
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))


def _inv_linear(w: np.ndarray) -> np.ndarray:  # [I,O] -> [O,I]
    return np.ascontiguousarray(w.T)


def _backbone_key(path: Tuple[str, ...], stat: bool) -> str:
    pre = "backbone_net.resnet."
    bn = _BN_STAT if stat else _BN_PARAM
    if path[0] == "conv1":
        return pre + "conv1.weight"
    if path[0] == "bn1":
        return pre + "bn1." + bn[path[2]]
    stage, block = path[0].rsplit("_", 1)
    base = f"{pre}{stage}.{block}."
    sub = path[1]
    if sub == "downsample_conv":
        return base + "downsample.0.weight"
    if sub == "downsample_bn":
        return base + "downsample.1." + bn[path[3]]
    if sub.startswith("conv"):
        return base + sub + ".weight"
    return base + sub + "." + bn[path[3]]  # bnN


def _decoder_key(
    path: Tuple[str, ...], stat: bool, big: bool
) -> str:
    pre = "decoder_net.resnet_decoder."
    bn = _BN_STAT if stat else _BN_PARAM
    name = path[0]
    if name == "heads":
        head_name = path[1]
        stem, _, tail = head_name.rpartition("_")
        n_chain = 2 if big else 1
        if tail == "out":
            torch_head = _HEAD_TO_TORCH[stem]
            leaf = "weight" if path[2] == "kernel" else "bias"
            return f"{pre}{torch_head}.{3 * n_chain}.{leaf}"
        torch_head = _HEAD_TO_TORCH[stem]
        k = int(tail)
        if path[2] == "conv":
            leaf = "weight" if path[3] == "kernel" else "bias"
            return f"{pre}{torch_head}.{3 * k}.{leaf}"
        return f"{pre}{torch_head}.{3 * k + 1}." + bn[path[4]]  # bn
    if name.startswith("deconv"):
        if path[1] == "deconv":
            return f"{pre}{name}.0.weight"
        return f"{pre}{name}.1." + bn[path[3]]
    # convN / convNd fuse blocks
    if path[1] == "conv":
        leaf = "weight" if path[2] == "kernel" else "bias"
        return f"{pre}{name}.0.{leaf}"
    return f"{pre}{name}.1." + bn[path[3]]


def _transformer_entry(top: str, path: Tuple[str, ...], val: np.ndarray):
    stack = path[0]  # encoder | decoder
    if path[1].startswith("layer") and path[1] != "layers":
        n = path[1][len("layer"):]
        sub = path[2]
        base = f"{top}.{stack}.layers.{n}.{sub}."
        if sub in ("self_attn", "multihead_attn"):
            if path[3] in ("in_proj_weight", "in_proj_bias"):
                return base[:-1] + "." + path[3], val
            leaf = "weight" if path[4] == "kernel" else "bias"
            return base + "out_proj." + leaf, (
                _inv_linear(val) if leaf == "weight" else val
            )
        if sub in ("linear1", "linear2"):
            if path[3] == "kernel":
                return base + "weight", _inv_linear(val)
            return base + "bias", val
        # normN
        return base + ("weight" if path[3] == "scale" else "bias"), val
    # inter_norm / norm
    leaf = "weight" if path[2] == "scale" else "bias"
    return f"{top}.{stack}.{path[1]}.{leaf}", val


def flax_to_torch_state(
    params: Dict, batch_stats: Dict, *, big_decoder: bool = False
) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_ckpt.convert_state_dict (exact round-trip)."""
    import jax.tree_util as jtu

    state: Dict[str, np.ndarray] = {}

    def walk(tree, stat: bool):
        for kp, val in jtu.tree_flatten_with_path(tree)[0]:
            path = tuple(k.key for k in kp)
            v = np.asarray(val)
            top, rest = path[0], path[1:]
            if top == "backbone":
                if v.ndim == 4:
                    v = _inv_conv(v)  # backbone 4-d params are all convs
                state[_backbone_key(rest, stat)] = v
            elif top == "decoder_net":
                if v.ndim == 4:
                    is_deconv = rest[0].startswith("deconv") and rest[1] == "deconv"
                    v = _inv_deconv(v) if is_deconv else _inv_conv(v)
                state[_decoder_key(rest, stat, big_decoder)] = v
            elif top.endswith("_sdf_decoder"):
                layer, leaf = rest
                base = f"{top}.{layer}."
                if leaf == "g":
                    state[base + "weight_g"] = v[:, None]
                elif leaf == "v":
                    state[base + "weight_v"] = v
                elif leaf == "kernel":
                    state[base + "weight"] = _inv_linear(v)
                else:
                    state[base + "bias"] = v
            elif top.endswith("_transformer"):
                key, v = _transformer_entry(top, rest, v)
                state[key] = v
            elif top.startswith("linear_"):
                layer, leaf = rest
                n = layer[len("layers_"):]
                if leaf == "kernel":
                    state[f"{top}.layers.{n}.weight"] = _inv_linear(v)
                else:
                    state[f"{top}.layers.{n}.bias"] = v
            elif top in ("hand_sigmoid_beta", "obj_sigmoid_beta"):
                state[top] = v
            elif top == "mano_query_embed":
                state["mano_query_embed.weight"] = v
            else:
                raise ValueError(f"no torch mapping for param path {path}")

    walk(params, stat=False)
    walk(batch_stats, stat=True)
    return state


def build_standin_state(cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Init the model under ``cfg`` and emit the reference-layout state dict."""
    import jax
    import jax.numpy as jnp

    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.models.hoisdf import build_model

    model = build_model(cfg)
    batch = synthetic_batch(cfg, 1, train=True)
    inputs, _ = split_inputs_targets(batch)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "sample_noise": jax.random.PRNGKey(seed + 1)},
        inputs, use_presampled=True, dist_range=0.0,
    )
    return flax_to_torch_state(
        variables["params"], variables.get("batch_stats", {}),
        big_decoder=cfg.use_big_decoder,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out", help="output .npz path")
    p.add_argument("--setting", default="dexycb")
    p.add_argument("--cfg", action="append", default=[], metavar="KEY=VALUE")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="run the init on the host CPU backend")
    p.add_argument(
        "--synthetic", action="store_true",
        help="build the stand-in for the shrunken `evaluate --synthetic` "
        "model (config.SYNTHETIC_TINY_OVERRIDES) instead of the full "
        "preset — the two must be sized identically or the converted "
        "tree will not match at eval time",
    )
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hoisdf_tpu.config import (
        SYNTHETIC_TINY_OVERRIDES,
        get_config,
        parse_cfg_overrides,
    )

    overrides = dict(SYNTHETIC_TINY_OVERRIDES) if args.synthetic else {}
    overrides.update(parse_cfg_overrides(args.cfg))
    cfg = get_config(args.setting, **overrides)
    state = build_standin_state(cfg, args.seed)
    np.savez(args.out, **state)
    print(f"wrote {args.out} ({len(state)} keys)")


if __name__ == "__main__":
    main()
