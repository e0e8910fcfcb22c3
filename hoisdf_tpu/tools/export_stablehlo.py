"""Export the serving forward as a portable StableHLO artifact.

The reference has no deployment story beyond running ``main/test.py`` inside
the full training repo; the TPU-native equivalent is ``jax.export``: the
jitted eval forward (backbone, SDF fields, field-guided sampling,
transformers, MANO head — the `Predictor` path, no GT-SDF supervision)
serialized as StableHLO bytes that any JAX/PJRT runtime (TPU serving
container, CPU smoke rig) can deserialize and call without this package on
the import path.

Layout written to OUT_DIR:

* ``model.stablehlo``  — serialized ``jax.export.Exported``; call order is
  ``(params_flat..., img, cam_intr, mano_root, obj_center_cam, bbox_hand,
  bbox_obj)``
* ``params.npz``       — flat ``{path: array}`` params + batch_stats
* ``signature.json``   — input names/shapes/dtypes, output names, flat
  param path order (the contract for a loader)

Loader sketch::

    import json, numpy as np
    from jax import export
    exp = export.deserialize(open("model.stablehlo", "rb").read())
    sig = json.load(open("signature.json"))
    flat = np.load("params.npz")
    params = [flat[k] for k in sig["param_order"]]
    outs = exp.call(*params, img, cam_intr, root, obj_c, bb_h, bb_o)

Usage::

    python -m hoisdf_tpu.tools.export_stablehlo out/export --setting dexycb \
        [--ckpt run/model_dump] [--batch-size 8] [--cpu] [--cfg K=V ...]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Tuple

import numpy as np


def flatten_params(tree, prefix: str = "") -> List[Tuple[str, np.ndarray]]:
    """Deterministic (sorted) dotted-path flattening of a params pytree."""
    from collections.abc import Mapping

    out = []
    if isinstance(tree, Mapping):
        for k in sorted(tree):
            out.extend(flatten_params(tree[k], f"{prefix}{k}."))
    else:
        out.append((prefix[:-1], np.asarray(tree)))
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def export_serving_module(
    predictor, out_dir: str, *, polymorphic_batch: bool = False
) -> str:
    """Serialize ``predictor``'s eval forward + params to ``out_dir``.

    ``polymorphic_batch=True`` exports with a symbolic leading dim so ONE
    artifact serves any batch size (jax.export symbolic shapes); otherwise
    the predictor's fixed batch is baked in."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from hoisdf_tpu.predictor import INPUT_KEYS
    from hoisdf_tpu.models.mano_head import mano_head_pred

    cfg, model, mano = predictor.cfg, predictor.model, predictor.mano

    pflat = flatten_params({"params": predictor.params,
                            "batch_stats": predictor.batch_stats})
    param_order = [k for k, _ in pflat]
    param_vals = [v for _, v in pflat]

    def forward(*args):
        params_tree = unflatten_params(dict(zip(param_order, args[:len(param_order)])))
        inputs = dict(zip(INPUT_KEYS, args[len(param_order):]))
        out = model.apply(
            {"params": params_tree["params"],
             "batch_stats": params_tree.get("batch_stats", {})},
            inputs, use_presampled=False, train=False, supervise_sdf=False,
        )
        # final decoder layer only — the [L*B]-batched FK defeats DCE
        pred_mano = mano_head_pred(
            mano, out["mano_pose6d"][-1:], out["mano_shape"][-1:]
        )
        from hoisdf_tpu.train import vote_hand_joints

        return {
            "mano_joints": pred_mano["joints3d"][-1],
            "mano_verts": pred_mano["verts3d"][-1],
            "hand_joints": vote_hand_joints(out),
            "obj_rot": out["obj_rot"][-1].mean(axis=1),
            "obj_trans": out["obj_trans"][-1].mean(axis=1),
        }

    if polymorphic_batch:
        (b,) = jexport.symbolic_shape("b")
        example_inputs = [
            jax.ShapeDtypeStruct(
                (b,) + np.shape(predictor._template[k])[1:],
                np.asarray(predictor._template[k]).dtype,
            )
            for k in INPUT_KEYS
        ]
    else:
        example_inputs = [predictor._template[k] for k in INPUT_KEYS]
    exported = jexport.export(jax.jit(forward))(*param_vals, *example_inputs)

    os.makedirs(out_dir, exist_ok=True)
    blob_path = os.path.join(out_dir, "model.stablehlo")
    with open(blob_path, "wb") as f:
        f.write(bytes(exported.serialize()))
    np.savez(os.path.join(out_dir, "params.npz"),
             **{k: v for k, v in pflat})
    sig = {
        "param_order": param_order,
        "inputs": {
            k: {"shape": ["b" if polymorphic_batch else
                          np.shape(predictor._template[k])[0]]
                + list(np.shape(predictor._template[k]))[1:],
                "dtype": str(np.asarray(predictor._template[k]).dtype)}
            for k in INPUT_KEYS
        },
        "input_order": list(INPUT_KEYS),
        "outputs": ["mano_joints", "mano_verts", "hand_joints",
                    "obj_rot", "obj_trans"],
        "batch_size": "b" if polymorphic_batch else predictor.batch_size,
        "setting": cfg.dataset,
    }
    with open(os.path.join(out_dir, "signature.json"), "w") as f:
        json.dump(sig, f, indent=1)
    return blob_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--setting", default="dexycb")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument(
        "--polymorphic-batch", action="store_true",
        help="export with a symbolic leading dim (one artifact, any batch)",
    )
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--cfg", action="append", default=[], metavar="KEY=VALUE")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hoisdf_tpu.config import get_config, parse_cfg_overrides
    from hoisdf_tpu.predictor import Predictor

    overrides = {"sdf_infer_mode": "hier", "compute_dtype": "bfloat16"}
    overrides.update(parse_cfg_overrides(args.cfg))  # --cfg wins
    cfg = get_config(args.setting, **overrides)
    pred = Predictor(cfg, ckpt_dir=args.ckpt, batch_size=args.batch_size)
    path = export_serving_module(
        pred, args.out_dir, polymorphic_batch=args.polymorphic_batch
    )
    print("wrote", path)


if __name__ == "__main__":
    main()
