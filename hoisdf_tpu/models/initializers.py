"""Reference from-scratch weight initialization.

Parity target: ``main/model.py:668-679`` (``init_weights``) as applied at
``main/model.py:744-750`` in train mode — to the decoder, both SDF decoders
and both transformers only (NOT the backbone, which gets ImageNet weights,
and NOT the core model's own prediction heads, which keep framework-default
init in the reference too).

Faithful torch semantics, including the non-obvious parts:

- Conv2d / ConvTranspose2d kernels -> normal(std=0.001); Conv2d bias -> 0
  (ConvTranspose2d bias is untouched there; our deconvs are bias-free).
- BatchNorm2d -> scale 1 / bias 0 (framework default in both stacks).
- nn.Linear -> normal(std=0.01) weight, 0 bias.  BUT for the SDF decoders'
  weight-normed layers the torch ``normal_(m.weight)`` writes to the
  *computed* tensor, which the weight-norm pre-forward hook immediately
  overwrites from (g, v) — i.e. it is a NO-OP for training.  So only the
  non-weight-normed final/classifier layers get normal(0.01); the (g, v)
  pairs keep their construction-time init.  Biases are real leaves -> 0.
- nn.MultiheadAttention is not an nn.Linear: its packed ``in_proj_weight`` /
  ``in_proj_bias`` keep the xavier/zeros defaults; only the separate
  ``out_proj`` Linear is re-initialized.
- LayerNorms are untouched (scale 1 / bias 0 defaults).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_REINIT_SCOPES = (
    "decoder_net",
    "hand_sdf_decoder",
    "obj_sdf_decoder",
    "hand_transformer",
    "obj_transformer",
)

_UNTOUCHED_LEAVES = ("in_proj_weight", "in_proj_bias", "g", "v", "scale")


def apply_reference_init(params, rng: jax.Array):
    """Return params with the reference's train-mode init rules applied."""
    counter = [0]

    def leaf(path, x):
        keys = [p.key for p in path if hasattr(p, "key")]
        if not keys or keys[0] not in _REINIT_SCOPES:
            return x
        name = keys[-1]
        if name in _UNTOUCHED_LEAVES:
            return x
        counter[0] += 1
        if name == "bias":
            return jnp.zeros_like(x)
        if name == "kernel":
            std = 0.001 if keys[0] == "decoder_net" else 0.01
            k = jax.random.fold_in(rng, counter[0])
            return (jax.random.normal(k, x.shape, jnp.float32) * std).astype(
                x.dtype
            )
        return x

    return jax.tree_util.tree_map_with_path(leaf, params)
