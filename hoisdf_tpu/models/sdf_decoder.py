"""DeepSDF-style signed-distance decoder MLP.

Parity target: ``common/nets/sdf_net.py:12-122``.  Six linear layers with
weight-normalization on layers 0-3, a skip re-concat of the full input at
layer 2 (``latent_in=[2]``, layer-1 output shrunk to 223 so the concat is
512-d again), ReLU + dropout(0.2) between hidden layers, final tanh, first
output channel is the SDF.

TPU notes: the decoder runs on [B*P, 289] token batches (P = 600/200 sampled
points or 64^3-lattice chunks) — pure MXU matmuls at aligned sizes.  Weight
norm is folded at call time (g * v / ||v||), which XLA fuses into the matmul.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class WeightNormDense(nn.Module):
    """Dense layer with torch-style weight normalization over the input dim.

    Stores direction ``v`` [out, in] and magnitude ``g`` [out] so converted
    torch ``weight_v``/``weight_g`` tensors drop in directly (dim=0 norm).
    """

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.normal(stddev=0.01),
            (self.features, in_dim),
            jnp.float32,
        )
        g = self.param("g", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        norm = jnp.linalg.norm(v, axis=1, keepdims=True)
        w = (g[:, None] / jnp.maximum(norm, 1e-12)) * v
        return x @ w.astype(x.dtype).T + b.astype(x.dtype)


class SDFDecoder(nn.Module):
    """Hand/object SDF field decoder (two instances share this class).

    Input: [N, latent_size + point_feat_size] = pixel-aligned feature (256)
    ++ NeRF pos-enc (30) ++ xyz (3).  Output: (sdf [N,1], class_logits or None).
    """

    latent_size: int = 256
    point_feat_size: int = 33
    dims: Sequence[int] = (512, 512, 512, 512)
    num_class: int = 6
    dropout_prob: float = 0.2
    dropout_layers: Sequence[int] = (0, 1, 2, 3)
    latent_in: Sequence[int] = (2,)
    use_classifier: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array | None]:
        in_dim = self.latent_size + self.point_feat_size
        all_dims = [in_dim, *self.dims, 1]
        num_layers = len(all_dims)
        inputs = x
        h = x
        class_logits = None
        for layer in range(num_layers - 1):
            if self.use_classifier and layer == num_layers - 2:
                class_logits = nn.Dense(self.num_class, dtype=self.dtype, name="classifier_head")(h)
            out_dim = all_dims[layer + 1]
            if layer + 1 in self.latent_in:
                out_dim -= all_dims[0]
            if layer in self.latent_in:
                h = jnp.concatenate([h, inputs], axis=-1)
            # Weight norm on layers 0-3, plain dense on the head (sdf_net.py:57-64)
            if layer <= 3:
                h = WeightNormDense(out_dim, name=f"linh{layer}")(h)
            else:
                h = nn.Dense(out_dim, dtype=self.dtype, name=f"linh{layer}")(h)
            if layer < num_layers - 2:
                h = nn.relu(h)
                if layer in self.dropout_layers:
                    h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        sdf = jnp.tanh(h)
        return sdf[..., :1], class_logits
