"""U-Net feature-pyramid decoder with heatmap/segmentation heads (NHWC).

Parity targets: ``common/nets/module.py:51-218`` — two variants:
``Decoder`` (channel-compressed skips, pyramid dims 512/256/128/64/32, total
992) and ``DecoderBig`` (full skip dims, pyramid 2048/1024/512/256/128, total
3968, used by the ``ho3d`` preset).  The head emits 3 channels at 128x128:
joint heatmap (raw), hand seg (sigmoid), obj seg (sigmoid).

TPU notes: deconvs are ConvTranspose k4 s2 (padding=SAME, transpose_kernel
so torch checkpoints convert by pure transposition); concat order is
[compressed-skip, upsampled] exactly as the reference's channel-first cat.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hoisdf_tpu.models.resnet import _BN


def _deconv(features: int, name: str, dtype: Any = None):
    return nn.ConvTranspose(
        features,
        (4, 4),
        strides=(2, 2),
        padding="SAME",
        transpose_kernel=True,
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=((pad, pad), (pad, pad)),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = _BN(self.bn_axis, self.dtype, name="bn")(x, train)
        return nn.relu(x)


class DeconvBNRelu(nn.Module):
    features: int
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _deconv(self.features, "deconv", self.dtype)(x)
        x = _BN(self.bn_axis, self.dtype, name="bn")(x, train)
        return nn.relu(x)


class _Heads(nn.Module):
    """Three 1x1-conv head chains -> [B,H,W,3] (hm, hand_seg, obj_seg)."""

    dims: Tuple[int, ...]  # hidden dims of each chain, e.g. (32,) or (128, 64)
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        outs = []
        for head_i, head in enumerate(("hm", "hand_seg", "obj_seg")):
            h = x
            for j, d in enumerate(self.dims):
                h = ConvBNRelu(d, 1, self.bn_axis, self.dtype, name=f"{head}_{j}")(
                    h, train=train
                )
            h = nn.Conv(1, (1, 1), dtype=self.dtype, name=f"{head}_out")(h)
            if head_i > 0:
                h = nn.sigmoid(h)
            outs.append(h)
        return jnp.concatenate(outs, axis=-1)


class Decoder(nn.Module):
    """Compressed decoder (module.py:51-144), resnet>=50 path."""

    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(
        self, img_feat: jax.Array, skips: Dict[str, jax.Array], *, train: bool = False
    ) -> Tuple[Dict[str, jax.Array], jax.Array]:
        pyr = {}
        pyr["stride32"] = ConvBNRelu(512, 1, self.bn_axis, self.dtype, name="conv0d")(
            img_feat, train=train
        )

        x = img_feat
        spec = [  # (skip name, skip-compress dim, deconv dim, fuse dim)
            ("stride16", 256, 256, 256),
            ("stride8", 128, 128, 128),
            ("stride4", 64, 64, 64),
            ("stride2", 32, 64, 32),
        ]
        for i, (name, skip_dim, deconv_dim, fuse_dim) in enumerate(spec, start=1):
            skip = ConvBNRelu(skip_dim, 1, self.bn_axis, self.dtype, name=f"conv{i}d")(
                skips[name], train=train
            )
            up = DeconvBNRelu(deconv_dim, self.bn_axis, self.dtype, name=f"deconv{i}")(
                x, train=train
            )
            x = ConvBNRelu(fuse_dim, 3, self.bn_axis, self.dtype, name=f"conv{i}")(
                jnp.concatenate([skip, up], axis=-1), train=train
            )
            pyr[name] = x

        heads = _Heads((32,), self.bn_axis, self.dtype, name="heads")(x, train=train)
        return pyr, heads


class DecoderBig(nn.Module):
    """Full-width decoder (module.py:147-218), the ho3d preset."""

    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(
        self, img_feat: jax.Array, skips: Dict[str, jax.Array], *, train: bool = False
    ) -> Tuple[Dict[str, jax.Array], jax.Array]:
        pyr = {"stride32": img_feat}
        x = img_feat
        spec = [("stride16", 1024), ("stride8", 512), ("stride4", 256), ("stride2", 128)]
        for i, (name, dim) in enumerate(spec, start=1):
            up = DeconvBNRelu(dim, self.bn_axis, self.dtype, name=f"deconv{i}")(
                x, train=train
            )
            x = ConvBNRelu(dim, 3, self.bn_axis, self.dtype, name=f"conv{i}")(
                jnp.concatenate([skips[name], up], axis=-1), train=train
            )
            pyr[name] = x

        heads = _Heads((128, 64), self.bn_axis, self.dtype, name="heads")(x, train=train)
        return pyr, heads
