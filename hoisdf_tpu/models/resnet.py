"""ResNet backbone with multi-stride skip features (NHWC, flax).

Parity target: ``common/nets/resnet.py:14-98`` (torchvision BasicBlock /
Bottleneck layout, stride on the 3x3 conv).  Returns the stride-32 feature and
a dict of stride-2/4/8/16/32 skip maps consumed by the U-Net decoder.

TPU notes: NHWC layout feeds the MXU directly; BatchNorm uses running stats
collected per-replica (the reference's DataParallel semantics) with an
optional ``axis_name`` for cross-replica syncing — the reference freezes the
backbone BN affine params during training anyway (main/model.py:118-121).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class _BN(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1).

    Stats are always accumulated in f32 (flax default) even when activations
    are bf16; `dtype` controls the output/compute dtype."""

    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            name="bn",
        )(x)


def _conv(features: int, kernel: int, stride: int = 1, name: str | None = None,
          dtype: Any = None):
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        out = _conv(self.planes, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        out = _BN(self.bn_axis, self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = _BN(self.bn_axis, self.dtype, name="bn2")(out, train)
        if self.has_downsample:
            identity = _conv(self.planes, 1, self.stride, name="downsample_conv", dtype=self.dtype)(x)
            identity = _BN(self.bn_axis, self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        out = _conv(self.planes, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = _BN(self.bn_axis, self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, name="conv2", dtype=self.dtype)(out)
        out = _BN(self.bn_axis, self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = _BN(self.bn_axis, self.dtype, name="bn3")(out, train)
        if self.has_downsample:
            identity = _conv(
                self.planes * self.expansion, 1, self.stride,
                name="downsample_conv", dtype=self.dtype,
            )(x)
            identity = _BN(self.bn_axis, self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages; emits every skip level (resnet.py:70-87)."""

    resnet_type: int = 50
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(
        self, img: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        block_kind, layers = RESNET_SPECS[self.resnet_type]
        block_cls = Bottleneck if block_kind == "bottleneck" else BasicBlock
        expansion = 4 if block_kind == "bottleneck" else 1

        skips = {}
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(img)
        x = _BN(self.bn_axis, self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        skips["stride2"] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), layers), start=1
        ):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes, s, need_ds, self.bn_axis, self.dtype,
                    name=f"layer{stage}_{b}",
                )(x, train=train)
                inplanes = planes * expansion
            skips[f"stride{2 ** (stage + 1)}"] = x

        return x, skips
