"""Backend-switching image carriers for the data pipeline.

The datasets build their samples through three image seams — open, final
warp(+aug), seg warp — and each seam here dispatches between:

  * the native C++ fused path (hoisdf_tpu/native): ONE GIL-free C call for
    decode -> flip -> affine crop -> blur -> jitter -> f32, which is what
    lets the threaded DataLoader scale past the GIL (the reference solves
    the same problem with 15 worker processes, common/base.py:79-92);
  * the pure-PIL path, bit-source of truth for parity goldens.

Geometric results are bit-identical between backends; train-time
photometrics differ by <= a few LSB through the blur (see
tests/test_native_pipeline.py + tests/test_dexycb_dataset.py A/B).

RNG contract: callers draw blur radius / jitter factors BEFORE calling
``finalize_image`` in the same order as the legacy inline-PIL code, so both
backends consume identical random streams and every non-image target stays
bit-identical regardless of backend.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageFilter

from .. import native as N
from . import transforms as T


def resolve_native(mode: str) -> bool:
    """Map the config knob ('auto'|'on'|'off') to a backend decision."""
    if mode == "off":
        return False
    ok = N.available()
    if mode == "on" and not ok:
        raise RuntimeError(
            "native_pipeline='on' but the native library is unavailable "
            "(toolchain/headers missing; see hoisdf_tpu/native/build.py)"
        )
    return ok


class LazyImage:
    """Undecoded image handle for the native path: encoded bytes + header
    dims; the x-flip is deferred into the fused warp. Mimics the bits of
    the PIL API the datasets touch (``.size``)."""

    __slots__ = ("data", "kind", "size", "flip")

    def __init__(self, data: bytes, kind: str, size: Tuple[int, int]):
        self.data = data
        self.kind = kind
        self.size = size  # (W, H), PIL convention
        self.flip = False

    def to_pil(self) -> Image.Image:
        import io

        img = Image.open(io.BytesIO(self.data)).convert("RGB")
        if self.flip:
            img = Image.fromarray(np.asarray(img, np.uint8)[:, ::-1, :])
        return img


class SegMask:
    """Seg-mask handle: u8 array + deferred x-flip (native path keeps the
    array unflipped and folds the mirror into the fused warp)."""

    __slots__ = ("arr", "flip")

    def __init__(self, arr: np.ndarray, flip: bool = False):
        self.arr = np.ascontiguousarray(arr, np.uint8)
        self.flip = flip


_KIND_BY_EXT = {".jpg": "jpeg", ".jpeg": "jpeg", ".png": "png"}


def open_image(path: str, native: bool):
    """Open an RGB image for the pipeline: a LazyImage (native) or a PIL
    Image (fallback). Unknown formats fall back to PIL."""
    kind = _KIND_BY_EXT.get(os.path.splitext(path)[1].lower())
    if native and kind is not None:
        with open(path, "rb") as f:
            data = f.read()
        dims = N.image_dims(data, kind)
        if dims is not None:
            return LazyImage(data, kind, (dims[1], dims[0]))
    return Image.open(path).convert("RGB")


def flip_image(img):
    """Mirror the x axis: deferred for LazyImage, materialized for PIL
    (matching data/dexycb.py's numpy [:, ::-1] flip)."""
    if isinstance(img, LazyImage):
        img.flip = not img.flip
        return img
    return Image.fromarray(np.asarray(img, np.uint8)[:, ::-1, :])


def finalize_image(
    img,
    affinetrans: np.ndarray,
    res: int,
    blur_radius: float = 0.0,
    jitter_ops: Sequence[Tuple[str, float]] = (),
) -> "np.ndarray | Image.Image":
    """Final image stage: affine crop [+ blur + jitter]. Returns a
    normalized f32 [res, res, 3] array on the native path, or the
    augmented PIL image on the fallback path (the assembler normalizes)."""
    if isinstance(img, LazyImage):
        out = N.process_image(
            img.data, img.kind, img.flip, affinetrans, res,
            blur_radius=blur_radius,
            jitter=T.jitter_ops_native(jitter_ops),
        )
        if out is not None:
            return out
        img = img.to_pil()  # corrupt-stream fallback
    img = T.transform_img(img, affinetrans, [res, res]).crop((0, 0, res, res))
    if blur_radius > 0.0:
        img = img.filter(ImageFilter.GaussianBlur(blur_radius))
    if jitter_ops:
        img = T.apply_jitter_pil(img, jitter_ops)
    return img


def warp_seg(seg, affinetrans: np.ndarray, inp_res: int, heat_res: int):
    """Seg warp + heatmap-res downsample; SegMask -> native fused call,
    PIL Image -> the legacy chain. Bit-identical outputs."""
    if isinstance(seg, SegMask):
        out = N.warp_seg(
            seg.arr, affinetrans, inp_res, heat_res, flip=seg.flip
        )
        if out is not None:
            return out
        seg = Image.fromarray(seg.arr[:, ::-1] if seg.flip else seg.arr)
    seg = T.transform_img(seg, affinetrans, [inp_res, inp_res])
    seg = seg.crop((0, 0, inp_res, inp_res))
    return np.asarray(seg.resize((heat_res, heat_res), Image.NEAREST))


def to_float_image(img) -> np.ndarray:
    """Assembler-side normalize: native outputs are already f32/255."""
    if isinstance(img, np.ndarray) and img.dtype == np.float32:
        return img
    return np.asarray(img, np.float32) / 255.0
