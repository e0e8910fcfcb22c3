"""ctypes bindings for the native (C++) host-side data-pipeline core.

The reference framework feeds its GPUs from 15 torch DataLoader worker
processes whose hot image ops live in torch/PIL C (common/base.py:79-92).
Our in-process threaded loader needs the per-sample work to release the
GIL; ``src/pipeline.cc`` fuses decode -> flip -> affine crop -> blur ->
jitter -> f32 into one C call per sample so a worker thread holds the GIL
only for Python glue. ctypes releases the GIL around every foreign call,
so no pybind11/GIL plumbing is needed.

All geometry here is bit-identical to the PIL path (asserted in
tests/test_native_pipeline.py); photometric aug matches PIL's integer
semantics (enhance/hue exact, blur within +-1 LSB). ``available()`` is the
single capability gate: when the toolchain or headers are missing the
callers silently keep the pure-PIL path.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence, Tuple

import numpy as np

from .build import ensure_built

_lib: "ctypes.CDLL | None" = None
_load_attempted = False

_C = ctypes.c_char_p
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _load() -> "ctypes.CDLL | None":
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    so = ensure_built()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i, sz, v = ctypes.c_int, ctypes.c_size_t, None
    ip = ctypes.POINTER(ctypes.c_int)
    lib.hn_jpeg_dims.argtypes = [_C, sz, ip, ip]
    lib.hn_jpeg_dims.restype = i
    lib.hn_jpeg_decode.argtypes = [_C, sz, _U8P, i, i]
    lib.hn_jpeg_decode.restype = i
    lib.hn_png_dims.argtypes = [_C, sz, ip, ip]
    lib.hn_png_dims.restype = i
    lib.hn_png_decode_rgb.argtypes = [_C, sz, _U8P, i, i]
    lib.hn_png_decode_rgb.restype = i
    lib.hn_warp_affine_nearest.argtypes = [_U8P, i, i, i, i, _F64P, _U8P, i, i]
    lib.hn_warp_affine_nearest.restype = v
    lib.hn_resize_nearest.argtypes = [_U8P, i, i, i, _U8P, i, i]
    lib.hn_resize_nearest.restype = v
    lib.hn_enhance.argtypes = [_U8P, i, i, i, ctypes.c_float]
    lib.hn_enhance.restype = v
    lib.hn_hue_shift.argtypes = [_U8P, i, i, i]
    lib.hn_hue_shift.restype = v
    lib.hn_gaussian_blur.argtypes = [_U8P, i, i, i, ctypes.c_double]
    lib.hn_gaussian_blur.restype = v
    lib.hn_u8_to_f32.argtypes = [_U8P, _F32P, ctypes.c_int64, ctypes.c_float]
    lib.hn_u8_to_f32.restype = v
    lib.hn_process_image.argtypes = [
        _C, sz, i, i, i, i, _F64P, i, ctypes.c_double, _I32P, _F64P, i, _F32P,
    ]
    lib.hn_process_image.restype = i
    lib.hn_warp_seg.argtypes = [_U8P, i, i, i, _F64P, i, i, _U8P]
    lib.hn_warp_seg.restype = i
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# numpy-facing API (mirrors the PIL calls it replaces)
# ---------------------------------------------------------------------------

# jitter op codes shared with pipeline.cc
OP_BRIGHTNESS, OP_SATURATION, OP_CONTRAST, OP_HUE = 0, 1, 2, 3


def _inv6(affine3x3: np.ndarray) -> np.ndarray:
    """PIL's transform takes the inverse (output->source) map, exactly as
    transforms.transform_img computes it."""
    inv = np.linalg.inv(np.asarray(affine3x3, np.float64))
    return np.ascontiguousarray(inv[:2].reshape(6))


def image_dims(data: bytes, kind: str) -> "Optional[Tuple[int, int]]":
    """(H, W) from the encoded header only; None if unparseable."""
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    fn = lib.hn_jpeg_dims if kind == "jpeg" else lib.hn_png_dims
    if fn(data, len(data), h, w) != 0:
        return None
    return h.value, w.value


def decode_image(data: bytes, kind: str) -> Optional[np.ndarray]:
    """Decode jpeg/png bytes to RGB u8 [H, W, 3]; None on failure."""
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if kind == "jpeg":
        if lib.hn_jpeg_dims(data, len(data), h, w) != 0:
            return None
        out = np.empty((h.value, w.value, 3), np.uint8)
        rc = lib.hn_jpeg_decode(data, len(data), out, h.value, w.value)
    elif kind == "png":
        if lib.hn_png_dims(data, len(data), h, w) != 0:
            return None
        out = np.empty((h.value, w.value, 3), np.uint8)
        rc = lib.hn_png_decode_rgb(data, len(data), out, h.value, w.value)
    else:
        raise ValueError(f"unknown image kind {kind!r}")
    return out if rc == 0 else None


def warp_affine_nearest(
    img: np.ndarray, affine3x3: np.ndarray, res: int, flip: bool = False
) -> np.ndarray:
    """PIL transform(AFFINE, NEAREST)-exact warp of u8 HWC/HW to res x res."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    c = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty(
        (res, res) if img.ndim == 2 else (res, res, c), np.uint8
    )
    lib.hn_warp_affine_nearest(
        img, img.shape[0], img.shape[1], c, int(flip), _inv6(affine3x3),
        out, res, res,
    )
    return out


def resize_nearest(img: np.ndarray, res: "int | Tuple[int, int]") -> np.ndarray:
    """PIL resize(NEAREST)-exact; ``res`` is an edge or an (h, w) pair."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    oh, ow = (res, res) if isinstance(res, int) else res
    c = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty((oh, ow) if img.ndim == 2 else (oh, ow, c), np.uint8)
    lib.hn_resize_nearest(img, img.shape[0], img.shape[1], c, out, oh, ow)
    return out


def enhance(img: np.ndarray, op: int, factor: float) -> np.ndarray:
    """In-place PIL ImageEnhance.{Brightness,Color,Contrast} on u8 RGB."""
    lib = _load()
    assert lib is not None
    assert img.dtype == np.uint8 and img.ndim == 3
    lib.hn_enhance(img, img.shape[0], img.shape[1], op, factor)
    return img


def hue_shift(img: np.ndarray, delta: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    lib.hn_hue_shift(img, img.shape[0], img.shape[1], int(delta))
    return img


def gaussian_blur(img: np.ndarray, radius: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    c = 1 if img.ndim == 2 else img.shape[2]
    lib.hn_gaussian_blur(img, img.shape[0], img.shape[1], c, float(radius))
    return img


def process_image(
    data: "bytes | np.ndarray",
    kind: str,
    flip: bool,
    affine3x3: np.ndarray,
    res: int,
    blur_radius: float = 0.0,
    jitter: Sequence[Tuple[int, float]] = (),
) -> Optional[np.ndarray]:
    """Fused decode->flip->warp->blur->jitter->f32/255; one GIL-free call.

    ``data``: encoded bytes (kind 'jpeg'/'png') or a decoded u8 RGB array
    (kind 'raw'). Returns f32 [res, res, 3] or None on decode failure.
    """
    lib = _load()
    if lib is None:
        return None
    ops = np.asarray([o for o, _ in jitter], np.int32)
    fac = np.asarray([f for _, f in jitter], np.float64)
    out = np.empty((res, res, 3), np.float32)
    if kind == "raw":
        arr = np.ascontiguousarray(data, np.uint8)
        rc = lib.hn_process_image(
            arr.tobytes(), arr.size, 2, int(flip), arr.shape[0], arr.shape[1],
            _inv6(affine3x3), res, float(blur_radius), ops, fac, len(jitter),
            out,
        )
    else:
        kcode = {"jpeg": 0, "png": 1}[kind]
        rc = lib.hn_process_image(
            data, len(data), kcode, int(flip), 0, 0, _inv6(affine3x3), res,
            float(blur_radius), ops, fac, len(jitter), out,
        )
    return out if rc == 0 else None


def warp_seg(
    seg: np.ndarray, affine3x3: np.ndarray, inp_res: int, heat_res: int,
    flip: bool = False,
) -> Optional[np.ndarray]:
    """Fused PIL-exact seg path: warp NEAREST to inp_res, then resize
    NEAREST to heat_res (two quantization stages, like the PIL chain)."""
    lib = _load()
    if lib is None:
        return None
    seg = np.ascontiguousarray(seg, np.uint8)
    out = np.empty((heat_res, heat_res), np.uint8)
    rc = lib.hn_warp_seg(
        seg, seg.shape[0], seg.shape[1], int(flip), _inv6(affine3x3),
        inp_res, heat_res, out,
    )
    return out if rc == 0 else None
