"""Lossless uint8 wire codec for host->device input transfer.

Input transfer is the end-to-end bottleneck on remote-attached chips
(docs/PERFORMANCE.md "Serving under load": 922.8 ms/batch for the f32
image wire vs 190.7 ms for u8 at batch 22), and a real cost anywhere.
The training/eval image batch is f32 in [0,1] but every value came from a
uint8 source divided by 255 (``data/image_io.py::to_float_image``;
augmentation runs in the u8 domain before the final f32 convert), and the
seg-mask targets are binary {0.0, 1.0} — both compress 4x losslessly:

- images: ship the u8 byte, rebuild the EXACT f32 value on device with a
  host-computed 256-entry LUT (``np.arange(256)/255.0``).  A plain device
  ``astype(f32)/255`` is 1 ulp off — XLA rewrites divide-by-constant into
  multiply-by-reciprocal; the LUT gather is rewrite-proof and bit-identical
  to the host normalize (pinned by
  tests/test_predictor.py::test_uint8_transfer_dtype_bit_exact_for_u8_sources
  and tests/test_wire.py).
- binary masks: ship u8 {0,1}, cast back to f32 on device (trivially exact;
  the encoder verifies integrality and falls back to f32 for any
  non-binary mask rather than quantize silently).

The reference has no wire format at all (inputs materialize on-GPU via
DataLoader pinned memory, ``common/base.py:79-92``); this is a TPU/serving
subsystem with no reference counterpart.  Used by ``Predictor``
(``transfer_dtype="uint8"``), ``train_loop`` and ``evaluate``
(``Config.transfer_dtype``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

WIRE_DTYPES = ("float32", "uint8")

# Target keys that are binary masks (f32 {0,1} on the host).
_BINARY_MASK_KEYS = ("hand_seg", "obj_seg")


def u8_lut_np() -> np.ndarray:
    """The 256-entry f32 normalize table, computed on the HOST with numpy's
    own v/255.0 rounding so the device gather reproduces
    ``to_float_image`` bit-exactly."""
    return np.arange(256, dtype=np.float32) / 255.0


def quantize_image_u8(img) -> np.ndarray:
    """f32 [0,1] image -> u8 wire bytes.  u8 passes through untouched (the
    exact case); float crops are re-quantized with rint — lossless iff the
    float came from a u8 source divided by 255 (all built-in datasets'
    images do; the round-trip is pinned exact for every representable
    value by tests/test_wire.py)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)


def encode_inputs(inputs: Dict) -> Dict:
    """Host side: swap the image batch to the u8 wire format."""
    if "img" not in inputs:
        return inputs
    out = dict(inputs)
    out["img"] = quantize_image_u8(out["img"])
    return out


def encode_targets(targets: Dict) -> Dict:
    """Host side: binary {0,1} masks -> u8.  A mask that is not exactly
    binary is left in f32 (never silently quantized)."""
    out = dict(targets)
    for k in _BINARY_MASK_KEYS:
        v = out.get(k)
        if v is None:
            continue
        v = np.asarray(v)
        if v.dtype == np.uint8:
            continue
        if ((v == 0.0) | (v == 1.0)).all():
            out[k] = v.astype(np.uint8)
    return out


def encode_batch(inputs: Dict, targets: Optional[Dict] = None
                 ) -> Tuple[Dict, Optional[Dict]]:
    """Host side: encode an (inputs, targets) pair for the u8 wire."""
    inputs = encode_inputs(inputs)
    if targets is not None:
        targets = encode_targets(targets)
    return inputs, targets


@functools.lru_cache(maxsize=None)
def _mul_decode_bf16_safe() -> bool:
    """Exhaustive 256-value proof that the multiply decode is safe under
    bf16 compute: ``bf16(f32(i) * fl32(1/255)) == bf16(f32(i)/255)`` for
    every byte.  numpy f32 ops are IEEE — identical to XLA's f32 multiply
    (an EXPLICIT multiply is not subject to the divide->reciprocal rewrite
    that makes a device /255 1 ulp off).  In f32 the two differ on 126/256
    values, which is why the fast path is gated to bf16 compute, where the
    model's only image consumer casts first (models/hoisdf.py:383-386)."""
    import ml_dtypes

    i = np.arange(256, dtype=np.float32)
    exact = (i / np.float32(255.0)).astype(ml_dtypes.bfloat16)
    mul = (i * (np.float32(1.0) / np.float32(255.0))).astype(ml_dtypes.bfloat16)
    return bool((mul.view(np.uint16) == exact.view(np.uint16)).all())


def decode_inputs(inputs: Dict, compute_dtype: str = "float32") -> Dict:
    """Device side (trace-time, inside jit): normalize a u8 image batch
    back to the exact host values.  f32 inputs pass through, so one jitted
    step serves both wire formats (dtype is static under jit).

    Two decode paths, both end-to-end bit-exact vs the f32 wire:
    - ``compute_dtype="bfloat16"`` (the production TPU path): a plain
      ``f32(img) * fl(1/255)`` multiply.  Its f32 output is within 1 ulp
      of the host normalize, and every model consumer casts the image to
      bf16 first, where the two are IDENTICAL for all 256 byte values
      (``_mul_decode_bf16_safe``; pinned bitwise by tests/test_wire.py on
      a bf16-compute model).  ~Free on the VPU.
    - otherwise: a 256-entry f32 LUT gather — exact in f32 itself, but a
      real cost on TPU (gathers are VPU work: measured +37 ms/batch-22,
      docs/PERFORMANCE.md)."""
    img = inputs.get("img")
    if img is None or not jnp.issubdtype(img.dtype, jnp.integer):
        return inputs
    if compute_dtype == "bfloat16" and _mul_decode_bf16_safe():
        dec = img.astype(jnp.float32) * np.float32(1.0 / 255.0)
        return dict(inputs, img=dec)
    lut = jnp.asarray(u8_lut_np())
    return dict(inputs, img=jnp.take(lut, img.astype(jnp.int32)))


def decode_targets(targets: Dict) -> Dict:
    """Device side (trace-time, inside jit): u8 binary masks -> f32."""
    out = dict(targets)
    for k in _BINARY_MASK_KEYS:
        v = out.get(k)
        if v is not None and jnp.issubdtype(v.dtype, jnp.integer):
            out[k] = v.astype(jnp.float32)
    return out
