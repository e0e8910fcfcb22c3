"""On-device affine image warping (the jittable crop/resize stage).

The reference warps images on the host with PIL (``dataset_util.py:44-51``,
note PIL's default NEAREST resampling); this op performs the same affine
warp on the TPU so eval preprocessing can run device-side — the north-star
"jittable preprocessing stage" (BASELINE.json).  Supports nearest (PIL
parity) and bilinear modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_warp_image(
    img: jax.Array,  # [B, H, W, C]
    affine: jax.Array,  # [B, 3, 3] forward transform (src px -> dst px)
    out_hw,
    *,
    mode: str = "nearest",
) -> jax.Array:
    """Warp so that ``out[dst] = img[affine^-1 @ dst]`` (PIL transform takes
    the inverse map; we take the forward one like transform_coords)."""
    b, h, w, c = img.shape
    oh, ow = out_hw
    inv = jnp.linalg.inv(affine)  # [B,3,3]
    ys, xs = jnp.meshgrid(
        jnp.arange(oh, dtype=img.dtype), jnp.arange(ow, dtype=img.dtype),
        indexing="ij",
    )
    # PIL samples at output-pixel centers: src = inv @ [x+0.5, y+0.5, 1],
    # then floors for NEAREST (verified bitwise vs Image.transform).
    dst = jnp.stack(
        [xs + 0.5, ys + 0.5, jnp.ones_like(xs)], axis=-1
    ).reshape(-1, 3)  # [P,3]
    src = jnp.einsum("bij,pj->bpi", inv, dst)  # [B,P,3]
    sx = src[..., 0] / src[..., 2]
    sy = src[..., 1] / src[..., 2]

    if mode == "nearest":
        xi = jnp.clip(jnp.floor(sx), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(sy), 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        out = jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)
        # PIL fills out-of-bounds with 0
        valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        out = out * valid[..., None].astype(img.dtype)
    else:
        # bilinear interpolates in pixel-index space (centers at integers)
        sx = sx - 0.5
        sy = sy - 0.5
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx = (sx - x0)[..., None]
        wy = (sy - y0)[..., None]
        flat = img.reshape(b, h * w, c)

        def gather(yi, xi):
            yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            return jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

        f00 = gather(y0, x0)
        f01 = gather(y0, x0 + 1)
        f10 = gather(y0 + 1, x0)
        f11 = gather(y0 + 1, x0 + 1)
        out = (f00 * (1 - wx) + f01 * wx) * (1 - wy) + (
            f10 * (1 - wx) + f11 * wx
        ) * wy
        valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
        out = out * valid[..., None].astype(img.dtype)
    return out.reshape(b, oh, ow, c)
