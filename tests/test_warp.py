"""On-device affine warp vs PIL (the reference's host-side path)."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from hoisdf_tpu.data import transforms as T
from hoisdf_tpu.ops.warp import affine_warp_image


def test_affine_warp_matches_pil_nearest():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
    pil = Image.fromarray(img)
    center, scale = np.array([20.0, 26.0]), 30.0
    trans, _ = T.get_affine_transform(center, scale, [32, 32], rot=0.2)
    want = np.asarray(T.transform_img(pil, trans, [32, 32]))

    got = affine_warp_image(
        jnp.asarray(img[None].astype(np.float32)),
        jnp.asarray(trans[None].astype(np.float32)),
        (32, 32),
        mode="nearest",
    )
    got = np.asarray(got[0]).astype(np.uint8)
    # bitwise parity with PIL's half-pixel-center + floor convention
    np.testing.assert_array_equal(got, want)


def test_affine_warp_bilinear_smooth():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
    ident = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    out = affine_warp_image(img, ident, (16, 16), mode="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
