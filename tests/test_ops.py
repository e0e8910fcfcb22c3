"""grid_sample and NeRF-encoding parity tests."""

import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.ops.grid_sample import (
    grid_sample_bilinear,
    multiscale_point_features,
    pixels_to_grid,
    project_points,
)
from hoisdf_tpu.ops.nerf import nerf_positional_encoding


def test_grid_sample_golden(golden):
    g = golden("grid_sample")
    feats = jnp.asarray(g["feats"]).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    grid = jnp.asarray(g["grid"][:, 0])  # [B,P,2]
    out = grid_sample_bilinear(feats, grid)  # [B,P,C]
    want = g["out"][:, :, 0].transpose(0, 2, 1)  # [B,C,1,P] -> [B,P,C]
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_multiscale_gather_concat_order():
    rng = np.random.RandomState(0)
    pyr = {
        "a": jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32)),
        "b": jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32)),
    }
    grid = jnp.zeros((1, 5, 2))
    out = multiscale_point_features(pyr, grid, ["a", "b"])
    assert out.shape == (1, 5, 5)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, :3]), np.asarray(grid_sample_bilinear(pyr["a"], grid))[0, 0]
    )


def test_project_points_matches_manual():
    rng = np.random.RandomState(1)
    pts = rng.rand(2, 10, 3).astype(np.float32) + np.array([0, 0, 0.5], np.float32)
    k = np.array(
        [[[500.0, 0, 128], [0, 500, 128], [0, 0, 1]]] * 2, dtype=np.float32
    )
    pix = np.asarray(project_points(jnp.asarray(pts), jnp.asarray(k)))
    want = (pts @ k[0].T)[..., :2] / (pts @ k[0].T)[..., 2:3]
    np.testing.assert_allclose(pix, want, rtol=1e-5)


def test_pixels_to_grid_range():
    pix = jnp.asarray([[[0.0, 0.0], [255.0, 255.0], [127.5, 127.5]]])
    grid = np.asarray(pixels_to_grid(pix, (256, 256)))
    np.testing.assert_allclose(grid[0, 0], [-1, -1], atol=1e-6)
    np.testing.assert_allclose(grid[0, 1], [1, 1], atol=1e-6)
    np.testing.assert_allclose(grid[0, 2], [0, 0], atol=1e-6)


def test_nerf_encoding_layout():
    # Column order must match sdf_utils.py:117-120: per-frequency sin then cos.
    x = jnp.asarray([[0.3, -0.7, 1.1]])
    enc = np.asarray(nerf_positional_encoding(x, 5))
    assert enc.shape == (1, 30)
    xin = np.asarray(x)[0]
    for f_i, f in enumerate([1.0, 2.0, 4.0, 8.0, 16.0]):
        np.testing.assert_allclose(enc[0, f_i * 6 : f_i * 6 + 3], np.sin(xin * f), atol=1e-6)
        np.testing.assert_allclose(enc[0, f_i * 6 + 3 : f_i * 6 + 6], np.cos(xin * f), atol=1e-6)


def test_matmul_gather_exactly_matches_gather():
    import jax

    rng = np.random.RandomState(7)
    feat = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    grid = jnp.asarray(rng.rand(2, 40, 2).astype(np.float32) * 2.2 - 1.1)
    from hoisdf_tpu.ops.grid_sample import grid_sample_bilinear_matmul

    a = grid_sample_bilinear(feat, grid)
    b = grid_sample_bilinear_matmul(feat, grid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_chunked_matmul_gather_bit_exact():
    """grid_sample_bilinear_matmul_chunked must match the unchunked matmul
    and the 4-corner gather to ULP tolerance on a 1024-entry table (the
    stride8 shape it targets), including border/clamped points and corners
    straddling chunk edges (those reassociate the corner sum -> not bitwise,
    see the op docstring)."""
    from hoisdf_tpu.ops.grid_sample import (
        grid_sample_bilinear_matmul,
        grid_sample_bilinear_matmul_chunked,
    )

    rng = np.random.RandomState(13)
    feat = jnp.asarray(rng.randn(2, 32, 32, 24).astype(np.float32))
    grid = jnp.asarray(rng.rand(2, 300, 2).astype(np.float32) * 2.4 - 1.2)
    # Pin some points exactly on chunk-straddling rows (row 7->8 crosses the
    # 256-entry chunk boundary at index 256).
    grid = grid.at[0, :8, 1].set(
        jnp.linspace(-1 + 2 * 7.2 / 31, -1 + 2 * 8.2 / 31, 8)
    )
    a = grid_sample_bilinear_matmul(feat, grid)
    b = grid_sample_bilinear_matmul_chunked(feat, grid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    c = grid_sample_bilinear(feat, grid)
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=2e-6)


def test_multiscale_routing_chunked_matches_default():
    """chunked_max_table routing must not change multiscale results."""
    from hoisdf_tpu.ops.grid_sample import multiscale_point_features

    rng = np.random.RandomState(17)
    pyr = {
        "stride8": jnp.asarray(rng.randn(2, 32, 32, 6).astype(np.float32)),
        "stride16": jnp.asarray(rng.randn(2, 16, 16, 5).astype(np.float32)),
    }
    grid = jnp.asarray(rng.rand(2, 50, 2).astype(np.float32) * 2 - 1)
    base = multiscale_point_features(pyr, grid, ("stride8", "stride16"))
    routed = multiscale_point_features(
        pyr, grid, ("stride8", "stride16"), chunked_max_table=1024
    )
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(routed), atol=1e-5
    )


def test_fast_gather_forward_and_feat_grad_match_reference():
    """grid_sample_bilinear_fast: slice-gather forward and hand-written
    scatter-add backward must match the 4-corner formulation (incl. border
    clamping) exactly."""
    import jax

    from hoisdf_tpu.ops.grid_sample import grid_sample_bilinear_fast

    rng = np.random.RandomState(11)
    feat = jnp.asarray(rng.randn(3, 8, 10, 7).astype(np.float32))
    # Cover interior, border, and out-of-range (clamped) points.
    grid = jnp.asarray(rng.rand(3, 33, 2).astype(np.float32) * 2.6 - 1.3)
    cot = jnp.asarray(rng.randn(3, 33, 7).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(grid_sample_bilinear_fast(feat, grid)),
        np.asarray(grid_sample_bilinear(feat, grid)),
        atol=1e-6,
    )

    loss_fast = lambda f: jnp.sum(grid_sample_bilinear_fast(f, grid) * cot)
    loss_ref = lambda f: jnp.sum(grid_sample_bilinear(f, grid) * cot)
    df_fast = jax.grad(loss_fast)(feat)
    df_ref = jax.grad(loss_ref)(feat)
    np.testing.assert_allclose(np.asarray(df_fast), np.asarray(df_ref), atol=1e-5)


def test_fast_gather_grid_grad_is_zero_by_contract():
    """Grid cotangents are intentionally zero (call sites stop_gradient the
    grid; reference detaches it at main/model.py:166)."""
    import jax

    from hoisdf_tpu.ops.grid_sample import grid_sample_bilinear_fast

    rng = np.random.RandomState(12)
    feat = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 9, 2).astype(np.float32) * 1.6 - 0.8)
    dg = jax.grad(lambda g: jnp.sum(grid_sample_bilinear_fast(feat, g)))(grid)
    np.testing.assert_array_equal(np.asarray(dg), 0.0)


def test_multiscale_gather_grad_path_matches_four_corner():
    """The default (grad-path) multiscale gather must stay bit-compatible with
    the plain 4-corner route for values and feature gradients."""
    import jax

    rng = np.random.RandomState(13)
    pyr = {
        "big": jnp.asarray(rng.randn(2, 32, 32, 6).astype(np.float32)),
        "small": jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32)),
    }
    grid = jnp.asarray(rng.rand(2, 25, 2).astype(np.float32) * 2.4 - 1.2)

    out = multiscale_point_features(pyr, grid, ["big", "small"])
    ref = jnp.concatenate(
        [grid_sample_bilinear(pyr["big"], grid), grid_sample_bilinear(pyr["small"], grid)],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    loss = lambda p: jnp.sum(multiscale_point_features(p, grid, ["big", "small"]) ** 2)
    loss_ref = lambda p: jnp.sum(
        jnp.concatenate(
            [grid_sample_bilinear(p["big"], grid), grid_sample_bilinear(p["small"], grid)],
            axis=-1,
        )
        ** 2
    )
    g_fast = jax.grad(loss)(pyr)
    g_ref = jax.grad(loss_ref)(pyr)
    for k in pyr:
        np.testing.assert_allclose(
            np.asarray(g_fast[k]), np.asarray(g_ref[k]), atol=1e-4
        )
