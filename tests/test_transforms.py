"""Host-side transform math tests (dataset_util.py parity)."""

import numpy as np
from PIL import Image

from hoisdf_tpu.data import transforms as T


def test_rodrigues_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        aa = rng.randn(3)
        rot = T.rodrigues_np(aa)
        # orthonormal, det 1
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(rot) > 0
        aa2 = T.inv_rodrigues_np(rot)
        np.testing.assert_allclose(T.rodrigues_np(aa2), rot, atol=1e-8)


def test_rotation_angle_composes():
    rng = np.random.RandomState(1)
    aa = rng.randn(3) * 0.5
    rot_mat = T.rodrigues_np(rng.randn(3) * 0.5)
    out = T.rotation_angle(aa, rot_mat)
    np.testing.assert_allclose(
        T.rodrigues_np(out.astype(np.float64)), rot_mat @ T.rodrigues_np(aa),
        atol=1e-5,
    )


def test_affine_crop_maps_center_to_middle():
    center = np.array([100.0, 80.0])
    scale = 50.0
    trans, rot_mat = T.get_affine_transform(center, scale, [256, 256], rot=0.0)
    mapped = T.transform_coords(center[None], trans)[0]
    np.testing.assert_allclose(mapped, [128, 128], atol=1e-3)
    # crop edge maps to image edge
    edge = center + np.array([scale / 2, 0])
    np.testing.assert_allclose(T.transform_coords(edge[None], trans)[0], [256, 128], atol=1e-3)


def test_affine_transform_with_K_consistency():
    # Rotating then cropping must equal the post_rot_trans applied to the
    # rotated center (the reference's K-update pathway).
    center = np.array([320.0, 240.0])
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    total, post_rot, rot_mat = T.get_affine_transform(
        center, 100.0, [256, 256], rot=0.3, K=K
    )
    # a camera point projecting to `center` must land mid-crop under `total`
    np.testing.assert_allclose(
        T.transform_coords(center[None], total)[0], [128, 128], atol=1e-3
    )


def test_transform_img_matches_coords():
    # a bright pixel at p must move to transform_coords(p)
    img = np.zeros((64, 64, 3), np.uint8)
    img[40, 20] = 255  # row 40 (y), col 20 (x)
    pil = Image.fromarray(img)
    center, scale = np.array([24.0, 36.0]), 32.0
    trans, _ = T.get_affine_transform(center, scale, [64, 64], rot=0.0)
    warped = np.asarray(T.transform_img(pil, trans, [64, 64]))
    want_xy = T.transform_coords(np.array([[20.0, 40.0]]), trans)[0]
    got = np.unravel_index(warped[..., 0].argmax(), warped.shape[:2])
    assert abs(got[1] - want_xy[0]) <= 1.5 and abs(got[0] - want_xy[1]) <= 1.5


def test_get_center_cam_projects_back():
    K = np.array([[500.0, 0, 128], [0, 500, 128], [0, 0, 1]])
    bbox = np.array([100.0, 110.0, 160.0, 170.0])
    z = 0.6
    c = T.get_center_cam(bbox, z, K)
    pix = K @ c
    pix = pix[:2] / pix[2]
    np.testing.assert_allclose(pix, [int(130), int(140)], atol=1e-6)


def test_bbox_fuse_and_normalize():
    j1 = np.array([[10.0, 10], [30, 50]])
    b = T.get_bbox_joints(j1, bbox_factor=1.0)
    assert b[0] <= 10 and b[2] >= 30
    center, scale = T.fuse_bbox(b, b, (64, 64))
    assert scale >= 20
    norm = T.normalize_joints(j1, b)
    assert norm.min() >= -0.05 and norm.max() <= 1.05


def test_color_jitter_changes_image_but_preserves_shape():
    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8))
    out = T.color_jitter(img, 0.5, 0.5, 0.5, 0.15)
    assert out.size == img.size
    assert not np.array_equal(np.asarray(out), np.asarray(img))
