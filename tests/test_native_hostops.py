"""Native hostops vs the numpy reference implementations."""

import numpy as np
import pytest

from mhentropy_tpu.data import occlusion, transforms as T

hostops = pytest.importorskip("native.hostops")

if not hostops.available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_crop_resize_matches_numpy_path():
    rng = np.random.RandomState(0)
    img = rng.rand(120, 160, 3).astype(np.float32) * 255
    centre, half, size = (80.0, 60.0), 50.0, 64
    ours = hostops.crop_resize_nearest(img, centre, half, size)
    ref = T.resize_nearest(T.crop_with_padding(img, centre, half), size)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_crop_resize_padding():
    img = np.ones((50, 50), np.float32)
    out = hostops.crop_resize_nearest(img, (0.0, 0.0), 30.0, 32, pad_value=0.0)
    assert out[0, 0] == 0.0  # padded region
    assert out[-1, -1] == 1.0  # inside


def test_circle_occlude_matches_numpy():
    rng = np.random.RandomState(1)
    img = rng.rand(128, 128, 3).astype(np.float32)
    uv = rng.uniform(10, 118, (21, 2)).astype(np.float32)
    ref_img, ref_vis, (cx, cy, r, _) = occlusion.patch_occlusion(
        img, uv, idx=3, size=30
    )
    out_img, occ = hostops.circle_occlude(img.copy(), cx, cy, 30, uv)
    np.testing.assert_allclose(out_img, ref_img, atol=1e-6)
    np.testing.assert_array_equal(occ, ref_vis == 0.0)


def test_depth_mask_visibility_matches_numpy():
    rng = np.random.RandomState(2)
    depth = rng.uniform(0.3, 0.8, (96, 96)).astype(np.float32)
    mask = rng.rand(96, 96) > 0.5
    uvd = np.stack(
        [rng.uniform(-5, 100, 21), rng.uniform(-5, 100, 21),
         rng.uniform(300, 900, 21)], 1
    ).astype(np.float32)
    ref = occlusion.depth_mask_visibility(uvd, mask, depth, quant=5, tol_mm=40)
    ours = hostops.depth_mask_visibility(uvd, mask, depth, quant=5, tol_mm=40)
    np.testing.assert_array_equal(ours, ref)


def test_check_occlusion_matches_numpy():
    rng = np.random.RandomState(3)
    depth = rng.uniform(0.3, 0.8, (64, 64)).astype(np.float32)
    uv = rng.uniform(-3, 70, (42, 2)).astype(np.float32)
    pose = np.stack(
        [np.zeros(42), np.zeros(42), rng.uniform(0.3, 0.8, 42)], 1
    ).astype(np.float32)
    ref = occlusion.check_occlusion(uv, depth, pose, delta=0.02, quant=2)
    ours = hostops.check_occlusion(uv, depth, pose, delta=0.02, quant=2)
    np.testing.assert_array_equal(ours, ref)


def test_warp_affine_matches_numpy_cv2():
    import cv2

    rng = np.random.RandomState(4)
    img = rng.rand(64, 64, 3).astype(np.float32)
    params = T.make_aug_params(rng)
    m = T.aug_rot_mat(params, 64)
    ref = cv2.warpAffine(img, m, (64, 64), flags=cv2.INTER_NEAREST, borderValue=0.0)
    ours = hostops.warp_affine_nearest(img, m, 64)
    # Nearest-neighbour rounding at pixel boundaries can differ; demand >98%
    # identical pixels and identical borders.
    same = np.isclose(ours, ref, atol=1e-6).mean()
    assert same > 0.98, same
