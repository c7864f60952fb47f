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


def test_crop_resize_degenerate_half_is_all_padding():
    """half <= 0 gives an empty crop: the kernel must fill the whole output
    with pad_value (the monotone prefix/suffix padding assumes cw >= 0 —
    ADVICE r2)."""
    img = np.full((50, 50, 3), 9.0, np.float32)
    for half in (0.0, -10.0):
        out = hostops.crop_resize_nearest(img, (25.0, 25.0), half, 16,
                                          pad_value=3.0)
        np.testing.assert_array_equal(out, np.full((16, 16, 3), 3.0))
    # u8 sources keep the u8-transport contract even on the degenerate
    # path: one f32 sample would promote the whole collated batch and
    # bypass engine._prep_image's uint8 normalisation.
    out = hostops.crop_resize_nearest(
        np.full((50, 50, 3), 9, np.uint8), (25.0, 25.0), 0.0, 16,
        pad_value=3.0,
    )
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, np.full((16, 16, 3), 3, np.uint8))


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
    # Compare against the numpy BODY: the public function now dispatches
    # to the native kernel when built, which would make this vacuous.
    ref = occlusion._depth_mask_visibility_np(uvd, mask, depth, 5, 40)
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


def test_u8_kernels_match_f32_and_numpy():
    """The uint8-source fast paths (crop_resize_nearest_u8 /
    warp_affine_nearest_u8 + the dtype dispatch in native/hostops.py) must
    match the f32 kernels and the numpy reference exactly, including
    edge-overrunning crop windows (the new prefix/suffix padding)."""
    hostops = pytest.importorskip("native.hostops")
    if not hostops.available():  # pragma: no cover
        pytest.skip("native library unavailable")
    from mhentropy_tpu.data import transforms as T

    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
    img_f32 = img_u8.astype(np.float32)
    for centre, half in [((60.0, 50.0), 30.0), ((5.0, 4.0), 25.0),
                         ((126.0, 94.0), 20.0), ((64.0, 48.0), 12.0)]:
        a = hostops.crop_resize_nearest(img_u8, centre, half, 64)
        b = hostops.crop_resize_nearest(img_f32, centre, half, 64)
        np.testing.assert_array_equal(a, b)
        c = np.asarray(
            T.resize_nearest(
                T.crop_with_padding(img_u8, centre, half, pad_rgb=127.0), 64
            ),
            np.float32,
        )
        np.testing.assert_array_equal(a, c)

    m = np.array([[0.9, 0.15, 6.0], [-0.15, 0.9, 3.0]], np.float32)
    wa = hostops.warp_affine_nearest(img_u8, m, 64)
    wb = hostops.warp_affine_nearest(img_f32, m, 64)
    np.testing.assert_array_equal(wa, wb)


def test_warp_image_native_fallback(monkeypatch):
    """warp_image must fall back to the native kernel when cv2 is absent
    (transforms.py cv2-first dispatch) and stay ~pixel-identical."""
    import cv2

    rng = np.random.RandomState(5)
    img = rng.rand(64, 64, 3).astype(np.float32)
    m = T.aug_rot_mat(T.make_aug_params(rng), 64)
    ref = cv2.warpAffine(img, m, (64, 64), flags=cv2.INTER_NEAREST,
                         borderValue=0.0)
    monkeypatch.setattr(T, "cv2", None)
    out = T.warp_image(img, m, 64, border=0.0)
    same = np.isclose(out, ref, atol=1e-6).mean()
    assert same > 0.98, same


def test_degenerate_half_returns_padding():
    """half <= 0 short-circuits to an all-padding crop (the C++ kernel's
    prefix/suffix padding assumes a monotone column map) — ADVICE r2."""
    img = (np.random.RandomState(0).rand(40, 40, 3) * 255).astype(np.uint8)
    for half in (0.0, -3.0):
        out = hostops.crop_resize_nearest(img, (20.0, 20.0), half, 8,
                                          pad_value=9.0)
        assert out.shape == (8, 8, 3)
        np.testing.assert_array_equal(out, np.full((8, 8, 3), 9.0,
                                                   np.float32))
    g = img[..., 0]
    out2 = hostops.crop_resize_nearest(g, (20.0, 20.0), 0.0, 8,
                                       pad_value=9.0)
    assert out2.shape == (8, 8)
    np.testing.assert_array_equal(out2, np.full((8, 8), 9.0, np.float32))
