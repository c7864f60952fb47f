"""Tests for the host-side data pipeline pure functions (visibility, crops,
augmentation, occlusion) — the weak-supervision-critical pieces."""

import numpy as np
import pytest

from mhentropy_tpu.data import occlusion, transforms as T


def test_coord_change_involution():
    xyz = np.random.RandomState(0).randn(21, 3).astype(np.float32)
    np.testing.assert_allclose(T.coord_change(T.coord_change(xyz)), xyz)


def test_projection_roundtrip_gl():
    rng = np.random.RandomState(1)
    k = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    xyz = rng.uniform(0.2, 0.8, (21, 3)).astype(np.float32)
    xyz[:, 2] *= -1  # OpenGL: along -z
    uvd = T.xyz2uvd_gl(xyz, k)
    back = T.uvd2xyz_gl(uvd, k)
    np.testing.assert_allclose(back, xyz, rtol=1e-5, atol=1e-6)


def test_crop_with_padding_in_and_out_of_bounds():
    img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    inside = T.crop_with_padding(img, (50, 50), 20)
    assert inside.shape == (40, 40, 3)
    np.testing.assert_array_equal(inside, img[30:70, 30:70])
    edge = T.crop_with_padding(img, (5, 5), 20)
    assert edge.shape == (40, 40, 3)
    assert (edge[0, 0] == 127).all()  # padded corner


def test_fuse_bbox_covers_both():
    b1 = np.array([10, 10, 50, 50], np.float32)
    b2 = np.array([40, 40, 120, 90], np.float32)
    centre, scale = T.fuse_bbox(b1, b2, (480, 640))
    assert scale >= 110 - 10
    assert 10 <= centre[0] <= 120 and 10 <= centre[1] <= 90


def test_depth_mask_visibility():
    depth = np.full((64, 64), 0.5, np.float32)  # 500mm surface
    mask = np.zeros((64, 64), bool)
    mask[20:40, 20:40] = True
    uvd = np.array(
        [
            [30, 30, 510.0],  # on mask, 10mm behind surface -> visible
            [30, 30, 560.0],  # 60mm behind -> occluded
            [5, 5, 510.0],  # off mask -> occluded
            [30, 30, 400.0],  # in FRONT of surface -> visible (signed test)
        ],
        np.float32,
    )
    vis = occlusion.depth_mask_visibility(uvd, mask, depth, quant=5, tol_mm=40)
    np.testing.assert_array_equal(vis, [True, False, False, True])


def test_check_occlusion_symmetric_tolerance():
    depth = np.full((64, 64), 0.5, np.float32)
    uv = np.array([[30, 30], [30, 30]], np.float32)
    pose = np.array([[0, 0, 0.51], [0, 0, 0.56]], np.float32)
    vis = occlusion.check_occlusion(uv, depth, pose, delta=0.02, quant=2)
    np.testing.assert_array_equal(vis, [1.0, 0.0])


def test_check_wib_and_demotion():
    # quant=2 windows are +-1 px; (255.5) clips back inside, (-5) stays out.
    uv = np.array([[10, 10], [300, 10], [255.5, 10]], np.float32)
    wib = occlusion.check_wib(uv, (256, 256), quant=2)
    np.testing.assert_array_equal(wib, [1.0, 0.0, 1.0])
    vis = np.array([1.0, 1.0, 0.0], np.float32)
    out = occlusion.demote_out_of_bounds(vis, uv, (256, 256), quant=2)
    assert out[1] == 2.0  # vis -> oob
    assert out[2] == 0.0  # patch-occluded stays 0


def test_patch_occlusion_deterministic_and_marks_vis():
    rng = np.random.RandomState(0)
    img = rng.rand(256, 256, 3).astype(np.float32)
    uv = rng.uniform(60, 200, (21, 2)).astype(np.float32)
    out1, vis1, (cx1, cy1, r1, m1) = occlusion.patch_occlusion(img, uv, idx=7)
    out2, vis2, (cx2, cy2, r2, m2) = occlusion.patch_occlusion(img, uv, idx=7)
    np.testing.assert_array_equal(out1, out2)  # deterministic per index
    assert (cx1, cy1) == tuple(uv[occlusion.PATCH_KP_CYCLE[7 % 5]].astype(int))
    # The centred keypoint itself must be occluded.
    assert vis1[occlusion.PATCH_KP_CYCLE[7 % 5]] == 0.0
    # Pixels inside the circle are zeroed.
    assert out1[cy1, cx1].sum() == 0.0
    # A different index occludes a different finger.
    _, vis3, _ = occlusion.patch_occlusion(img, uv, idx=8)
    assert not np.array_equal(vis1, vis3)


def test_augmentation_consistency_uv_vs_pose():
    """After augmentation the orthographic relation uv = s*xyz+t must still be
    solvable: re-fitting (s,t) reproduces the augmented uv."""
    rng = np.random.RandomState(3)
    pose = rng.randn(21, 3).astype(np.float32)
    pose, _, _ = T.normalize_pose3d_np(pose, 12, 11)
    s_cam, t_cam = 60.0, np.array([128.0, 128.0])
    uv = pose[:, :2] * s_cam + t_cam  # pixel-space ortho camera

    params = T.make_aug_params(rng)
    m = T.aug_rot_mat(params, 256)
    pose_aug = T.rotate_xy(pose, params["angle"])
    uv_aug = T.apply_affine_uv(uv, m)

    st = T.compute_st_np(pose_aug, uv_aug)
    recon = pose_aug[:, :2] * st[0] + st[1:]
    np.testing.assert_allclose(recon, uv_aug, atol=0.2)


def test_flip_left_to_right():
    img = np.zeros((256, 256, 3), np.float32)
    img[0, 0] = 1.0
    uv = np.array([[10.0, 20.0]] * 21)
    pose = np.ones((21, 3), np.float32)
    img2, uv2, pose2, _ = T.flip_left_to_right(img, uv, pose)
    assert img2[0, 255, 0] == 1.0
    assert uv2[0, 0] == 245.0
    assert pose2[0, 0] == -1.0


def test_rhd_heatmaps_and_view_correction():
    from mhentropy_tpu.data import rhd

    uv = np.array([[32.0, 32.0], [100.0, 5.0]] + [[2.0, 2.0]] * 19)
    vis = np.ones(21)
    hm = rhd.gaussian_heatmaps(uv, 64, vis)
    assert hm.shape == (64, 64, 21)
    assert hm[:, :, 0].max() > 0.99  # peak at the joint
    assert hm[:, :, 1].max() == 0.0  # out-of-bounds joint suppressed

    cam = np.array([[300.0, 0, 160], [0, 300.0, 160], [0, 0, 1]])
    joints = np.random.RandomState(0).uniform(0.2, 0.6, (21, 3))
    rot, _, j2 = rhd.view_correction(np.array([200.0, 180.0]), cam, joints, joints)
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-10)
    # Rigid: pairwise distances preserved.
    d1 = np.linalg.norm(joints[:, None] - joints[None], axis=-1)
    d2 = np.linalg.norm(j2[:, None] - j2[None], axis=-1)
    np.testing.assert_allclose(d1, d2, atol=1e-10)


def test_target_transform_adds_weight():
    image = np.zeros((2, 8, 8, 3), np.float32)
    target = {"pose3d": np.zeros((2, 63), np.float32)}
    _, out = T.target_transform((image, target), "ho3d")
    assert out["target_uvd_weight"].shape == (2, 63)
    assert "image" in out


def test_prefetch_preserves_order_and_exhausts():
    from mhentropy_tpu.data import common

    items = list(range(57))
    out = list(common.prefetch(iter(items), size=3))
    assert out == items


def test_prefetch_propagates_producer_exception():
    from mhentropy_tpu.data import common

    def gen():
        yield 1
        yield 2
        raise ValueError("boom in producer")

    it = common.prefetch(gen(), size=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom in producer"):
        next(it)


def test_prefetch_early_abandon_stops_producer():
    import threading
    import time

    from mhentropy_tpu.data import common

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = common.prefetch(gen(), size=2)
    assert next(it) == 0
    it.close()  # abandon: the bounded queue must unblock the producer
    n_after_close = len(produced)
    time.sleep(0.5)
    # Producer stopped: no unbounded draining of the source after close
    # (at most the in-flight puts complete).
    assert len(produced) <= n_after_close + 3
    assert threading.active_count() < 50  # no thread pile-up


def test_imread_matches_imageio(tmp_path):
    """common.imread (direct PIL) must decode byte-identically to the
    imageio.v2 path it replaced — RGB, grayscale, and RGB-packed-depth
    PNGs (the three RHD file kinds)."""
    import imageio.v2 as imageio

    from mhentropy_tpu.data import common

    rng = np.random.RandomState(0)
    arrays = {
        "rgb.png": rng.randint(0, 255, (37, 41, 3), np.uint8),
        "gray.png": rng.randint(0, 255, (37, 41), np.uint8),
    }
    for name, arr in arrays.items():
        path = str(tmp_path / name)
        imageio.imwrite(path, arr)
        ours = common.imread(path)
        ref = imageio.imread(path)
        np.testing.assert_array_equal(ours, ref)
        assert ours.dtype == ref.dtype and ours.shape == ref.shape


def test_imread_decode_cache(tmp_path):
    """The decoded-image cache must return identical, PRIVATE (writable)
    arrays, hit the cache on re-read, and invalidate when the source file
    changes (mtime/size key)."""
    import imageio.v2 as imageio

    from mhentropy_tpu.data import common

    rng = np.random.RandomState(1)
    path = str(tmp_path / "img.png")
    cache = str(tmp_path / "cache")
    arr = rng.randint(0, 255, (24, 30, 3), np.uint8)
    imageio.imwrite(path, arr)
    try:
        common.set_decode_cache(cache)
        first = common.imread(path)
        np.testing.assert_array_equal(first, arr)
        first[0, 0, 0] = 7  # miss path must also be private + writable
        import os

        cached_files = os.listdir(cache)
        assert len(cached_files) == 1
        second = common.imread(path)
        np.testing.assert_array_equal(second, arr)
        second[0, 0, 0] = 99  # private + writable (mmap is copied)
        np.testing.assert_array_equal(common.imread(path), arr)
        # Source change -> new cache entry, new contents.
        arr2 = rng.randint(0, 255, (24, 30, 3), np.uint8)
        imageio.imwrite(path, arr2)
        os.utime(path, ns=(1, 1))  # force a distinct mtime key
        np.testing.assert_array_equal(common.imread(path), arr2)
    finally:
        common.set_decode_cache(None)
    # Disabled again: plain decode still works.
    np.testing.assert_array_equal(common.imread(path), arr2)


def test_grid2d_cached_and_immutable():
    from mhentropy_tpu.data import common

    g1 = common.grid2d(5, 7)
    g2 = common.grid2d(5, 7)
    assert g1 is g2  # cached
    y, x = g1
    np.testing.assert_array_equal(y, np.mgrid[0:5, 0:7][0])
    np.testing.assert_array_equal(x, np.mgrid[0:5, 0:7][1])
    with pytest.raises(ValueError):
        g1[0][0, 0] = 9  # read-only: consumers must not corrupt the cache


def test_simple_transform_3d_heatmap_mode_works():
    """loss_type='heatmap' previously doubled the Gaussian heatmaps and
    crashed compute_st_np by misreading the (K,H,W) tensor as uvd coords
    (r5 review finding). It must emit proper heatmaps AND a valid st fit."""
    from mhentropy_tpu.data import pose_pipeline as pp

    rng = np.random.RandomState(11)
    k = 17

    class _DS:
        joint_pairs = pp.PoseDataset.joint_pairs
        root_idx = 0

    tr = pp.SimpleTransform3D(
        _DS(), scale_factor=0, color_factor=0, occlusion=False,
        add_dpg=False, input_size=(64, 64), output_size=(16, 16),
        bbox_3d_shape=(2000, 2000, 2000), rot=0, sigma=2, train=False,
        loss_type="heatmap",
    )
    label = {
        "bbox": (4.0, 3.0, 60.0, 58.0),
        "joint_img": np.stack([
            rng.uniform(8, 56, k), rng.uniform(6, 54, k),
            rng.uniform(-400, 400, k)], 1).astype(np.float32),
        "joint_vis": np.ones((k, 3), np.float32),
        "width": 64, "height": 64,
        "f": np.array([300.0, 300.0]), "c": np.array([32.0, 32.0]),
        "root_cam": np.array([0.0, 0.0, 800.0]),
    }
    src = rng.randint(0, 255, (64, 64, 3), np.uint8)
    out = tr(src, label)
    assert out["target_uvd"].shape == (k, 16, 16)
    # Gaussian peaks stay ~1.0 (the coord-space *2 must not touch them).
    assert 0.9 < out["target_uvd"].max() <= 1.0 + 1e-6
    assert np.isfinite(out["st"]).all() and np.isfinite(out["st_cam"]).all()


def test_pose_dataset_aug_is_order_independent_and_epoch_varied(tmp_path):
    """PoseDataset train augmentation is a pure function of
    (seed, epoch, idx) — fetching items in any order (the thread pool's
    reality) gives identical results, and set_epoch varies them (the hand
    loaders' r3 RNG discipline, extended to the RLE stack in r5)."""
    import json as _json

    from mhentropy_tpu.data import pose_pipeline as pp

    rng = np.random.RandomState(12)
    imgs, anns = [], []
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    import imageio.v2 as iio

    for i in range(3):
        name = f"{i:012d}.jpg"
        iio.imwrite(str(img_dir / name),
                    rng.randint(0, 255, (80, 96, 3), np.uint8))
        imgs.append({"id": i, "file_name": name, "width": 96, "height": 80})
        kps = []
        for _ in range(17):
            kps += [float(rng.uniform(10, 86)), float(rng.uniform(10, 70)),
                    2.0]
        anns.append({"image_id": i, "bbox": [8, 6, 80, 66],
                     "keypoints": kps, "category_id": 1})
    with open(tmp_path / "ann.json", "w") as fp:
        _json.dump({"images": imgs, "annotations": anns}, fp)

    def mk():
        return pp.PoseDataset(
            train=True, seed=5, ROOT=str(tmp_path), IMG_PREFIX="imgs",
            ANN="ann.json",
            PRESET={"IMAGE_SIZE": (64, 64), "HEATMAP_SIZE": (16, 16),
                    "SIGMA": 2},
            AUG={"SCALE_FACTOR": 0.3, "ROT_FACTOR": 40},
        )

    a, b = mk(), mk()
    fwd = [a[i] for i in range(3)]
    rev = [b[i] for i in (2, 1, 0)][::-1]
    for (ia, ta, _, _), (ib, tb, _, _) in zip(fwd, rev):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta["target_uv"], tb["target_uv"])
    b.set_epoch(1)
    diff = any(
        not np.array_equal(np.asarray(fwd[i][0]), np.asarray(b[i][0]))
        for i in range(3)
    )
    assert diff, "epoch advance did not vary the augmentation"


def test_colorjitter_ops_match_pil_exactly():
    """Each op reproduces the torchvision PIL backend bit-exactly:
    brightness/contrast/saturation are truncating PIL blends (verified:
    round-half-up was off by one on ~37% of pixels), hue is PIL's own HSV
    round trip."""
    from PIL import Image, ImageEnhance, ImageStat

    from mhentropy_tpu.data import colorjitter as cj

    rng = np.random.RandomState(21)
    for _ in range(5):
        a = rng.randint(0, 256, (24, 24, 3), np.uint8)
        im = Image.fromarray(a)
        f = float(rng.uniform(0.2, 1.8))
        np.testing.assert_array_equal(
            cj.adjust_brightness(a, f),
            np.asarray(ImageEnhance.Brightness(im).enhance(f)))
        np.testing.assert_array_equal(
            cj.adjust_contrast(a, f),
            np.asarray(ImageEnhance.Contrast(im).enhance(f)))
        np.testing.assert_array_equal(
            cj.adjust_saturation(a, f),
            np.asarray(ImageEnhance.Color(im).enhance(f)))
        h = float(rng.uniform(-0.1, 0.1))
        hsv = np.array(im.convert("HSV"))
        hsv[..., 0] = ((hsv[..., 0].astype(np.int16)
                        + np.int16(int(h * 255)) % 256) % 256).astype(np.uint8)
        want = np.asarray(Image.fromarray(hsv, "HSV").convert("RGB"))
        np.testing.assert_array_equal(cj.adjust_hue(a, h), want)
    # Identity factors are a no-op for the blend ops.
    a = rng.randint(0, 256, (8, 8, 3), np.uint8)
    for op in (cj.adjust_brightness, cj.adjust_contrast,
               cj.adjust_saturation):
        np.testing.assert_array_equal(op(a, 1.0), a)
    np.testing.assert_array_equal(cj.adjust_hue(a, 0.0),
                                  cj.adjust_hue(a, 0.0))


def test_colorjitter_param_semantics_and_determinism():
    from mhentropy_tpu.data import colorjitter as cj

    rng = np.random.RandomState(3)
    order, (b, c, s, h) = cj.sample_params(rng)
    assert sorted(order.tolist()) == [0, 1, 2, 3]
    assert 0.2 <= b <= 1.8 and 0.4 <= c <= 1.6 and 0.4 <= s <= 1.6
    assert -0.1 <= h <= 0.1
    img = np.random.RandomState(4).randint(0, 256, (16, 16, 3), np.uint8)
    a = cj.color_jitter(np.random.RandomState(9), img)
    b2 = cj.color_jitter(np.random.RandomState(9), img)
    np.testing.assert_array_equal(a, b2)
    assert a.dtype == np.uint8 and not np.array_equal(a, img)
