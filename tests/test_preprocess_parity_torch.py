"""RHD host-preprocessing parity vs the reference's actual preprocess.py /
augment.py (pure numpy/cv2 functions, imported directly)."""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

REF = "/root/reference/hand"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

from mhentropy_tpu.data import rhd, transforms as T  # noqa: E402


def _stub(name, **attrs):
    import types

    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_preprocess():
    # The reference targets numpy<1.20 (np.float alias); restore it.
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    # Absent heavy deps pulled in by utils/viz (not on the tested paths).
    _stub("pycocotools")
    _stub("pycocotools.coco", COCO=object)
    _stub("pycocotools.cocoeval", COCOeval=object)
    _stub("trimesh", Trimesh=object)
    _stub("open3d")
    from mhentropy_tpu.core import mano as mano_lib
    from tests.test_mano_parity_torch import _install_asset_stub

    _install_asset_stub(mano_lib.synthetic_mano_model(seed=0))
    sys.path.insert(0, REF)
    try:
        from dataloader.dataPreprocess import augment as ref_augment
        from dataloader.dataPreprocess import preprocess as ref_preprocess
    finally:
        sys.path.pop(0)

    # Reference defect: its own uvd2xyz unconditionally raises
    # NotImplementedError (preprocess.py:144-145), which breaks
    # depth2cloud/preprocessSample upstream (the RHD loader is unreachable
    # from make_ds_dl, so it went unnoticed — SURVEY.md §2.2). Restore the
    # function's own dead body so the rest of the pipeline runs.
    def _uvd2xyz(uvd, cam):
        f, u0 = cam[0, 0], cam[0, 2]
        x = (uvd[:, 0] - u0) * uvd[:, 2] / f
        y = (uvd[:, 1] - u0) * uvd[:, 2] / f
        return np.stack([x, y, uvd[:, 2]], 1)

    ref_preprocess.uvd2xyz = _uvd2xyz
    return ref_preprocess, ref_augment


def _rhd_sample(seed=0):
    rng = np.random.RandomState(seed)
    xyz_r = np.stack(
        [rng.uniform(-0.05, 0.05, 21), rng.uniform(-0.05, 0.05, 21),
         rng.uniform(0.45, 0.55, 21)], 1
    ).astype(np.float64)
    xyz = np.concatenate([xyz_r + 0.5, xyz_r])
    cam = np.array([[300.0, 0, 160.0], [0, 300.0, 160.0], [0, 0, 1.0]])
    uv = (xyz[:, :2] / xyz[:, 2:3]) * 300.0 + 160.0
    vis = np.ones(42, bool)
    image = rng.randint(0, 255, (320, 320, 3), np.uint8)
    mask = np.zeros((320, 320), np.uint8)
    u = np.clip(uv[21:, 0].astype(int), 2, 317)
    v = np.clip(uv[21:, 1].astype(int), 2, 317)
    for uu, vv in zip(u, v):
        mask[vv - 2 : vv + 2, uu - 2 : uu + 2] = 20
    depth = np.full((320, 320), 2.0, np.float64)
    depth[mask > 17] = 0.5
    return image, depth, mask, uv, vis, xyz, cam


def test_preprocess_sample_core_outputs(ref_preprocess):
    ref_pp, _ = ref_preprocess
    image, depth, mask, uv, vis, xyz, cam = _rhd_sample()
    (img_c, dep_c, cloud_n, pose_n, cloud_vc, pose_vc, view_rot, scale,
     hand_side, heatmap, (crop_center, crop_size, pose_root), (s, t),
     crop_uv, uv_vis, mask_c) = ref_pp.preprocessSample(
        image, depth, mask, uv, vis, xyz, cam
    )

    # Pose normalisation parity.
    ours_pose, ours_root, ours_bone = T.normalize_pose3d_np(xyz[-21:], 12, 11)
    np.testing.assert_allclose(ours_pose, pose_n, atol=1e-6)
    np.testing.assert_allclose(ours_bone, scale, rtol=1e-6)

    # Crop geometry parity (root-centred, x1.3 of visible extent).
    centre = uv[-21:][12]
    size = np.max(np.abs(uv[-21:][vis[-21:]] - centre)) * 1.3
    np.testing.assert_allclose(centre, crop_center, atol=1e-9)
    np.testing.assert_allclose(size, crop_size, rtol=1e-9)

    # Crop-space uv parity.
    ours_crop_uv = (uv[-21:] - centre) * (256.0 / (2 * size)) + 128
    np.testing.assert_allclose(ours_crop_uv, crop_uv, atol=1e-4)

    # View-correction rotation parity.
    ours_rot, _, ours_pose_vc = rhd.view_correction(
        centre, cam, xyz[-21:], xyz[-21:]
    )
    np.testing.assert_allclose(ours_rot, view_rot, atol=1e-6)
    ref_vc_unnorm = pose_vc * scale + (ours_pose_vc[12])[None]
    np.testing.assert_allclose(
        (ours_pose_vc - ours_pose_vc[12]) / scale, pose_vc, atol=1e-5
    )

    # Heatmap parity (64^2, sigma 6, visible in-bounds joints only).
    ours_hm = rhd.gaussian_heatmaps(
        (uv[-21:] - centre) * (64.0 / (2 * size)) + 32, 64, vis[-21:]
    )
    np.testing.assert_allclose(ours_hm, heatmap, atol=1e-5)

    # Image crop parity (crop + nearest resize path).
    ours_img = T.crop_resize(image.astype(np.float32), centre, size, 256)
    np.testing.assert_allclose(ours_img, img_c.astype(np.float32), atol=1e-5)


def test_flip_parity_with_reference_processing(ref_preprocess):
    """augment.processing's left-hand flip (eval path) vs flip_left_to_right."""
    _, ref_aug = ref_preprocess
    rng = np.random.RandomState(1)
    image = rng.rand(256, 256, 3).astype(np.float32)
    depth = rng.rand(256, 256, 1).astype(np.float32)
    cloud = rng.randn(400, 3)
    heatmap = rng.rand(64, 64, 21).astype(np.float32)
    pose3d = rng.randn(21, 3)
    uv = rng.uniform(0, 255, (21, 2))
    mask = rng.rand(256, 256).astype(np.float32)
    obj = rng.rand(256, 256).astype(np.float32)
    hand_side = np.array([1.0, 0.0])  # left -> flip

    img_r, _, _, _, pose_r, uv_r, mask_r, obj_r = ref_aug.processing(
        image.copy(), depth.copy(), cloud.copy(), heatmap, pose3d.copy(),
        hand_side, uv.copy(), mask.copy(), obj.copy(),
    )
    img_o, uv_o, pose_o, (mask_o, obj_o) = T.flip_left_to_right(
        image, uv, pose3d, (mask, obj), 256
    )
    np.testing.assert_allclose(img_o, img_r, atol=1e-6)
    np.testing.assert_allclose(uv_o.reshape(-1), uv_r, atol=1e-6)
    np.testing.assert_allclose(pose_o.reshape(-1), pose_r, atol=1e-6)
    np.testing.assert_allclose(mask_o, mask_r, atol=1e-6)


@pytest.fixture(scope="module")
def ref_rhdloader(ref_preprocess):
    """Import the reference's rhddataloader (pure functions only); its
    torchvision/matplotlib imports are stubbed/satisfied."""
    import types

    if "torchvision" not in sys.modules:
        # Keep this stub a SUPERSET of what every reference module the
        # suite imports needs (incl. torchvision.utils for
        # simple_transform_3d) — stubs leak across test modules via
        # sys.modules, and a later fixture skips installation when
        # "torchvision" is already present (order-dependent failures
        # otherwise: this module before test_pose_pipeline_parity).
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tff = types.ModuleType("torchvision.transforms.functional")
        tvu = types.ModuleType("torchvision.utils")
        tff.erase = lambda *a, **k: None
        tvu.save_image = lambda *a, **k: None
        tf.functional = tff
        tv.transforms = tf
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
        sys.modules["torchvision.transforms.functional"] = tff
        sys.modules["torchvision.utils"] = tvu
    import matplotlib

    matplotlib.use("Agg")
    sys.path.insert(0, REF)
    try:
        from dataloader import rhddataloader as ref_rhd
    finally:
        sys.path.pop(0)
    return ref_rhd


def test_compute_st_parity(ref_rhdloader):
    rng = np.random.RandomState(7)
    pose = rng.randn(21, 3).astype(np.float32)
    uv = rng.uniform(-1, 1, (21, 2)).astype(np.float32)
    ref_st = ref_rhdloader.compute_st(pose.reshape(-1), uv.reshape(-1))
    ours = T.compute_st_np(pose, uv)
    np.testing.assert_allclose(ours, ref_st, rtol=1e-4, atol=1e-5)


def test_check_occlusion_parity(ref_rhdloader):
    from mhentropy_tpu.data import occlusion

    rng = np.random.RandomState(8)
    depth = rng.uniform(0.3, 0.8, (64, 64)).astype(np.float32)
    uv = rng.uniform(-3, 70, (42, 2))
    pose = np.stack([np.zeros(42), np.zeros(42),
                     rng.uniform(0.3, 0.8, 42)], 1)
    ref = ref_rhdloader.check_occlusion(uv, depth, pose, delta=0.02, quant=2)
    ours = occlusion.check_occlusion(uv, depth, pose, delta=0.02, quant=2)
    np.testing.assert_array_equal(ours, ref)


def test_check_wib_parity(ref_rhdloader):
    from mhentropy_tpu.data import occlusion

    rng = np.random.RandomState(9)
    uv = rng.uniform(-6, 262, (42, 2))
    ref = ref_rhdloader.check_wib(uv, (256, 256), quant=2)
    ours = occlusion.check_wib(uv, (256, 256), quant=2)
    np.testing.assert_array_equal(ours, ref)


def test_patch_occlusion_parity(ref_rhdloader):
    from mhentropy_tpu.data import occlusion

    rng = np.random.RandomState(10)
    img = (rng.rand(256, 256, 3) * 255).astype(np.float32)
    uv = rng.uniform(40, 210, (21, 2))
    for idx in (0, 3, 7):
        ref_img, ref_vis, (rcx, rcy, rr, ref_mask) = ref_rhdloader.patch_occlusion(
            img.copy(), size=50, vis=None, idx=idx, crop_uv=uv
        )
        our_img, our_vis, (cx, cy, r, our_mask) = occlusion.patch_occlusion(
            img, uv, idx=idx, size=50
        )
        assert (cx, cy, r) == (rcx, rcy, rr)
        np.testing.assert_allclose(our_img, ref_img, atol=1e-6)
        np.testing.assert_array_equal(our_vis, ref_vis)
        np.testing.assert_array_equal(our_mask, ref_mask)


def test_view_correction_joint_parity(ref_preprocess):
    """viewCorrectionJoint (preprocess.py:51-62) — the joints-only variant
    that, unlike viewCorrection, uses the true principal point v0."""
    ref_pre, _ = ref_preprocess
    rng = np.random.RandomState(9)
    cam = np.array([[283.1, 0, 160.0], [0, 283.1, 123.0], [0, 0, 1.0]])
    joints = rng.randn(21, 3)
    ref_rot, ref_j = ref_pre.viewCorrectionJoint((170.0, 140.0), cam, joints)
    rot, j = rhd.view_correction_joint((170.0, 140.0), cam, joints)
    np.testing.assert_allclose(rot, ref_rot, atol=1e-10)
    np.testing.assert_allclose(j, ref_j, atol=1e-10)
