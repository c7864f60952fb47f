"""Parity for the SK stereo preprocessing + canonical frame vs the
reference's actual canonical_trafo.py / preprocessingSK.py (pure numpy/cv2,
imported directly)."""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

REF = "/root/reference/hand"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

from mhentropy_tpu.data import sk  # noqa: E402


@pytest.fixture(scope="module")
def ref_mods():
    # The reference targets numpy<1.24 (np.bool / np.float aliases).
    if not hasattr(np, "bool"):
        np.bool = bool  # noqa: NPY001
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    import matplotlib

    matplotlib.use("Agg")
    sys.path.insert(0, REF)
    try:
        from dataloader.dataPreprocess import canonical_trafo as ref_canon
        from dataloader.dataPreprocess import preprocessingSK as ref_sk
    finally:
        sys.path.pop(0)
    return ref_canon, ref_sk


def _sample_sk_scene(seed=0):
    rng = np.random.RandomState(seed)
    k_d = np.array([[480.0, 0, 320.0], [0, 480.0, 240.0], [0, 0, 1.0]])
    k_rgb = np.array([[500.0, 0, 322.0], [0, 500.0, 238.0], [0, 0, 1.0]])
    rotation = np.eye(3)
    translation = np.array([[8.0], [-5.0], [3.0]])
    # Hand ~520 mm deep, +-45 mm spread: projects in-bounds in both views.
    kp = np.array([[0, 0, 520.0]]).T + rng.uniform(-45, 45, (3, 21))
    image = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    depth = np.full((480, 640), 1000.0)  # outside the working range
    depth[200:290, 280:370] = 520.0 + rng.uniform(-25, 25, (90, 90))
    return image, depth, kp, k_rgb, k_d, rotation, translation


def test_canonical_trafo_parity(ref_mods):
    ref_canon, _ = ref_mods
    rng = np.random.RandomState(1)
    for seed in range(4):
        coords = rng.randn(1, 21, 3)
        ref_out, ref_rot = ref_canon.canonical_trafo(coords)
        out, rot = sk.canonical_trafo(coords)
        np.testing.assert_allclose(out, ref_out, atol=1e-6)
        np.testing.assert_allclose(rot, ref_rot, atol=1e-6)
    # Canonical frame invariants: root at origin, kp 12 on the y axis.
    np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 12, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 12, 2], 0.0, atol=1e-6)


def test_canonical_trafo_batched_matches_loop(ref_mods):
    # The reference's _stitch_mat_from_vecs hardcodes batch_size=1
    # (canonical_trafo.py:52) and mangles batches; ours must equal the
    # per-sample loop.
    ref_canon, _ = ref_mods
    coords = np.random.RandomState(2).randn(5, 21, 3)
    out, rot = sk.canonical_trafo(coords)
    for i in range(5):
        ref_out, ref_rot = ref_canon.canonical_trafo(coords[i : i + 1])
        np.testing.assert_allclose(out[i : i + 1], ref_out, atol=1e-6)
        np.testing.assert_allclose(rot[i : i + 1], ref_rot, atol=1e-6)


def test_flip_right_hand():
    # The reference's flip_right_hand calls .get_shape() on numpy arrays
    # (canonical_trafo.py:148) and crashes on any input — behaviour is
    # pinned directly instead: mirror z when right, identity when left.
    coords = np.random.RandomState(3).randn(2, 21, 3)
    flipped = sk.flip_right_hand(coords, np.array([True, False])[:, None, None])
    np.testing.assert_allclose(flipped[0, :, 2], -coords[0, :, 2])
    np.testing.assert_allclose(flipped[0, :, :2], coords[0, :, :2])
    np.testing.assert_allclose(flipped[1], coords[1])
    single = sk.flip_right_hand(coords[0], True)
    np.testing.assert_allclose(single, flipped[0])


def test_convert_kp_parity(ref_mods):
    _, ref_sk = ref_mods
    kp = np.random.RandomState(4).randn(21, 3)
    np.testing.assert_array_equal(sk.convert_kp(kp), ref_sk.convert_kp(kp))


def test_imcrop_parity(ref_mods):
    _, ref_sk = ref_mods
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    depth = rng.uniform(0, 1000, (480, 640))
    for center, half in [((320.0, 240.0), 60.0), ((30.0, 20.0), 80.0),
                         ((620.0, 470.0), 50.0)]:
        np.testing.assert_array_equal(
            sk.imcrop(img, center, half), ref_sk.imcrop(img, center, half)
        )
        np.testing.assert_array_equal(
            sk.imcrop(depth, center, half), ref_sk.imcrop(depth, center, half)
        )


def test_depth2mask_parity(ref_mods):
    _, ref_sk = ref_mods
    depth = np.random.RandomState(6).uniform(300, 800, (480, 640))
    got = sk.depth2mask(depth, (400, 650), (320.0, 240.0), 70.0)
    ref = ref_sk.depth2mask(depth, (400, 650), (320.0, 240.0), 70.0)
    np.testing.assert_array_equal(got, ref)


def test_view_correction_sk_parity(ref_mods):
    _, ref_sk = ref_mods
    rng = np.random.RandomState(7)
    cam = np.array([[480.0, 0, 320.0], [0, 480.0, 231.0], [0, 0, 1.0]])
    cloud = rng.randn(50, 3)
    joints = rng.randn(21, 3)
    rot_r, cloud_r, joints_r = ref_sk.viewCorrection(
        (300.0, 200.0), cam, cloud, joints
    )
    rot, cloud_o, joints_o = sk.view_correction_sk(
        (300.0, 200.0), cam, cloud, joints
    )
    np.testing.assert_allclose(rot, rot_r, atol=1e-10)
    np.testing.assert_allclose(cloud_o, cloud_r, atol=1e-10)
    np.testing.assert_allclose(joints_o, joints_r, atol=1e-10)


def test_preprocess_sample_sk_parity(ref_mods):
    _, ref_sk = ref_mods
    image, depth, kp, k_rgb, k_d, rotation, translation = _sample_sk_scene()

    np.random.seed(11)
    ref = ref_sk.preprocessSampleSK(
        image, depth, kp, k_rgb, k_d, rotation, translation
    )
    (r_img, r_depth, r_cloud, r_pose, r_cloud_vc, r_pose_vc, r_rot, r_scale,
     r_side, r_heat) = ref

    np.random.seed(11)
    got = sk.preprocess_sample_sk(
        image, depth, kp, k_rgb, k_d, rotation, translation
    )

    np.testing.assert_array_equal(got["image_crop"], r_img)
    np.testing.assert_allclose(got["depth_crop"], r_depth, atol=1e-4)
    np.testing.assert_allclose(got["pose3d"], r_pose, atol=1e-5)
    np.testing.assert_allclose(got["cloud"], r_cloud, atol=1e-5)
    np.testing.assert_allclose(got["cloud_vc"], r_cloud_vc, atol=1e-5)
    np.testing.assert_allclose(got["pose3d_vc"], r_pose_vc, atol=1e-5)
    np.testing.assert_allclose(got["view_rot"], r_rot, atol=1e-6)
    np.testing.assert_allclose(got["scale"], r_scale, atol=1e-7)
    np.testing.assert_array_equal(got["hand_side"], r_side)
    assert got["heatmaps"].shape == (64, 64, 21)
    np.testing.assert_allclose(got["heatmaps"], r_heat, atol=1e-5)


def test_flip_right_hand_per_sample_flags():
    # Natural (B,) per-sample flags must broadcast over the batch axis,
    # not the coordinate axis.
    coords = np.random.RandomState(8).randn(3, 21, 3)
    flipped = sk.flip_right_hand(coords, np.array([True, False, True]))
    np.testing.assert_allclose(flipped[0, :, 2], -coords[0, :, 2])
    np.testing.assert_allclose(flipped[1], coords[1])
    np.testing.assert_allclose(flipped[2, :, 2], -coords[2, :, 2])
    np.testing.assert_allclose(flipped[:, :, :2], coords[:, :, :2])


def test_depth2mask_edge_crop_keeps_valid_window():
    # Deliberate divergence from the reference: its raw negative-index
    # windowing (preprocessingSK.py:164-167, mask[:y1,:]=0 with y1<0)
    # wipes nearly the whole mask for crops past the top/left edge. Here
    # the window is clamped so edge crops keep the in-range region.
    depth = np.full((480, 640), 500.0)
    mask = sk.depth2mask(depth, (400, 650), (10.0, 10.0), 50.0)
    assert mask[:60, :60].all()
    assert not mask[61:, :].any() and not mask[:, 61:].any()
