"""RLE human-pose stack parity vs the imported reference modules
(hand/utils.py affine/heatmap decode, dataPreprocess/{transforms,bbox,
pose_utils,simple_transform,simple_transform_3d}.py) — VERDICT r1 item 4."""

import os
import random
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

REF = "/root/reference/hand"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

from mhentropy_tpu.data import pose_pipeline as pp  # noqa: E402
from mhentropy_tpu.data import transforms as hand_T  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    """Import the reference RLE modules with the same stubbing the other
    parity fixtures use (pycocotools/trimesh/torchvision absent; the 3D
    transform's dead Freihand import stubbed — SURVEY.md §2.2)."""
    from tests.test_preprocess_parity_torch import _stub

    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    _stub("pycocotools")
    _stub("pycocotools.coco", COCO=object)
    _stub("pycocotools.cocoeval", COCOeval=object)
    _stub("trimesh", Trimesh=object)
    _stub("open3d")
    _stub("imageio", imread=None)
    if "torchvision" not in sys.modules:
        import types

        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tff = types.ModuleType("torchvision.transforms.functional")
        tvu = types.ModuleType("torchvision.utils")
        tff.erase = lambda *a, **k: None
        tvu.save_image = lambda *a, **k: None
        tv.transforms = tf
        tv.utils = tvu
        tf.functional = tff
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
        sys.modules["torchvision.transforms.functional"] = tff
        sys.modules["torchvision.utils"] = tvu
    _stub("dataloader.Freihand_dataloader_3d", rotate=lambda *a, **k: None)
    from mhentropy_tpu.core import mano as mano_lib
    from tests.test_mano_parity_torch import _install_asset_stub

    _install_asset_stub(mano_lib.synthetic_mano_model(seed=0))
    sys.path.insert(0, REF)
    try:
        import utils as ref_utils
        from dataloader import dataset_transforms as ref_dt
        from dataloader.dataPreprocess import bbox as ref_bbox
        from dataloader.dataPreprocess import pose_utils as ref_pu
        from dataloader.dataPreprocess import simple_transform as ref_st
        from dataloader.dataPreprocess import simple_transform_3d as ref_st3
        from dataloader.dataPreprocess import transforms as ref_tf
    finally:
        sys.path.pop(0)
    return dict(utils=ref_utils, tf=ref_tf, bbox=ref_bbox, pu=ref_pu,
                st=ref_st, st3=ref_st3, dt=ref_dt)


def test_get_affine_transform_parity(ref):
    rng = np.random.RandomState(0)
    for _ in range(20):
        center = rng.uniform(30, 300, 2)
        scale = rng.uniform(40, 250, 2)
        rot = rng.uniform(-180, 180)
        out = [int(rng.choice([64, 128, 256])), int(rng.choice([64, 128, 256]))]
        shift = rng.uniform(-0.1, 0.1, 2).astype(np.float32)
        for inv in (0, 1):
            want = ref["utils"].get_affine_transform(
                center.copy(), scale.copy(), rot, out, shift=shift, inv=inv
            )
            got = pp.get_affine_transform(
                center.copy(), scale.copy(), rot, out, shift=shift, inv=inv
            )
            # cv2.getAffineTransform solves from float32 corner points; the
            # float64 solve here is the more precise of the two.
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_get_warpmatrix_parity(ref):
    """Both warp-matrix builders vs the imported reference — an earlier
    port rotated the opposite direction and dropped the pixel_std / *200
    scalings (caught in an r3 review; these two had no parity test)."""
    rng = np.random.RandomState(3)
    for _ in range(20):
        theta = float(rng.uniform(-180, 180))
        size_input = rng.uniform(100, 500, 2)
        size_dst = rng.uniform(50, 300, 2)
        size_target = rng.uniform(0.5, 3.0, 2)
        pixel_std = float(rng.choice([1.0, 200.0]))
        want = ref["tf"].get_warpmatrix(
            theta, size_input.copy(), size_dst.copy(), size_target.copy(),
            pixel_std)
        got = pp.get_warpmatrix(
            theta, size_input, size_dst, size_target, pixel_std)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        want_inv = ref["tf"].get_warpmatrix_inverse(
            theta, size_input.copy(), size_dst.copy(), size_target.copy())
        got_inv = pp.get_warpmatrix_inverse(
            theta, size_input, size_dst, size_target)
        np.testing.assert_allclose(got_inv, want_inv, rtol=1e-5, atol=1e-5)


def test_transform_preds_and_affine_parity(ref):
    rng = np.random.RandomState(1)
    center = np.array([120.0, 90.0])
    scale = np.array([200.0, 150.0])
    coords = rng.uniform(0, 255, (6, 2))
    for c in coords:
        want = ref["utils"].transform_preds(c.copy(), center, scale, [256, 256])
        got = pp.transform_preds(c.copy(), center, scale, [256, 256])
        np.testing.assert_allclose(got, want, atol=1e-6)
    t = pp.get_affine_transform(center, scale, 30.0, [256, 256])
    for c in coords:
        want = ref["utils"].affine_transform(c.copy(), t)
        got = pp.affine_transform(c.copy(), t)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_heatmap_to_coord_parity(ref):
    rng = np.random.RandomState(2)
    pred_jts = rng.uniform(-0.5, 0.5, (2, 17, 3)).astype(np.float32)
    scores = rng.rand(2, 17, 1).astype(np.float32)
    bbox = [40.0, 30.0, 210.0, 260.0]
    for out3d in (False, True):
        want_p, want_s = ref["utils"].heatmap_to_coord(
            torch.tensor(pred_jts), torch.tensor(scores), (64, 48), bbox,
            output_3d=out3d,
        )
        got_p, got_s = pp.heatmap_to_coord(
            pred_jts, scores, (64, 48), bbox, output_3d=out3d
        )
        np.testing.assert_allclose(got_p, want_p, atol=1e-5)
        np.testing.assert_allclose(got_s, want_s, atol=1e-6)


def test_heatmap_argmax_decode_parity(ref):
    rng = np.random.RandomState(3)
    hms = rng.rand(17, 64, 48).astype(np.float32)
    want_c, want_v = ref["tf"].get_max_pred(hms)
    got_c, got_v = pp.get_max_pred(hms)
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_v, want_v)
    bbox = [10.0, 20.0, 180.0, 240.0]
    want_p, want_m = ref["tf"].heatmap_to_coord_simple(hms, bbox)
    got_p, got_m = pp.heatmap_to_coord_simple(hms, bbox)
    np.testing.assert_allclose(got_p, np.asarray(want_p), atol=1e-4)
    np.testing.assert_array_equal(got_m, np.asarray(want_m))

    batch = rng.rand(3, 17, 64, 48).astype(np.float32)
    want_c, want_v = ref["tf"].get_max_pred_batch(batch)
    got_c, got_v = pp.get_max_pred_batch(batch)
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_v, want_v)


def test_flips_parity(ref):
    rng = np.random.RandomState(4)
    pairs = pp.PoseDataset.joint_pairs
    joints = np.zeros((17, 3, 2), np.float32)
    joints[:, :, 0] = rng.uniform(0, 255, (17, 3))
    joints[:, :, 1] = 1.0
    want = ref["tf"].flip_joints_3d(joints.copy(), 256, pairs)
    got = pp.flip_joints_3d(joints.copy(), 256, pairs)
    np.testing.assert_allclose(got, want, atol=1e-6)

    hm = rng.rand(2, 17, 64, 48).astype(np.float32)
    want = ref["tf"].flip_heatmap(torch.tensor(hm), pairs, shift=False)
    got = pp.flip_heatmap(hm, pairs, shift=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)
    # shift=True: the reference's in-place overlapping torch copy is UB
    # (smears); check the intended one-column shift instead.
    got = pp.flip_heatmap(hm, pairs, shift=True)
    base = pp.flip_heatmap(hm, pairs, shift=False)
    np.testing.assert_array_equal(got[..., 1:], base[..., :-1])
    np.testing.assert_array_equal(got[..., 0], base[..., 0])

    jts = rng.uniform(-0.5, 0.5, (2, 17 * 3)).astype(np.float32)
    sc = rng.rand(2, 17, 1).astype(np.float32)
    for shift in (False, True):
        want_j, want_s = ref["tf"].flip_coord(
            (torch.tensor(jts.copy()), torch.tensor(sc.copy())), pairs, 48,
            shift=shift, flatten=True,
        )
        got_j, got_s = pp.flip_coord(
            (jts.copy(), sc.copy()), pairs, 48, shift=shift, flatten=True
        )
        np.testing.assert_allclose(got_j, want_j.numpy(), atol=1e-6)
        np.testing.assert_allclose(got_s, want_s.numpy(), atol=1e-6)


def test_bbox_helpers_parity(ref):
    rng = np.random.RandomState(5)
    for _ in range(10):
        x, y = rng.uniform(0, 100, 2)
        w, h = rng.uniform(5, 120, 2)
        ar = rng.uniform(0.5, 2.0)
        want = ref["bbox"]._box_to_center_scale(x, y, w, h, ar)
        got = pp.box_to_center_scale(x, y, w, h, ar)
        np.testing.assert_allclose(got[0], want[0], atol=1e-5)
        np.testing.assert_allclose(got[1], want[1], atol=1e-5)
        np.testing.assert_allclose(
            pp.center_scale_to_box(*got), ref["bbox"]._center_scale_to_box(*want),
            atol=1e-5,
        )
    xywh = (10.0, 20.0, 30.0, 40.0)
    assert pp.bbox_xywh_to_xyxy(xywh) == ref["bbox"].bbox_xywh_to_xyxy(xywh)
    xyxy = (10.0, 20.0, 39.0, 59.0)
    assert pp.bbox_xyxy_to_xywh(xyxy) == ref["bbox"].bbox_xyxy_to_xywh(xyxy)
    assert pp.bbox_clip_xyxy((-5, -2, 500, 700), 256, 256) == ref[
        "bbox"
    ].bbox_clip_xyxy((-5, -2, 500, 700), 256, 256)
    a = rng.uniform(0, 100, (4, 4)); a[:, 2:] = a[:, :2] + 50
    b = rng.uniform(0, 100, (3, 4)); b[:, 2:] = b[:, :2] + 60
    np.testing.assert_allclose(
        pp.bbox_iou(a, b), ref["bbox"].bbox_iou(a, b), atol=1e-8
    )


class _DummyDs:
    joint_pairs = pp.PoseDataset.joint_pairs
    num_joints_half_body = 8
    prob_half_body = 0.3
    upper_body_ids = pp.PoseDataset.upper_body_ids
    lower_body_ids = pp.PoseDataset.lower_body_ids
    root_idx = 0
    bbox_3d_shape = (2000, 2000, 2000)
    skeleton = ()


def _ref_simple_transform(ref, train):
    return ref["st"].SimpleTransform(
        _DummyDs(), scale_factor=0.3, input_size=(256, 192),
        output_size=(64, 48), rot=40, sigma=2, train=train, loss_type="coord",
    )


def _our_simple_transform(train):
    return pp.SimpleTransform(
        _DummyDs(), scale_factor=0.3, input_size=(256, 192),
        output_size=(64, 48), rot=40, sigma=2, train=train, loss_type="coord",
    )


def _label(rng, k=17, w=320, h=240):
    joints = np.zeros((k, 3, 2), np.float32)
    joints[:, 0, 0] = rng.uniform(40, w - 40, k)
    joints[:, 1, 0] = rng.uniform(30, h - 30, k)
    joints[:, :2, 1] = 1.0
    joints[rng.choice(k, 3, replace=False), :, 1] = 0.0
    return {
        "bbox": (50.0, 40.0, 270.0, 200.0),
        "joints_3d": joints,
        "width": w,
        "height": h,
    }


def test_target_generators_parity(ref):
    rng = np.random.RandomState(6)
    label = _label(rng)
    tr_ref = _ref_simple_transform(ref, train=False)
    tr_ref.num_joints = 17
    joints = label["joints_3d"]
    want_hm, want_hm_w = tr_ref._target_generator(joints.copy(), 17)
    got_hm, got_hm_w = pp.gaussian_heatmap_target(
        joints.copy(), 17, (64, 48), np.array((256, 192)) / np.array((64, 48)),
        2,
    )
    np.testing.assert_allclose(got_hm, want_hm, atol=1e-6)
    np.testing.assert_array_equal(got_hm_w, want_hm_w)

    want = tr_ref._integral_target_generator(joints.copy(), 17, 256, 192)
    got = pp.integral_target_2d(joints.copy(), 17, 256, 192)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6)

    # 3D integral targets.
    tr3_ref = ref["st3"].SimpleTransform3D(
        _DummyDs(), scale_factor=0.3, color_factor=0.2, occlusion=False,
        add_dpg=False, input_size=(256, 256), output_size=(64, 64),
        bbox_3d_shape=(2000, 2000, 2000), rot=40, sigma=2, train=False,
        loss_type="coord",
    )
    j3 = np.zeros((17, 3, 2), np.float32)
    j3[:, 0, 0] = rng.uniform(0, 255, 17)
    j3[:, 1, 0] = rng.uniform(0, 255, 17)
    j3[:, 2, 0] = rng.uniform(-900, 900, 17)
    j3[:, :, 1] = 1.0
    want_t, want_w = tr3_ref._integral_target_generator(j3.copy(), 17, 256, 256)
    got_t, got_w = pp.integral_target_3d(j3.copy(), 17, 256, 256, 2000)
    np.testing.assert_allclose(got_t, want_t, atol=1e-6)
    np.testing.assert_array_equal(got_w, want_w)


def test_simple_transform_eval_parity(ref):
    """Full __call__ in eval mode (no RNG): image crop + targets + bbox."""
    rng = np.random.RandomState(7)
    label = _label(rng)
    src = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
    import copy

    # deepcopy per call: both transforms mutate joints_3d in place.
    want = _ref_simple_transform(ref, train=False)(
        src.copy(), copy.deepcopy(label)
    )
    got = _our_simple_transform(train=False)(src.copy(), copy.deepcopy(label))
    # Reference image is CHW torch; ours is HWC (NHWC is the TPU layout).
    np.testing.assert_allclose(
        got["image"].transpose(2, 0, 1), want["image"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(got["target_uv"], want["target_uv"].numpy(),
                               atol=1e-6)
    np.testing.assert_array_equal(
        got["target_uv_weight"], want["target_uv_weight"].numpy()
    )
    np.testing.assert_allclose(got["target_hm"], want["target_hm"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(got["bbox"], want["bbox"].numpy(), atol=1e-4)


def test_simple_transform_train_parity_seeded(ref):
    """Train mode consumes RNG in the reference's exact order, so seeding
    random+np.random identically must reproduce the augmentation."""
    rng = np.random.RandomState(8)
    label = _label(rng)
    src = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)

    import copy

    random.seed(123); np.random.seed(123)
    want = _ref_simple_transform(ref, train=True)(
        src.copy(), copy.deepcopy(label)
    )
    random.seed(123); np.random.seed(123)
    got = _our_simple_transform(train=True)(src.copy(), copy.deepcopy(label))
    # With a random rotation the float64-vs-cv2-float32 affine solve moves
    # sample positions ~1e-5 px; bilinear on uint8 may shift isolated pixels
    # by one level (1/255).
    np.testing.assert_allclose(
        got["image"].transpose(2, 0, 1), want["image"].numpy(), atol=1.1 / 255
    )
    np.testing.assert_allclose(got["target_uv"], want["target_uv"].numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(got["bbox"], want["bbox"].numpy(), atol=1e-4)


def test_simple_transform_3d_eval_parity(ref):
    rng = np.random.RandomState(9)
    k = 17
    label = {
        "bbox": (40.0, 30.0, 260.0, 220.0),
        "joint_img": np.stack([
            rng.uniform(50, 250, k), rng.uniform(40, 210, k),
            rng.uniform(-400, 400, k),
        ], 1).astype(np.float32),
        "joint_vis": np.ones((k, 3), np.float32),
        "root_cam": np.array([0.0, 0.0, 4500.0], np.float32),
        "width": 320, "height": 240,
        "f": np.array([1145.0, 1143.8], np.float32),
        "c": np.array([160.0, 120.0], np.float32),
        "action": 5,
    }
    src = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
    kwargs = dict(
        scale_factor=0.3, color_factor=0.2, occlusion=False, add_dpg=False,
        input_size=(256, 256), output_size=(64, 64),
        bbox_3d_shape=(2000, 2000, 2000), rot=40, sigma=2, train=False,
        loss_type="coord",
    )
    import copy

    want = ref["st3"].SimpleTransform3D(_DummyDs(), **kwargs)(
        src.copy(), copy.deepcopy(label)
    )
    got = pp.SimpleTransform3D(_DummyDs(), **kwargs)(
        src.copy(), copy.deepcopy(label)
    )
    np.testing.assert_allclose(
        got["image"].transpose(2, 0, 1), want["image"].numpy(), atol=1e-5
    )
    for key in ("target_uvd", "target_uvd_weight", "target_xyz", "st",
                "st_cam", "root_xyz", "bbox"):
        np.testing.assert_allclose(
            got[key], np.asarray(want[key]), atol=2e-4, err_msg=key
        )
    assert got["action"] == want["action"]


def test_pose_utils_parity(ref):
    rng = np.random.RandomState(10)
    s1 = rng.randn(17, 3)
    s2 = rng.randn(17, 3) * 1.5 + 0.3
    np.testing.assert_allclose(
        pp.compute_similarity_transform(s1.copy(), s2.copy()),
        ref["pu"].compute_similarity_transform(s1.copy(), s2.copy()),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        pp.rigid_align(s1.copy(), s2.copy()),
        ref["pu"].rigid_align(s1.copy(), s2.copy()), atol=1e-8,
    )
    cam = rng.randn(17, 3) * 100 + np.array([0, 0, 4000])
    f = np.array([1145.0, 1143.8]); c = np.array([160.0, 120.0])
    np.testing.assert_allclose(pp.cam2pixel(cam, f, c),
                               ref["pu"].cam2pixel(cam, f, c), atol=1e-8)
    pix = ref["pu"].cam2pixel(cam, f, c)
    np.testing.assert_allclose(pp.pixel2cam(pix, f, c),
                               ref["pu"].pixel2cam(pix, f, c), atol=1e-8)
    k_mat = ref["pu"].get_intrinsic_metrix(f, c)
    np.testing.assert_allclose(pp.get_intrinsic_metrix(f, c), k_mat)
    # cam2pixel_matrix consumes a (3, 4) projection matrix (a (3, 3)
    # intrinsic crashes in the reference too — homogeneous coords).
    p_mat = np.concatenate([k_mat, np.zeros((3, 1), np.float32)], 1)
    np.testing.assert_allclose(
        pp.cam2pixel_matrix(cam, p_mat), ref["pu"].cam2pixel_matrix(cam, p_mat),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        pp.pixel2cam_matrix(pix, k_mat), ref["pu"].pixel2cam_matrix(pix, k_mat),
        atol=1e-8,
    )
    want_i, want_p = ref["pu"].weak_cam2pixel(cam, 4000.0, f, c)
    got_i, got_p = pp.weak_cam2pixel(cam, 4000.0, f, c)
    np.testing.assert_allclose(got_i, want_i, atol=1e-8)
    np.testing.assert_allclose(got_p, want_p, atol=1e-8)


def test_target_transform_rle_branches_parity(ref):
    """coco / human3.6m branches of target_transform
    (dataset_transforms.py:15-33)."""
    rng = np.random.RandomState(11)
    b, k = 3, 17
    image = rng.rand(b, 3, 64, 64).astype(np.float32)

    coco_target = {
        "target_uv": rng.rand(b, k * 2).astype(np.float32),
        "target_uv_weight": rng.rand(b, k * 2).astype(np.float32),
    }
    data_t = (torch.tensor(image),
              {kk: torch.tensor(v) for kk, v in coco_target.items()},
              None, None)
    _, want = ref["dt"].target_transform(data_t, "coco")
    _, got = hand_T.target_transform((image, coco_target, None, None), "coco")
    np.testing.assert_allclose(got["crop_uv"], want["crop_uv"].numpy())
    np.testing.assert_allclose(
        got["target_uv_weight"], want["target_uv_weight"].numpy()
    )

    uvd_w = (rng.rand(b, k, 3) > 0.2).astype(np.float32)
    uvd_w[:] = uvd_w[:, :, :1]
    h36m_target = {
        "target_xyz": rng.randn(b, k * 3).astype(np.float32),
        "target_uvd_weight": uvd_w.reshape(b, -1),
        "target_uvd": rng.randn(b, k * 3).astype(np.float32),
        "st": rng.randn(b, 3).astype(np.float32),
        "st_cam": rng.randn(b, 4).astype(np.float32),
        "action": np.arange(b),
        "root_xyz": rng.randn(b, 3).astype(np.float32),
    }
    data_t = (torch.tensor(image),
              {kk: torch.tensor(v) for kk, v in h36m_target.items()},
              None, None)
    _, want = ref["dt"].target_transform(data_t, "human3.6m")
    _, got = hand_T.target_transform(
        (image, h36m_target, None, None), "human3.6m"
    )
    for key in ("pose3d", "target_uvd_weight", "scale", "crop_uv", "vis",
                "st", "st_cam", "action", "pose3d_root"):
        np.testing.assert_allclose(
            got[key], np.asarray(want[key]), atol=1e-6, err_msg=key
        )


def test_pose_dataset_coco_format(tmp_path):
    """PoseDataset reads COCO-format annotations without pycocotools and
    yields (img, target, img_id, bbox) like CustomDataset
    (custom.py:87-102)."""
    import cv2
    import json as json_lib

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(12)
    images, annotations = [], []
    for i in range(3):
        arr = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
        name = f"{100 + i}.jpg"
        cv2.imwrite(str(img_dir / name), arr)
        images.append({"id": 100 + i, "file_name": name, "width": 320,
                       "height": 240})
        kps = []
        for _ in range(17):
            kps += [float(rng.uniform(60, 260)), float(rng.uniform(50, 190)),
                    2.0]
        annotations.append({
            "id": i, "image_id": 100 + i, "category_id": 1,
            "bbox": [50.0, 40.0, 200.0, 160.0], "keypoints": kps,
        })
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "person"}]}
    with open(tmp_path / "ann.json", "w") as fp:
        json_lib.dump(ann, fp)

    ds = pp.PoseDataset(
        train=False, ROOT=str(tmp_path), IMG_PREFIX="imgs", ANN="ann.json",
        PRESET={"IMAGE_SIZE": (256, 192), "HEATMAP_SIZE": (64, 48),
                "SIGMA": 2},
        heatmap2coord="coord",
    )
    assert len(ds) == 3
    img, target, img_id, bbox = ds[0]
    assert img.shape == (256, 192, 3)
    assert img_id == 100
    assert target["target_uv"].shape == (34,)
    assert target["target_hm"].shape == (17, 64, 48)
    assert len(bbox) == 4
    # Decode roundtrip: GT integral targets map back near the original
    # keypoints through heatmap_to_coord.
    uv = target["target_uv"].reshape(1, 17, 2)
    preds, _ = pp.heatmap_to_coord(
        np.concatenate([uv, np.zeros((1, 17, 1))], -1),
        np.ones((1, 17, 1)), (64, 48), bbox,
    )
    gt = np.array(annotations[0]["keypoints"]).reshape(17, 3)[:, :2]
    valid = (np.abs(uv[0]) < 0.5).all(-1)
    np.testing.assert_allclose(preds[0, valid, :2], gt[valid], atol=1e-3)
