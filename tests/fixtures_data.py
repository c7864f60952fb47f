"""Shared fabricated-dataset builders for loader/integration tests."""

import os
import pickle

import numpy as np

CAM = np.array([[300.0, 0, 160.0], [0, 300.0, 160.0], [0, 0, 1.0]], np.float32)


def write_png(path, arr):
    import imageio.v2 as iio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    iio.imwrite(path, arr)


def build_ho3d(root, n_train=1, n_eval=1, seed=2):
    """Miniature HO3D_v3-format dataset: n_train frames in sequence ABF10
    (train split) then n_eval frames in ABF14 (one of the held-out eval
    sequences, ho3d_dataloader.py:243). Same file formats as the real
    dump: packed-depth pngs, seg pngs, per-frame meta pickles, chunked
    GT npy files, a YCB obj."""
    root = str(root)
    base = os.path.join(root, "HO3D_v3", "HO3D_v3")
    gt = os.path.join(root, "HO3D_v3", "HO3D", "data")
    ycb = os.path.join(root, "HO3D_v3", "models", "003_box")
    seg_root = os.path.join(root, "HO3D_v3")
    rng = np.random.RandomState(seed)

    files = [f"ABF10/{i:04d}" for i in range(n_train)] + [
        f"ABF14/{n_train + i:04d}" for i in range(n_eval)
    ]
    os.makedirs(gt, exist_ok=True)
    os.makedirs(ycb, exist_ok=True)
    joints, meshes = [], []
    for seq_frame in files:
        seq, frame = seq_frame.split("/")
        # OpenGL coords: hand along -z, ~0.5 m away.
        j = np.stack(
            [rng.uniform(-0.04, 0.04, 21), rng.uniform(-0.04, 0.04, 21),
             -rng.uniform(0.45, 0.55, 21)], 1
        )
        joints.append(j)
        meshes.append(rng.uniform(-0.05, 0.05, (778, 3)) + j.mean(0))
        img = rng.randint(0, 255, (480, 640, 3), np.uint8)
        write_png(os.path.join(base, "train", seq, "rgb", frame + ".jpg"), img)
        # Depth png: channel2 + 256*channel1, scale 0.00012498664727900177.
        depth_m = np.full((480, 640), 0.5, np.float32)
        code = (depth_m / 0.00012498664727900177).astype(np.int64)
        dp = np.zeros((480, 640, 3), np.uint8)
        dp[..., 2] = (code % 256).astype(np.uint8)
        dp[..., 1] = (code // 256 % 256).astype(np.uint8)
        write_png(os.path.join(base, "train", seq, "depth", frame + ".png"), dp)
        seg = np.zeros((120, 160, 3), np.uint8)
        seg[40:80, 50:110, 2] = 255  # hand channel
        seg[20:40, 20:60, 1] = 255  # object channel
        write_png(os.path.join(seg_root, "train", seq, "seg", frame + ".png"),
                  seg)
        meta = {
            "camMat": CAM.astype(np.float64),
            "objName": "003_box",
            "objRot": np.zeros((3, 1)),
            "objTrans": np.array([0.0, 0.0, -0.5]),
        }
        os.makedirs(os.path.join(base, "train", seq, "meta"), exist_ok=True)
        with open(os.path.join(base, "train", seq, "meta", frame + ".pkl"),
                  "wb") as f:
            pickle.dump(meta, f)
    with open(os.path.join(base, "train.txt"), "w") as f:
        f.write("\n".join(files) + "\n")
    joints = np.asarray(joints)
    meshes = np.asarray(meshes)
    np.save(os.path.join(gt, "handJoints3D_train_4w.npy"), joints[:n_train])
    np.save(os.path.join(gt, "handJoints3D_train_8w.npy"), joints[n_train:])
    np.save(os.path.join(gt, "handJoints3D_train_left.npy"), joints[:0])
    np.save(os.path.join(gt, "ho3d_mesh_train_4w.npy"), meshes[:n_train])
    np.save(os.path.join(gt, "ho3d_mesh_train_8w.npy"), meshes[n_train:])
    np.save(os.path.join(gt, "ho3d_mesh_train_left.npy"), meshes[:0])
    # Tiny YCB obj.
    with open(os.path.join(ycb, "textured_simple.obj"), "w") as f:
        for _ in range(12):
            v = rng.uniform(-0.05, 0.05, 3)
            f.write(f"v {v[0]} {v[1]} {v[2] - 0.5}\n")
            f.write("vn 0 0 1\n")
    return root


def build_rhd(root, n=3, seed=0):
    """Miniature RHD_published_v2-format dataset (training split)."""
    rng = np.random.RandomState(seed)
    annos = {}
    for idx in range(n):
        xyz_r = np.stack(
            [rng.uniform(-0.05, 0.05, 21), rng.uniform(-0.05, 0.05, 21),
             rng.uniform(0.45, 0.55, 21)], 1
        ).astype(np.float32)
        xyz = np.concatenate([xyz_r + np.array([0.5, 0.5, 0.5]), xyz_r])
        uv = (xyz[:, :2] / xyz[:, 2:3]) * 300.0 + 160.0
        vis = np.ones((42, 1), np.float32)
        annos[idx] = {
            "uv_vis": np.concatenate([uv, vis], 1).astype(np.float32),
            "xyz": xyz.astype(np.float32),
            "K": CAM,
        }
        img = rng.randint(0, 255, (320, 320, 3), np.uint8)
        write_png(os.path.join(root, "training", "color", f"{idx:05d}.png"), img)
        mask = np.zeros((320, 320), np.uint8)
        u = np.clip(uv[21:, 0].astype(int), 0, 319)
        v = np.clip(uv[21:, 1].astype(int), 0, 319)
        for uu, vv in zip(u, v):
            mask[max(0, vv - 6): vv + 6, max(0, uu - 6): uu + 6] = 20
        write_png(os.path.join(root, "training", "mask", f"{idx:05d}.png"), mask)
        depth_m = np.full((320, 320), 2.0, np.float32)
        depth_m[mask > 17] = 0.5
        code = (depth_m / 5.0 * (2**16 - 1)).astype(np.int64)
        dp = np.zeros((320, 320, 3), np.uint8)
        dp[..., 0] = (code // 256).astype(np.uint8)
        dp[..., 1] = (code % 256).astype(np.uint8)
        write_png(os.path.join(root, "training", "depth", f"{idx:05d}.png"), dp)
    os.makedirs(os.path.join(root, "training"), exist_ok=True)
    with open(os.path.join(root, "training", "anno_training.pickle"), "wb") as f:
        pickle.dump(annos, f)
    # Evaluation split: reuse the same samples.
    for idx in range(n):
        for sub in ("color", "mask", "depth"):
            src = os.path.join(root, "training", sub, f"{idx:05d}.png")
            dst = os.path.join(root, "evaluation", sub, f"{idx:05d}.png")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(src, "rb") as a, open(dst, "wb") as b:
                b.write(a.read())
    with open(os.path.join(root, "evaluation", "anno_evaluation.pickle"), "wb") as f:
        pickle.dump(annos, f)
    return root


def build_freihand(root, n=4, seed=1, image_size=224):
    """Miniature FreiHAND-format dataset (training_K/xyz.json + rgb jpgs)."""
    import json

    rng = np.random.RandomState(seed)
    ks, xyzs = [], []
    for idx in range(n):
        xyz = np.stack(
            [rng.uniform(-0.05, 0.05, 21), rng.uniform(-0.05, 0.05, 21),
             rng.uniform(0.4, 0.5, 21)], 1
        )
        ks.append(CAM.tolist())
        xyzs.append(xyz.tolist())
        img = rng.randint(0, 255, (image_size, image_size, 3), np.uint8)
        write_png(
            os.path.join(root, "training", "rgb", f"{idx:08d}.jpg"), img)
    with open(os.path.join(root, "training_K.json"), "w") as f:
        json.dump(ks, f)
    with open(os.path.join(root, "training_xyz.json"), "w") as f:
        json.dump(xyzs, f)
    return root
