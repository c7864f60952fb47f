"""Shared fabricated-dataset builders for loader/integration tests."""

import os
import pickle

import numpy as np

CAM = np.array([[300.0, 0, 160.0], [0, 300.0, 160.0], [0, 0, 1.0]], np.float32)


def write_png(path, arr):
    import imageio.v2 as iio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    iio.imwrite(path, arr)


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
