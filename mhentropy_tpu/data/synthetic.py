"""Synthetic fixture dataset: random MANO poses rendered to analytically
consistent targets (SURVEY.md §4 item 4 — replaces the 100+ GB HO3D/RHD
downloads for CI and benchmarks).

Produces batches with the same keys/semantics as the HO3D loader's target
dict (/root/reference/hand/dataloader/ho3d_dataloader.py:427-457): image
(here: a keypoint-splat rendering so the encoder has real signal), crop_uv in
[-1, 1), pose3d root-relative bone-normalised, 3-state vis, scale (bone
length, metres), st (orthographic camera fit), plus the bookkeeping fields
the metrics use.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mhentropy_tpu.core import camera, mano, skeletons
from mhentropy_tpu.core.mano import ManoConfig, ManoModel


class SyntheticHandData(NamedTuple):
    images: np.ndarray  # (N, S, S, 3) float32 in [-1, 1]
    targets: dict  # arrays keyed like the HO3D target dict


def _render_keypoint_splats(uv_px: np.ndarray, image_size: int) -> np.ndarray:
    """Cheap 'rendering': per-joint Gaussian splats with joint-identifying
    colours (channel = joint % 3, intensity graded by joint index) plus bone
    segments to the parent joint, so images genuinely encode the pose."""
    n, k, _ = uv_px.shape
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
    imgs = np.zeros((n, image_size, image_size, 3), np.float32)
    sigma2 = 2 * (image_size / 32.0) ** 2
    # Intensity ramp disambiguates joints sharing a channel.
    levels = 0.4 + 0.6 * (np.arange(k) // 3) / max(1, (k - 1) // 3)
    for i in range(n):
        d2 = (xx[None] - uv_px[i, :, 0, None, None]) ** 2 + (
            yy[None] - uv_px[i, :, 1, None, None]
        ) ** 2
        splat = np.exp(-d2 / sigma2) * levels[:, None, None]  # (K, S, S)
        for c in range(3):
            imgs[i, :, :, c] = splat[c::3].max(0)
    return imgs * 2.0 - 1.0


def make_dataset(
    model: ManoModel,
    n: int = 32,
    image_size: int = 64,
    seed: int = 0,
    occlusion_rate: float = 0.3,
    mano_config: ManoConfig = ManoConfig(use_pca=True, ncomps=45, flat_hand_mean=False),
    ds: str = "ho3d",
) -> SyntheticHandData:
    """Sample GT (theta, beta, s, t), decode through the same MANO layer the
    model uses, and project — so a perfect model can reach zero error."""
    rng = np.random.RandomState(seed)
    theta = np.concatenate(
        [rng.randn(n, 3) * 0.3, rng.randn(n, 45) * 0.5], axis=1
    ).astype(np.float32)
    beta = (rng.randn(n, 10) * 0.01).astype(np.float32)
    out = mano.mano_decode(model, jnp.asarray(theta), jnp.asarray(beta),
                           skeidx="RHD", config=mano_config)
    xyz = np.asarray(out["mano_joints"])  # (n, 21, 3) mm
    root_idx, norm_idx = skeletons.ROOT_IDX[ds], skeletons.NORM_IDX[ds]
    normed, root, bone = camera.batch_normalize_pose3d(
        jnp.asarray(xyz), root_idx, norm_idx, return_st=True
    )
    normed = np.asarray(normed)
    bone = np.asarray(bone)

    s_cam = rng.uniform(0.25, 0.45, (n, 1)).astype(np.float32)
    t_cam = rng.uniform(-0.2, 0.2, (n, 2)).astype(np.float32)
    crop_uv = normed[..., :2] * s_cam[:, None] + t_cam[:, None]  # [-1, 1)
    uv_px = (crop_uv + 1.0) / 2.0 * image_size

    # 3-state visibility: 1 visible, 0 patch-occluded, 2 out-of-bounds
    # (rhddataloader.py:169-173 semantics). Like the loaders'
    # demote_out_of_bounds, only VISIBLE joints demote to 2 — an occluded
    # joint that is also out of frame stays 0 (the fixture previously let
    # 2 override 0, skewing the vis/invis label mix vs real data).
    vis = np.ones((n, 21), np.float32)
    occ = rng.rand(n, 21) < occlusion_rate
    vis[occ] = 0.0
    oob = (crop_uv < -1.0).any(-1) | (crop_uv >= 1.0).any(-1)
    vis[oob & (vis == 1.0)] = 2.0

    st = np.concatenate([s_cam, t_cam], axis=1)
    images = _render_keypoint_splats(uv_px, image_size)

    targets = {
        "crop_uv": crop_uv.reshape(n, -1).astype(np.float32),
        "pose3d": normed.reshape(n, -1).astype(np.float32),
        "vis": vis,
        "scale": (bone / 1000.0).astype(np.float32),  # metres (HO3D)
        "st": st,
        "original_pose3d": xyz.astype(np.float32),
        "verts": np.asarray(out["mesh"]).reshape(n, -1).astype(np.float32),
        "theta_gt": theta,
        "beta_gt": beta,
        "object_verts": rng.randn(n, 1000 * 3).astype(np.float32) * 50.0,
    }
    return SyntheticHandData(images=images, targets=targets)


def batches(data: SyntheticHandData, batch_size: int, pad_remainder: bool = False):
    """Yield (image, target) batches.

    pad_remainder=True keeps tail samples (the reference's eval DataLoader
    has no drop_last, CrossModalHand.py:176-179): the final short batch is
    padded to batch_size by wrapping and every target carries a 'valid'
    (B,) mask so metrics can exclude the padding. Static batch shape keeps
    jit to a single compile.
    """
    n = data.images.shape[0]
    end = n if pad_remainder else n - batch_size + 1
    for i in range(0, end, batch_size):
        idx = np.arange(i, min(i + batch_size, n))
        k = idx.shape[0]
        if k < batch_size:
            idx = np.concatenate([idx, np.arange(batch_size - k) % n])
        target = {key: jnp.asarray(v[idx]) for key, v in data.targets.items()}
        if pad_remainder:
            target["valid"] = jnp.asarray(
                (np.arange(batch_size) < k).astype(np.float32)
            )
        yield jnp.asarray(data.images[idx]), target
