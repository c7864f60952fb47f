"""Loss + multi-hypothesis evaluation metrics.

Capability parity with /root/reference/hand/criteria.py:13-173 (MHEntLoss):
total loss = -mean log_p; per-joint 2D/3D EPE over N hypotheses grouped by
{sample, vis, invis} with the root joint excluded from vis/invis; best
hypothesis (min over N) for 3D and 2D-invis, worst hypothesis (max over N)
for 2D-vis; per-joint diversity as the std-ellipsoid side length; mean-over-
hypotheses EPE for vis; hand-object chamfer distance. All metrics are pure
jnp and jit/pjit-safe (no host transfers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ROOT_IDX = 12  # criteria.py:112


def mean_euclidean(pred: jax.Array, gt: jax.Array, scale: jax.Array) -> jax.Array:
    """Metric-scale per-joint EPE (utils.py:21-30).

    Args:
        pred, gt: (R, K*3); scale: (R,).

    Returns:
        (R, K) distances in the original metric scale.
    """
    p = pred.reshape(pred.shape[0], -1, 3)
    g = gt.reshape(pred.shape[0], -1, 3)
    d = jnp.sqrt(jnp.sum((p - g) ** 2, axis=2))
    return d * scale[:, None]


def _group_stats(stats: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted per-image mean over joints with the reference's empty-group
    renormalisation (criteria.py:116-132).

    Args:
        stats: ((N,) B, K); weight: ((N,) B, K).

    Returns:
        ((N,) B) per-image means.
    """
    num_vis = weight.sum(-1)
    mpj = (stats * weight).sum(-1) / (num_vis + 1e-16)
    nv = num_vis[0] if num_vis.ndim == 2 else num_vis
    b = nv.shape[0]
    num_valid = (nv > 0.0).sum()
    return jnp.where(num_valid > 0, mpj * b / (num_valid + 1e-16), mpj * 0.0)


def chamfer_dist(norm_rel_xyz: jax.Array, target: dict) -> jax.Array:
    """Symmetric hand-joint <-> object-vertex chamfer (criteria.py:18-39).

    Args:
        norm_rel_xyz: ((N,) B, K, 3) normalised-relative joints.
        target: needs scale (B,), original_pose3d (B, K, 3),
            object_verts (B, V*3).
    """
    squeeze = norm_rel_xyz.ndim == 3
    if squeeze:
        norm_rel_xyz = norm_rel_xyz[None]
    b = target["scale"].shape[0]
    abs_xyz = norm_rel_xyz * target["scale"][:, None, None] * 1000.0
    abs_xyz = abs_xyz + target["original_pose3d"][:, ROOT_IDX][None, :, None, :]
    obj = target["object_verts"].reshape(b, -1, 3)
    d = jnp.linalg.norm(abs_xyz[:, :, :, None, :] - obj[None, :, None, :, :], axis=-1)
    dist = d.min(-1).mean(-1) + d.min(-2).mean(-1)
    return dist[0] if squeeze else dist


def mhent_metrics(output: dict, target: dict,
                  image_size: int = 256) -> tuple[jax.Array, dict, dict]:
    """MHEntLoss.forward (criteria.py:47-173).

    Args:
        output: log_p (B,), and hypothesis-major xyz (N, B, 63) normalised
            relative, uv (N, B, 42) in pixel space (or absent -> derived from
            GT st), optionally verts.
        target: pose3d (B, 63), crop_uv (B, 42) in [-1,1), vis (B, 21),
            scale (B,), st (B, 3).
        image_size: pixel canvas predicted uv lives on. The reference
            hardcodes 256 (its loaders always crop to 256; criteria.py
            relocates with 256) — MUST match the model's decode image_size
            or the 2D metrics compare mismatched frames (caught round 3:
            a 64px demo config reported ~150px of pure units artifact).

    Returns:
        (total_loss, losses, metrics) — metric names match the reference's
        (eucLoss_{3d,2d}_rgb_{sample,vis,invis}[_std|_mean]).

    An optional target['valid'] (B,) mask excludes padded tail samples (see
    data.common.batches pad_remainder): their joint weights are zeroed so the
    empty-group renormalisation in _group_stats drops them, and the total
    loss becomes a valid-weighted mean. metrics['n_valid'] reports the count
    for weighted meter updates.
    """
    valid = target.get("valid")
    losses = {"neg_log_p": -output["log_p"]}

    src = output["xyz"] if "xyz" in output else output["uv"]
    n, b = src.shape[:2]

    metrics = {}
    euc = {}
    if "xyz" in output:
        xyz = output["xyz"].reshape(n * b, -1)
        euc["3d"] = mean_euclidean(
            xyz, jnp.tile(target["pose3d"], (n, 1)), jnp.tile(target["scale"], n)
        ).reshape(n, b, -1)
    uv_gt = (target["crop_uv"] + 1.0) / 2.0 * image_size
    if "uv" in output:
        uv_pred = output["uv"]
    else:
        # Project with the GT orthographic camera (criteria.py:100-104).
        xyz3 = output["xyz"].reshape(n, b, -1, 3)
        uv_pred = (
            target["st"][None, :, None, 0:1] * xyz3[..., :2]
            + target["st"][None, :, None, 1:3]
        )
        uv_pred = ((uv_pred + 1.0) / 2.0 * image_size).reshape(n, b, -1)
        output["uv"] = uv_pred
    euc["2d"] = jnp.linalg.norm(
        (uv_pred - uv_gt[None]).reshape(n, b, -1, 2), axis=-1
    )

    weights = {
        "sample": jnp.ones_like(target["vis"]),
        "vis": (target["vis"] == 1.0).astype(jnp.float32),
        "invis": (target["vis"] != 1.0).astype(jnp.float32),
    }
    weights["vis"] = weights["vis"].at[:, ROOT_IDX].set(0.0)
    weights["invis"] = weights["invis"].at[:, ROOT_IDX].set(0.0)
    if valid is not None:
        weights = {k: w * valid[:, None] for k, w in weights.items()}

    for sup in euc:
        d = int(sup[0])
        if sup == "3d":
            coord = output["xyz"] * target["scale"][None, :, None]
        else:
            coord = output["uv"]
        coord = coord.reshape(n, b, -1, d)
        for attr, weight in weights.items():
            key = f"eucLoss_{sup}_rgb_{attr}"
            mpjpe = _group_stats(euc[sup], jnp.tile(weight[None], (n, 1, 1)))
            if sup == "2d" and attr == "vis":
                metrics[key] = mpjpe.max(0)  # worst hypothesis (criteria.py:150)
            else:
                metrics[key] = mpjpe.min(0)  # best hypothesis

            # Per-joint diversity: std-ellipsoid volume^(1/D) * sqrt(D)
            # (criteria.py:154-162).
            if n == 1:
                spspe = jnp.zeros((b, coord.shape[-2]))
            else:
                spspe = coord.std(0, ddof=1).prod(-1)  # unbiased, as torch.std
            spspe = spspe ** (1.0 / d) * (d**0.5)
            metrics[f"{key}_std"] = _group_stats(spspe, weight)

            # Relative Diversity (the README table's "RD" column,
            # hand/README.md:48-58 — the shipped reference code never
            # computes it; the paper derives it offline). Definition used
            # here: PJD over the mean-over-hypotheses EPE of the SAME
            # joint group and dimension — a unit-free diversity/error
            # ratio (0 = collapsed hypotheses, ~1 = spread comparable to
            # the error itself).
            mh = _group_stats(euc[sup].mean(0), weight)
            if attr == "vis":
                metrics[f"{key}_mean"] = mh
            metrics[f"{key}_rd"] = metrics[f"{key}_std"] / (mh + 1e-16)

    if valid is None:
        total = sum(v.mean() for v in losses.values())
    else:
        denom = valid.sum() + 1e-16
        total = sum((v * valid).sum() / denom for v in losses.values())
        metrics["n_valid"] = valid.sum()
    return total, losses, metrics


def calc_coord_accuracy(
    coords,
    target: dict,
    hm_shape=(64, 48, 64),
    output_3d: bool = False,
    root_idx: int | None = None,
    thr: float = 0.5,
    ds_type: str = "human",
    output_normalized: bool = True,
):
    """Integral-coordinate PCK accuracy (utils.py:187-323 'calc_coord_accuracy'
    + calc_dist + dist_acc), vectorised on host numpy.

    Args:
        coords: (B, K*D) predicted coords (normalised to [-0.5, 0.5) when
            output_normalized).
        target: pose3d/crop_uv (+ target_uv(d)_weight masks).

    Returns:
        Mean per-joint PCK@thr over joints with any valid sample.
    """
    import numpy as np

    # np.array (not asarray): float64 inputs would otherwise alias the
    # caller's buffers and the in-place scaling below would corrupt the
    # target dict for later consumers.
    coords = np.array(coords, dtype=float)
    d = 3 if output_3d else 2
    if output_3d:
        labels = np.array(target["pose3d"], dtype=float)
        masks = np.ones_like(labels)
    else:
        labels = np.array(target["crop_uv"], dtype=float)
        masks = np.array(target["target_uv_weight"], dtype=float)
        if masks.ndim == 2 and masks.shape[1] * 2 == labels.shape[1]:
            masks = np.repeat(masks, 2, axis=1)
    b = coords.shape[0]
    coords = coords.reshape(b, -1, d)
    labels = labels.reshape(b, -1, d)
    masks = masks.reshape(b, -1, d)

    hm = np.asarray(hm_shape, dtype=float)
    if output_normalized:
        coords[..., 0] = (coords[..., 0] + 0.5) * hm[0]
        coords[..., 1] = (coords[..., 1] + 0.5) * hm[1]
        if output_3d:
            coords[..., 2] = (coords[..., 2] + 0.5) * hm[2]
    if output_3d:
        if output_normalized:
            labels[..., 0] = (labels[..., 0] + 0.5) * hm[0]
            labels[..., 1] = (labels[..., 1] + 0.5) * hm[1]
            labels[..., 2] = (labels[..., 2] + 0.5) * hm[2]
    else:
        # The reference scales 2D labels UNCONDITIONALLY
        # (utils.py:255-256) — output_normalized only gates the coords.
        labels[..., 0] = (labels[..., 0] + 0.5) * hm[0]
        labels[..., 1] = (labels[..., 1] + 0.5) * hm[1]
    if output_3d and root_idx is not None:
        labels = labels - labels[:, root_idx : root_idx + 1]
        coords = coords - coords[:, root_idx : root_idx + 1]

    coords = coords * masks
    labels = labels * masks
    norm = np.ones((b, 1, d))
    if ds_type == "human":
        norm = norm * hm[:d] / 10.0

    valid = (labels[..., 0] > 1) & (labels[..., 1] > 1)  # calc_dist gating
    dists = np.linalg.norm((coords - labels) / norm, axis=-1)
    hits = (dists < thr) & valid
    per_joint_n = valid.sum(0)
    per_joint_acc = np.where(per_joint_n > 0, hits.sum(0) / np.maximum(per_joint_n, 1), -1.0)
    used = per_joint_acc >= 0
    return float(per_joint_acc[used].mean()) if used.any() else 0.0


def evaluate_map(res_file: str, ann_file: str, ann_type: str = "keypoints"):
    """COCO mAP via pycocotools (utils.py:327-370), lazily imported — the
    environment ships without pycocotools; the COCO branch is vestigial in
    the reference too (SURVEY.md §2 'RLE-ported human-pose stack')."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "pycocotools is required for COCO mAP evaluation; install it or "
            "use the hand/PCK metrics"
        ) from e
    gt = COCO(ann_file)
    dt = gt.loadRes(res_file)
    ev = COCOeval(gt, dt, ann_type)
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    names = ["AP", "Ap .5", "AP .75", "AP (M)", "AP (L)",
             "AR", "AR .5", "AR .75", "AR (M)", "AR (L)"]
    return dict(zip(names, ev.stats))
