import os

import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.core import camera
from mhentropy_tpu.train import metrics
from mhentropy_tpu.utils import viz


def test_crop_xyz_roundtrip():
    """xyz_to_crop then crop_to_xyz must reproduce the metric pose
    (the reference marks both 'checked', utils.py:131,562)."""
    rng = np.random.RandomState(0)
    b = 3
    k = np.tile(np.array([[320.0, 0, 160], [0, 320.0, 160], [0, 0, 1]], np.float32), (b, 1, 1))
    xyz_abs = rng.uniform(0.3, 0.7, (b, 21, 3)).astype(np.float32)  # metres
    root = xyz_abs[:, 12]
    rel = xyz_abs - root[:, None]
    bone = np.linalg.norm(rel[:, 11], axis=1)
    normed = rel / bone[:, None, None]

    target = {
        "crop_center": jnp.asarray(np.full((b, 2), 160.0, np.float32)),
        "crop_size": jnp.asarray(np.full((b,), 100.0, np.float32)),
        "hand_side": jnp.zeros((b,)),
        "bone_length": jnp.asarray(bone),
        "pose3d_root": jnp.asarray(root),
        "camera": jnp.asarray(k),
        "rot_mat_inv": jnp.tile(jnp.eye(3)[:, :2], (b, 1, 1)),
    }
    crop_uv, crop_d = camera.xyz_to_crop(jnp.asarray(normed), target)
    uv_orig, xyz_back = camera.crop_to_xyz(crop_uv, crop_d, target)
    np.testing.assert_allclose(np.asarray(xyz_back), xyz_abs, atol=5e-3)


def test_pck_perfect_and_off_predictions():
    b = 4
    labels = np.random.RandomState(1).uniform(-0.3, 0.4, (b, 21, 2)).astype(np.float32)
    target = {
        "crop_uv": labels.reshape(b, -1),
        "target_uv_weight": np.ones((b, 42), np.float32),
    }
    perfect = metrics.calc_coord_accuracy(
        labels.reshape(b, -1), target, hm_shape=(64, 64, 0), ds_type="hand",
        thr=15.0 / 40.0,
    )
    off = metrics.calc_coord_accuracy(
        labels.reshape(b, -1) + 0.5, target, hm_shape=(64, 64, 0),
        ds_type="hand", thr=15.0 / 40.0,
    )
    assert perfect > 0.9
    assert off < perfect


def test_pck_unnormalized_2d_scales_labels_and_never_mutates():
    """The reference scales 2D labels UNCONDITIONALLY (utils.py:255-256)
    — output_normalized only gates the coords — so pixel-space preds vs
    [-0.5, 0.5) labels must still yield a real PCK, not the silent 0.0
    the old gated port returned. And float64 inputs must not be
    rescaled in place (they used to alias through np.asarray)."""
    b = 4
    labels = np.random.RandomState(2).uniform(-0.3, 0.4, (b, 21, 2))
    px = (labels + 0.5) * 64.0  # already heatmap-pixel coords
    target = {
        "crop_uv": labels.reshape(b, -1).copy(),  # float64 on purpose
        "target_uv_weight": np.ones((b, 42), np.float64),
    }
    before = target["crop_uv"].copy()
    acc = metrics.calc_coord_accuracy(
        px.reshape(b, -1), target, hm_shape=(64, 64, 0), ds_type="hand",
        thr=15.0 / 40.0, output_normalized=False,
    )
    assert acc > 0.9, acc
    np.testing.assert_array_equal(target["crop_uv"], before)


def test_viz_outputs(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    rng = np.random.RandomState(0)
    uv = rng.uniform(20, 230, (21, 2))
    img = rng.rand(256, 256, 3).astype(np.float32)
    p1 = viz.viz_2djoints(img, uv[None], os.path.join(tmp_path, "j.png"))
    assert os.path.getsize(p1) > 0

    verts = rng.randn(50, 3).astype(np.float32)
    faces = rng.randint(0, 50, (30, 3))
    p2 = viz.export_mano_mesh(verts, faces, os.path.join(tmp_path, "m.obj"))
    assert os.path.getsize(p2) > 0

    xyz = rng.randn(21, 3).astype(np.float32)
    p3 = viz.export_pose3d_gif(xyz, os.path.join(tmp_path, "p.gif"), frames=4)
    assert os.path.getsize(p3) > 0


def test_viewer_and_argutils(tmp_path):
    """display_hand / show_scene / generate_random_hand (manopth demo +
    open3dVisualize equivalents) and the argutils port, headless."""
    import matplotlib

    matplotlib.use("Agg")
    from mhentropy_tpu.core import mano as mano_lib
    from mhentropy_tpu.utils import viz
    from mhentropy_tpu.utils.logging import print_args, save_args

    model = mano_lib.synthetic_mano_model(0)
    hand = viz.generate_random_hand(model, batch_size=2, ncomps=6, seed=1)
    assert hand["verts"].shape[0] == 2 and hand["joints"].shape[1] == 21
    p1 = str(tmp_path / "hand.png")
    viz.display_hand(hand, mano_faces=hand["faces"], path=p1, show=False)
    assert os.path.getsize(p1) > 0

    p2 = str(tmp_path / "scene.png")
    viz.show_scene(
        [(hand["verts"][0], hand["faces"]), (hand["verts"][1], hand["faces"])],
        path=p2,
    )
    assert os.path.getsize(p2) > 0

    print_args({"lr": 1e-4, "mode": "eval"})
    save_args({"lr": 1e-4}, str(tmp_path / "run"), verbose=False)
    assert (tmp_path / "run" / "opt.txt").exists()
    assert (tmp_path / "run" / "opt.pkl").exists()


def test_cache_fingerprint_keys_on_machine_and_jax():
    """The persistent-cache key must roll when the HOST or jax changes.

    r3 post-mortem: two fleet machines shared a /proc/cpuinfo fingerprint
    while their XLA target configs differed — the stale cache's AOT
    executables were rejected with `cpu_aot_loader ... machine type
    mismatch` (which the loader warns may SIGILL). The key now includes
    /etc/machine-id and the jax/jaxlib versions so a machine swap or a
    jax upgrade degrades to a cold cache, never to loading alien code.
    """
    import hashlib

    import jax
    import jaxlib

    from mhentropy_tpu.utils import cache

    key = cache._machine_key()
    fp = cache.cpu_fingerprint()
    assert fp == hashlib.sha1(key.encode()).hexdigest()[:10]
    assert jax.__version__ in key and jaxlib.__version__ in key
    if os.path.exists("/etc/machine-id"):
        assert open("/etc/machine-id").read().strip() in key
    # Stable across calls (directory names must not drift within a run).
    assert cache.cpu_fingerprint() == fp


def test_relative_diversity_metric():
    """RD = PJD / mean-over-hypotheses EPE of the same group (the README
    table's derived "RD" column — the reference ships no formula, see
    hand/README.md:48-58). Pin the ratio on a constructed case and the
    collapsed-hypotheses limit."""
    import jax

    from mhentropy_tpu.train import metrics as m

    n, b, k = 4, 2, 3
    key = jax.random.key(0)
    xyz = jax.random.normal(key, (n, b, k * 3)) * 0.05
    target = {
        "pose3d": np.zeros((b, k * 3), np.float32),
        "scale": np.ones((b,), np.float32),
        "crop_uv": np.zeros((b, k * 2), np.float32),
        "st": np.tile(np.array([1.0, 0.0, 0.0], np.float32), (b, 1)),
        "vis": jnp.ones((b, k), jnp.float32),
    }
    out = {"xyz": jnp.asarray(xyz), "log_p": jnp.zeros(b)}
    _, _, mets = m.mhent_metrics(out, target, image_size=64)
    # RD is exactly std/mean of the already-pinned parity metrics.
    np.testing.assert_allclose(
        np.asarray(mets["eucLoss_3d_rgb_vis_rd"]),
        np.asarray(mets["eucLoss_3d_rgb_vis_std"])
        / (np.asarray(mets["eucLoss_3d_rgb_vis_mean"]) + 1e-16),
        rtol=1e-6,
    )
    assert float(mets["eucLoss_3d_rgb_sample_rd"].mean()) > 0.0

    # Collapsed hypotheses (all N identical) -> zero diversity -> RD 0.
    out_c = {"xyz": jnp.tile(xyz[:1], (n, 1, 1)), "log_p": jnp.zeros(b)}
    _, _, mets_c = m.mhent_metrics(out_c, target, image_size=64)
    np.testing.assert_allclose(
        np.asarray(mets_c["eucLoss_3d_rgb_sample_rd"]), 0.0, atol=1e-7)


def test_compilation_cache_dir_splits_by_backend(monkeypatch, tmp_path):
    """enable_compilation_cache must key the dir on the jax backend too:
    axon-relay processes write AOT entries with the RELAY server's CPU
    features, and a CPU process sharing the dir loads may-SIGILL code
    (the r3 MULTICHIP aot-error tail, reproduced r4)."""
    import jax

    from mhentropy_tpu.utils import cache

    seen = {}
    monkeypatch.setattr(
        jax.config, "update",
        lambda k, v: seen.__setitem__(k, v))
    cache.enable_compilation_cache(str(tmp_path / "c"))
    d = seen["jax_compilation_cache_dir"]
    assert d.endswith(f"-{jax.default_backend()}")
    assert cache.cpu_fingerprint() in d


def test_time_fn_varies_integer_inputs(monkeypatch):
    """u8/int inputs must still vary per call (a float nudge truncates to
    zero and the relay's execution cache — or scan hoisting — reports
    impossible numbers; r5 review finding, confirmed by execution)."""
    from mhentropy_tpu.utils import profiling

    seen = []

    def fn(x):
        seen.append(np.asarray(x).sum())
        return jnp.asarray(np.asarray(x, np.float32).sum())

    img = np.full((4, 4), 7, np.uint8)
    profiling.time_fn(fn, jnp.asarray(img), iters=3, warmup=1)
    assert len(set(seen)) > 1, "integer input was not varied per call"

    with pytest.raises(ValueError):
        profiling.time_fn(lambda d: jnp.zeros(()), {"not": "an array"},
                          iters=2, warmup=0)
