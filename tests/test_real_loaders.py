"""Drive the real HO3D/RHD/FreiHAND loaders end to end against miniature
fabricated on-disk datasets (same file formats), so the IO + preprocessing
paths are exercised without the 100+GB downloads."""

import os
import pickle

import numpy as np
import pytest

imageio = pytest.importorskip("imageio")

from tests import fixtures_data  # noqa: E402


# ------------------------------------------------------------------- RHD


@pytest.fixture(scope="module")
def rhd_root(tmp_path_factory):
    from tests.fixtures_data import build_rhd

    return build_rhd(str(tmp_path_factory.mktemp("rhd")))


def test_rhd_loader_end_to_end(rhd_root):
    from mhentropy_tpu.data import rhd

    ds = rhd.load(rhd_root, mode="training")
    assert len(ds) == 3
    image, target = ds[1]
    assert image.shape == (256, 256, 3) and image.dtype == np.float32
    assert 0.0 <= image.min() and image.max() <= 1.0
    for key, shape in (
        ("pose3d", (63,)), ("crop_uv", (42,)), ("vis", (21,)), ("st", (3,)),
        ("cloud", (256, 3)), ("heatmap", (64, 64, 21)), ("patch", (3,)),
    ):
        assert target[key].shape == shape, key
    # Root-relative bone-normalised: root 12 at 0, bone 12-11 unit.
    p = target["pose3d"].reshape(21, 3)
    np.testing.assert_allclose(p[12], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(p[12] - p[11]), 1.0, rtol=1e-5)
    # 3-state vis values only.
    assert set(np.unique(target["vis"])).issubset({0.0, 1.0, 2.0})
    # The deterministic patch occluder blacked out a disc. Checked with
    # jitter off: the reference applies ColorJitter AFTER the patch
    # (rhddataloader.py:153), so jittered train pixels are not pure
    # black (contrast blends toward the image mean) — parity our loader
    # now shares.
    image_nj, _ = rhd.load(rhd_root, mode="training", color_jitter=False)[1]
    assert (image_nj.sum(-1) == 0).sum() > 100
    # And the jitter is actually wired: same item differs with it on.
    assert not np.array_equal(image, image_nj)
    # The fitted ortho camera reprojects the pose onto crop_uv reasonably.
    uv = p[:, :2] * target["st"][0] + target["st"][1:]
    vis1 = target["vis"] == 1.0
    if vis1.any():
        err = np.abs(uv - target["crop_uv"].reshape(21, 2))[vis1]
        assert err.mean() < 0.5  # [-1,1) units; rotation residual allowed


def test_rhd_collation(rhd_root):
    from mhentropy_tpu.data import common, rhd

    ds = rhd.load(rhd_root, mode="training")
    image, target = next(common.batches(ds, 2, to_device=False))
    assert image.shape == (2, 256, 256, 3)
    assert target["pose3d"].shape == (2, 63)


# ------------------------------------------------------------------- FreiHAND


@pytest.fixture(scope="module")
def freihand_root(tmp_path_factory):
    return str(fixtures_data.build_freihand(
        str(tmp_path_factory.mktemp("freihand")), n=4, seed=1))


def test_freihand_loader_end_to_end(freihand_root):
    from mhentropy_tpu.data import freihand

    ds = freihand.load(freihand_root, mode="training", eval_fraction=0.25)
    assert len(ds) == 3
    image, target = ds[0]
    assert image.shape == (224, 224, 3)
    p = target["pose3d"].reshape(21, 3)
    np.testing.assert_allclose(p[9], 0.0, atol=1e-6)  # FreiHAND root
    assert target["crop_uv"].shape == (42,)
    evald = freihand.load(freihand_root, mode="evaluation", eval_fraction=0.25)
    assert len(evald) == 1


def test_freihand_u8_train_transport(freihand_root):
    """Augmented training ships u8 + a device-side `_pixel_noise` factor;
    emulating engine._prep_image reproduces the f32 transport exactly
    (the nearest warp commutes with the pointwise noise)."""
    from mhentropy_tpu.data import freihand

    u8 = freihand.load(freihand_root, mode="training", image_u8=True)
    f32 = freihand.load(freihand_root, mode="training")
    img_u, t_u = u8[1]
    img_f, t_f = f32[1]
    assert img_u.dtype == np.uint8
    pn = t_u["_pixel_noise"]
    emulated = (
        np.clip(img_u.astype(np.float32) * pn[None, None, :], 0.0, 255.0)
        * t_u["_img_scale"] + t_u["_img_bias"]
    )
    np.testing.assert_allclose(emulated, img_f, atol=1e-5)
    np.testing.assert_array_equal(t_u["crop_uv"], t_f["crop_uv"])
    np.testing.assert_array_equal(t_u["pose3d"], t_f["pose3d"])


def test_freihand_prefix_cache_bit_identical(freihand_root, tmp_path):
    """FreiHAND's whole deterministic prefix (jpg decode -> crop) is
    RNG-free, so prefix-cached items must be bit-identical to uncached
    ones in BOTH modes, and the cache dir must be shared between them
    (the prefix is mode-independent)."""
    from mhentropy_tpu.data import freihand

    pc = str(tmp_path / "pc")
    for mode in ("training", "evaluation"):
        kw = dict(mode=mode, seed=5, image_u8=True, device_st=True,
                  eval_fraction=0.25)
        a = freihand.load(freihand_root, **kw)
        b = freihand.load(freihand_root, prefix_cache=pc, **kw)
        assert b._prefix_cacheable
        for epoch in range(2):  # epoch 0 populates, epoch 1 reads
            for i in range(len(a)):
                ia, ta = a[i]
                ib, tb = b[i]
                np.testing.assert_array_equal(ia, ib)
                assert set(ta) == set(tb)
                for k in ta:
                    if k == "dataset":
                        continue
                    np.testing.assert_array_equal(
                        np.asarray(ta[k]), np.asarray(tb[k]), err_msg=k)
    # One shared fingerprint dir across modes: 4 unique raw indices total.
    subdirs = list((tmp_path / "pc").iterdir())
    assert len(subdirs) == 1
    assert len(list(subdirs[0].iterdir())) == 4


# ------------------------------------------------------------------- HO3D


@pytest.fixture(scope="module")
def ho3d_root(tmp_path_factory):
    # One train frame (ABF10) + one eval-split frame (ABF14); builder
    # shared with tools/bench_epoch_io.py.
    return fixtures_data.build_ho3d(
        tmp_path_factory.mktemp("ho3d"), n_train=1, n_eval=1, seed=2
    )


def test_ho3d_loader_end_to_end(ho3d_root):
    from mhentropy_tpu.data import ho3d

    train = ho3d.load(ho3d_root, mode="training")
    evald = ho3d.load(ho3d_root, mode="evaluation")
    # ABF14 is an eval-split sequence (ho3d_dataloader.py:243).
    assert len(train) == 1 and len(evald) == 1

    image, target = evald[0]
    assert image.shape == (256, 256, 3)
    assert -1.0 <= image.min() and image.max() <= 1.0  # [-1,1] normalisation
    p = target["pose3d"].reshape(21, 3)
    np.testing.assert_allclose(p[12], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(p[12] - p[11]), 1.0, rtol=1e-4)
    assert target["object_verts"].shape == (3000,)
    assert set(np.unique(target["vis"])).issubset({0.0, 1.0, 2.0})
    assert target["st"].shape == (3,)
    # Training sample exercises augmentation + pixel noise.
    image_t, target_t = train[0]
    assert np.isfinite(image_t).all()
    assert np.isfinite(target_t["pose3d"]).all()


# ----------------------------------------------------- heavy-field gating


def test_rhd_heavy_field_gating(rhd_root):
    """heavy_fields=set() must drop exactly the unconsumed per-pixel fields
    and leave every kept key bit-identical in eval mode (no rng there)."""
    from mhentropy_tpu.data import rhd

    full = rhd.load(rhd_root, mode="evaluation")
    mini = rhd.load(rhd_root, mode="evaluation", heavy_fields=set())
    img_f, t_f = full[0]
    img_m, t_m = mini[0]
    np.testing.assert_array_equal(img_f, img_m)
    dropped = set(t_f) - set(t_m)
    assert dropped == rhd.RHDDataset.HEAVY_FIELDS
    for k in t_m:
        if k == "dataset":
            continue
        np.testing.assert_array_equal(
            np.asarray(t_f[k]), np.asarray(t_m[k]), err_msg=k
        )
    # Full mode carries the reference extras (rhddataloader.py:196,216-223).
    assert t_f["mask"].shape == (64, 64)
    assert t_f["uvd"].shape == (63,)
    assert t_f["_rot_mat"].shape == (2, 2)
    # And a training-mode item works under both configs (rng streams differ
    # by design: skipped fields skip their draws).
    rhd.load(rhd_root, mode="training", heavy_fields=set())[1]
    rhd.load(rhd_root, mode="training")[1]


def test_ho3d_heavy_field_gating(ho3d_root):
    from mhentropy_tpu.data import ho3d

    full = ho3d.load(ho3d_root, mode="evaluation")
    mini = ho3d.load(ho3d_root, mode="evaluation", heavy_fields=set())
    img_f, t_f = full[0]
    img_m, t_m = mini[0]
    np.testing.assert_array_equal(img_f, img_m)
    assert set(t_f) - set(t_m) == ho3d.HO3DDataset.HEAVY_FIELDS
    for k in t_m:
        if k == "dataset":
            continue
        np.testing.assert_array_equal(
            np.asarray(t_f[k]), np.asarray(t_m[k]), err_msg=k
        )
    # A single requested heavy field comes back alone.
    _, t_hm = ho3d.load(
        ho3d_root, mode="evaluation", heavy_fields={"hand_mask"}
    )[0]
    assert "hand_mask" in t_hm and "object_mask" not in t_hm
    ho3d.load(ho3d_root, mode="training", heavy_fields=set())[0]


def test_experiment_passes_minimal_fields(rhd_root, tmp_path, monkeypatch):
    """cfg.tpu.target_fields='auto' (default) must reach the loaders as the
    minimal set; 'full' must restore the complete parity target; a
    mask-loss config must request hand_mask."""
    from types import SimpleNamespace

    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.merge_from_other_cfg({
        "model_dir": str(tmp_path / "run") + "/",
        "dataset": {"dataset_name": "rhd", "image_size": [256, 256]},
        "network": {"enc_type": "MHEnt", "input": "image", "num_latent": 32,
                    "backbone": "resnet18", "decoder_type": "id",
                    "tsfm_on": 32, "h_dims": [32, 32], "num_steps": 1,
                    "regressor": "realnvp"},
        "training": {"batch_size": 2},
        "tpu": {"mesh_hypo": 1, "data_dir": rhd_root},
    })
    exp = Experiment(cfg)
    train, evald = exp.make_datasets()
    assert train.heavy == frozenset() and evald.heavy == frozenset()

    cfg.tpu.target_fields = "full"
    train2, _ = exp.make_datasets()
    assert train2.heavy is None

    cfg.tpu.target_fields = "auto"
    monkeypatch.setattr(
        exp, "model_cfg",
        SimpleNamespace(image_size=256, use_mask_loss=True),
    )
    train3, _ = exp.make_datasets()
    # Both spellings: HO3D emits "hand_mask", RHD emits "mask" — each
    # loader gates on its own key (requesting the other's is a no-op).
    assert train3.heavy == frozenset({"hand_mask", "mask"})


# ------------------------------------------------------- uint8 transport


def test_rhd_u8_transport_exact(rhd_root):
    """Every pixel op in the RHD chain copies u8 integer values (nearest
    crop/warp, blackout, flip), so the u8 image times /255 must equal the
    f32 path up to the one-ulp reciprocal-vs-division rounding of the
    device affine (same seed: the u8 flag changes no rng draws)."""
    from mhentropy_tpu.data import rhd

    for mode in ("evaluation", "training"):
        f32 = rhd.load(rhd_root, mode=mode, seed=3)
        u8 = rhd.load(rhd_root, mode=mode, seed=3, image_u8=True)
        img_f, t_f = f32[1]
        img_u, t_u = u8[1]
        assert img_u.dtype == np.uint8
        # u8 values themselves are bit-exact vs the f32 path's integers.
        np.testing.assert_array_equal(img_u, (img_f * 255.0).round())
        np.testing.assert_allclose(
            img_u.astype(np.float32) * t_u["_img_scale"] + t_u["_img_bias"],
            img_f, atol=2e-7,
        )
        assert "_img_scale" not in t_f


def test_ho3d_u8_transport(ho3d_root):
    from mhentropy_tpu.data import ho3d

    f32 = ho3d.load(ho3d_root, mode="evaluation")
    u8 = ho3d.load(ho3d_root, mode="evaluation", image_u8=True)
    img_f, _ = f32[0]
    img_u, t_u = u8[0]
    assert img_u.dtype == np.uint8
    np.testing.assert_allclose(
        img_u.astype(np.float32) * t_u["_img_scale"] + t_u["_img_bias"],
        img_f, atol=1e-6,
    )
    # Training mode ships u8 too: the pixel noise rides the target as
    # `_pixel_noise` and applies on device (engine._prep_image). Same
    # (seed, epoch, idx) rng stream in both transports, so every other
    # target field is bit-identical and the device-side image matches the
    # host f32 path within normalisation ulps.
    tr_u8 = ho3d.load(ho3d_root, mode="training", image_u8=True)
    tr_f32 = ho3d.load(ho3d_root, mode="training")
    img_t, t_t = tr_u8[0]
    img_tf, t_tf = tr_f32[0]
    assert img_t.dtype == np.uint8
    pn = t_t["_pixel_noise"]
    assert pn.shape == (3,) and "_pixel_noise" not in t_tf
    emulated = (
        np.clip(img_t.astype(np.float32) * pn[None, None, :], 0.0, 255.0)
        * t_t["_img_scale"] + t_t["_img_bias"]
    )
    np.testing.assert_allclose(emulated, img_tf, atol=1e-5)
    assert set(t_t) - set(t_tf) == {"_img_scale", "_img_bias", "_pixel_noise"}
    for k in t_tf:
        if k != "dataset":
            np.testing.assert_array_equal(t_t[k], t_tf[k], err_msg=k)


def test_prep_image_device_normalisation():
    import jax.numpy as jnp

    from mhentropy_tpu.train.engine import _prep_image

    img = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    tgt = {
        "_img_scale": jnp.full((2,), 2.0 / 255.0, jnp.float32),
        "_img_bias": jnp.full((2,), -1.0, jnp.float32),
    }
    out = _prep_image(jnp.asarray(img), tgt)
    np.testing.assert_allclose(
        np.asarray(out), img.astype(np.float32) * 2.0 / 255.0 - 1.0,
        atol=1e-6,
    )
    # `_pixel_noise` applies on the 0..255 range, clipped, before the
    # affine (the host pixel_noise semantics, ho3d_dataloader.py:191-198).
    pn = np.array([[0.7, 1.3, 1.0], [1.4, 0.6, 1.1]], np.float32)
    out_n = _prep_image(jnp.asarray(img),
                        {**tgt, "_pixel_noise": jnp.asarray(pn)})
    want = (
        np.clip(img.astype(np.float32) * pn[:, None, None, :], 0.0, 255.0)
        * (2.0 / 255.0) - 1.0
    )
    np.testing.assert_allclose(np.asarray(out_n), want, atol=1e-6)
    # No affine in target -> plain /255; f32 input passes through.
    out2 = _prep_image(jnp.asarray(img), {})
    np.testing.assert_allclose(
        np.asarray(out2), img.astype(np.float32) / 255.0, atol=1e-7
    )
    f = jnp.ones((1, 2, 2, 3), jnp.float32) * 0.25
    assert _prep_image(f, {}) is f


# ------------------------------------------------------ eval sample cache


def test_sample_cache_roundtrip_and_determinism(rhd_root, tmp_path):
    from mhentropy_tpu.data import cached, rhd

    ds = rhd.load(rhd_root, mode="evaluation", heavy_fields=set(),
                  image_u8=True)
    wrapped = cached.SampleCache(ds, str(tmp_path / "sc"))
    img1, t1 = wrapped[0]          # computes + persists
    img2, t2 = wrapped[0]          # pure disk read
    np.testing.assert_array_equal(img1, img2)
    for k in t1:
        if k == "dataset":
            continue
        np.testing.assert_array_equal(np.asarray(t1[k]), np.asarray(t2[k]), err_msg=k)
    # The cached item equals a fresh dataset's item (determinism).
    img3, t3 = rhd.load(rhd_root, mode="evaluation", heavy_fields=set(),
                        image_u8=True)[0]
    np.testing.assert_array_equal(img2, img3)
    np.testing.assert_array_equal(
        np.asarray(t2["pose3d"]), np.asarray(t3["pose3d"])
    )
    assert len(wrapped) == len(ds)


def test_sample_cache_refuses_rng_consumers(rhd_root, tmp_path):
    from mhentropy_tpu.data import cached, rhd

    train = rhd.load(rhd_root, mode="training", heavy_fields=set())
    with pytest.raises(ValueError):
        cached.SampleCache(train, str(tmp_path / "sc"))
    # Full-target eval draws RNG for the cloud resample.
    full_eval = rhd.load(rhd_root, mode="evaluation")
    with pytest.raises(ValueError):
        cached.SampleCache(full_eval, str(tmp_path / "sc"))


def test_sample_cache_fingerprint_isolates_configs(rhd_root, tmp_path):
    from mhentropy_tpu.data import cached, rhd

    a = rhd.load(rhd_root, mode="evaluation", heavy_fields=set(),
                 image_u8=True)
    b = rhd.load(rhd_root, mode="evaluation", heavy_fields=set(),
                 image_u8=False)
    ca = cached.SampleCache(a, str(tmp_path / "sc"))
    cb = cached.SampleCache(b, str(tmp_path / "sc"))
    assert ca.dir != cb.dir
    img_a, _ = ca[0]
    img_b, _ = cb[0]
    assert img_a.dtype == np.uint8 and img_b.dtype == np.float32


def test_ho3d_eval_object_subsample_is_idx_seeded(ho3d_root):
    from mhentropy_tpu.data import ho3d

    e1 = ho3d.load(ho3d_root, mode="evaluation")
    _, t1 = e1[0]
    _, t1b = e1[0]  # same instance, second epoch
    np.testing.assert_array_equal(t1["object_verts"], t1b["object_verts"])
    _, t2 = ho3d.load(ho3d_root, mode="evaluation")[0]
    np.testing.assert_array_equal(t1["object_verts"], t2["object_verts"])


# ------------------------------------------------------------ device st


def test_device_st_matches_host_fit(rhd_root):
    """device_st loaders omit st; engine._prep_batch must reconstruct the
    same (s, t) fit the host scipy path produces."""
    import jax.numpy as jnp

    from mhentropy_tpu.data import common, rhd
    from mhentropy_tpu.train.engine import _prep_batch

    host = rhd.load(rhd_root, mode="evaluation", heavy_fields=set())
    dev = rhd.load(rhd_root, mode="evaluation", heavy_fields=set(),
                   device_st=True)
    _, t_h = host[0]
    _, t_d = dev[0]
    assert "st" not in t_d and "st" in t_h

    image, target = next(common.batches(dev, 2, to_device=False))
    image2, target2 = _prep_batch(
        jnp.asarray(image), {k: jnp.asarray(v) for k, v in target.items()
                             if not isinstance(v, (str, list))}
    )
    st_dev = np.asarray(target2["st"])
    st_host = np.stack([host[i][1]["st"] for i in range(2)])
    np.testing.assert_allclose(st_dev, st_host, atol=1e-5)
    # A batch that already has st passes through untouched.
    imageh, targeth = next(common.batches(host, 2, to_device=False))
    _, t_same = _prep_batch(
        jnp.asarray(imageh), {k: jnp.asarray(v) for k, v in targeth.items()
                              if not isinstance(v, (str, list))}
    )
    np.testing.assert_allclose(
        np.asarray(t_same["st"]), st_host, atol=1e-6
    )


# ------------------------------------------------------ train prefix cache


def test_rhd_prefix_cache_bit_identical(rhd_root, tmp_path):
    """The deterministic prefix (decode through flip) draws no RNG, so a
    prefix-cached dataset must produce bit-identical items to an
    uncached one at the same seed — training mode included — and the
    second epoch (cache hits) must stay identical too."""
    from mhentropy_tpu.data import rhd

    kw = dict(heavy_fields=set(), image_u8=True, device_st=True)
    a = rhd.load(rhd_root, "training", seed=5, **kw)
    b = rhd.load(rhd_root, "training", seed=5,
                 prefix_cache=str(tmp_path / "pc"), **kw)
    for epoch in range(2):  # epoch 0 populates, epoch 1 reads
        for i in range(len(a)):
            ia, ta = a[i]
            ib, tb = b[i]
            np.testing.assert_array_equal(ia, ib)
            assert set(ta) == set(tb)
            for k in ta:
                if k == "dataset":
                    continue
                np.testing.assert_array_equal(
                    np.asarray(ta[k]), np.asarray(tb[k]), err_msg=k
                )
    assert any((tmp_path / "pc").iterdir())


def test_rhd_prefix_cache_skipped_when_cloud_requested(rhd_root, tmp_path):
    """Full-parity mode computes the cloud inside the prefix region with
    the stream RNG — caching must silently disable itself."""
    from mhentropy_tpu.data import rhd

    ds = rhd.load(rhd_root, "training", prefix_cache=str(tmp_path / "pc"))
    assert not ds._prefix_cacheable
    ds[0]
    assert not (tmp_path / "pc").exists() or not any(
        (tmp_path / "pc").iterdir()
    )


def test_ho3d_prefix_cache_bit_identical(ho3d_root, tmp_path):
    from mhentropy_tpu.data import ho3d

    kw = dict(heavy_fields=set(), image_u8=True, device_st=True)
    a = ho3d.load(ho3d_root, "training", **kw)
    b = ho3d.load(ho3d_root, "training",
                  prefix_cache=str(tmp_path / "pc"), **kw)
    for epoch in range(2):  # epoch 0 populates, epoch 1 reads
        ia, ta = a[0]
        ib, tb = b[0]
        np.testing.assert_array_equal(ia, ib)
        assert set(ta) == set(tb)
        for k in ta:
            if k == "dataset":
                continue
            np.testing.assert_array_equal(
                np.asarray(ta[k]), np.asarray(tb[k]), err_msg=k
            )
    assert any((tmp_path / "pc").iterdir())


def test_prefix_fingerprint_distinguishes_full_from_auto(ho3d_root, tmp_path):
    """heavy=None ('full') and heavy=set() carry different prefix payloads
    (the full one has depth/mask crops) — their cache dirs must differ."""
    from mhentropy_tpu.data import ho3d, rhd

    pc = str(tmp_path / "pc")
    full = ho3d.load(ho3d_root, "training", prefix_cache=pc)
    mini = ho3d.load(ho3d_root, "training", prefix_cache=pc,
                     heavy_fields=set())
    assert full._prefix_dir() != mini._prefix_dir()
    # And the full-target HO3D prefix round-trips through its own dir.
    i1, t1 = full[0]
    i1b, t1b = ho3d.load(ho3d_root, "training", prefix_cache=pc)[0]
    assert "depth" in t1 and "depth" in t1b


def test_sample_cache_survives_pickling(rhd_root, tmp_path):
    """Unpickling probes dunders before __init__ runs — the attribute
    delegation must not recurse (thread pools today, process pools
    tomorrow)."""
    import pickle as pkl

    from mhentropy_tpu.data import cached, rhd

    ds = rhd.load(rhd_root, mode="evaluation", heavy_fields=set())
    wrapped = cached.SampleCache(ds, str(tmp_path / "sc"))
    clone = pkl.loads(pkl.dumps(wrapped))
    img_a, _ = wrapped[0]
    img_b, _ = clone[0]
    np.testing.assert_array_equal(img_a, img_b)


# -------------------------------------------------------------- mixed


def test_mixed_ho3d_rhd_collates(rhd_root, ho3d_root, tmp_path):
    """The reference names mixed_ho3d_rhd in its batch adapter without a
    loader (dataset_transforms.py:12); ours concatenates HO3D + RHD with
    targets projected onto the common key schema so one batch collates."""
    import shutil

    from mhentropy_tpu.data import common, mixed

    root = tmp_path / "mixedroot"
    shutil.copytree(ho3d_root, root)
    shutil.copytree(os.path.join(rhd_root), root, dirs_exist_ok=True)
    ds = mixed.load(str(root), mode="training", heavy_fields=set(),
                    device_st=True)
    assert len(ds) == len(ds.datasets[0]) + len(ds.datasets[1])
    # One batch spanning both members (HO3D train has 1 sample).
    image, target = next(common.batches(ds, 2, to_device=False))
    assert image.shape == (2, 256, 256, 3) and image.dtype == np.float32
    assert "st" not in target and "pose3d" in target and "vis" in target
    keys0 = set(ds.datasets[0][0][1].keys())
    keys1 = set(ds.datasets[1][0][1].keys())
    assert set(target.keys()) | {"dataset"} <= (keys0 & keys1) | {"valid"}


# --------------------------------------------- review-driven behavior pins


def test_rhd_vis_is_patch_only(rhd_root):
    """Reference parity: the emitted RHD vis is rebuilt from ones by
    patch_occlusion(vis=None) (rhddataloader.py:133-134) — the depth
    check_occlusion result is computed and DISCARDED there (and vis is
    ones outright when the patch branch is off, :136). Every non-oob,
    non-patch joint must therefore be 1 regardless of depth."""
    from mhentropy_tpu.data import rhd

    ds = rhd.load(rhd_root, mode="evaluation", heavy_fields=set())
    _, t = ds[0]
    assert set(np.unique(t["vis"])).issubset({0.0, 1.0, 2.0})
    no_patch = rhd.RHDDataset(rhd_root, mode="evaluation",
                              heavy_fields=set(), patch_occlude=False)
    _, t2 = no_patch[0]
    assert set(np.unique(t2["vis"])).issubset({1.0, 2.0})  # ones + oob


def test_rhd_train_heatmap_tracks_augmented_uv(rhd_root):
    """The train-mode heatmap rides the flip + rotMatHeatMap warp
    (augment.py:34, 52, 64-67): each visible in-bounds joint's heatmap
    peak must sit at crop_uv/4 after augmentation."""
    from mhentropy_tpu.data import rhd

    ds = rhd.RHDDataset(rhd_root, mode="training",
                        heavy_fields={"heatmap"}, uv_norm=False)
    for i in range(len(ds)):
        _, t = ds[i]
        hm = t["heatmap"]
        uv = t["crop_uv"].reshape(21, 2) / 4.0
        checked = 0
        for k in range(21):
            if t["target_uv_weight"][k] != 1.0 or not (
                    2 <= uv[k, 0] <= 61 and 2 <= uv[k, 1] <= 61):
                continue
            if hm[..., k].max() < 0.3:  # warp can clip a border peak
                continue
            r, c = np.unravel_index(np.argmax(hm[..., k]), hm.shape[:2])
            assert abs(c - uv[k, 0]) <= 2.0 and abs(r - uv[k, 1]) <= 2.0, (
                i, k, (r, c), uv[k])
            checked += 1
        assert checked >= 3, i  # the assertion actually ran


def test_rhd_augmentation_is_order_independent_and_epoch_varied(rhd_root):
    """Per-(seed, epoch, idx) augmentation RNG (common.item_rng): items
    are identical whatever order they are fetched in (the shared-
    RandomState version depended on collation thread scheduling), and
    set_epoch changes the draws."""
    from mhentropy_tpu.data import rhd

    kw = dict(heavy_fields=set(), device_st=True)
    a = rhd.load(rhd_root, "training", seed=7, **kw)
    b = rhd.load(rhd_root, "training", seed=7, **kw)
    items_fwd = [a[i] for i in range(len(a))]
    items_rev = [b[i] for i in reversed(range(len(b)))][::-1]
    for (ia, ta), (ib, tb) in zip(items_fwd, items_rev):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta["crop_uv"], tb["crop_uv"])
    a.set_epoch(1)
    i2, t2 = a[0]
    assert not np.array_equal(t2["crop_uv"], items_fwd[0][1]["crop_uv"])


def test_prefix_cache_misses_on_annotation_swap(rhd_root, tmp_path):
    """Replacing annotation files in place (same count) must change the
    prefix-cache fingerprint — the cache keys annotation (mtime, size)."""
    import os
    import shutil

    from mhentropy_tpu.data import rhd

    root2 = tmp_path / "rhd2"
    shutil.copytree(rhd_root, root2)
    kw = dict(heavy_fields=set(), prefix_cache=str(tmp_path / "pc"))
    d1 = rhd.load(rhd_root, "training", **kw)._prefix_dir()
    anno = os.path.join(str(root2), "training", "anno_training.pickle")
    os.utime(anno, (1, 1))  # same bytes, different mtime
    ds2 = rhd.RHDDataset(str(root2), "training", **kw)
    # Different root alone changes it; compare against a same-root reload
    # after touching the annotation.
    os.utime(os.path.join(rhd_root, "training", "anno_training.pickle"),
             (2, 2))
    d3 = rhd.load(rhd_root, "training", **kw)._prefix_dir()
    assert d1 != d3
