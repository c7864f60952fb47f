"""Torch->JAX converter round trips (built from live torch modules), mixed
dataset, profiling harness."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mhentropy_tpu.flows import realnvp  # noqa: E402
from mhentropy_tpu.flows.realnvp import RealNVPConfig  # noqa: E402
from tools import convert_torch  # noqa: E402


def _tiny_torch_resnet_sd(prefix):
    """A structurally-faithful fake torchvision state_dict (resnet18 stem +
    one basic block) to exercise the key mapping."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{prefix}{name}.weight"] = torch.randn(o, i, k, k)

    def bn(name, c):
        sd[f"{prefix}{name}.weight"] = torch.randn(c)
        sd[f"{prefix}{name}.bias"] = torch.randn(c)
        sd[f"{prefix}{name}.running_mean"] = torch.randn(c)
        sd[f"{prefix}{name}.running_var"] = torch.rand(c) + 0.5
        sd[f"{prefix}{name}.num_batches_tracked"] = torch.tensor(7)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    conv("layer1.0.conv1", 64, 64, 3)
    bn("layer1.0.bn1", 64)
    conv("layer1.0.conv2", 64, 64, 3)
    bn("layer1.0.bn2", 64)
    conv("layer2.0.downsample.0", 128, 64, 1)
    bn("layer2.0.downsample.1", 128)
    return sd


def test_convert_resnet_key_mapping():
    sd = _tiny_torch_resnet_sd("feat_extractor.res.")
    params, stats = convert_torch.convert_resnet(sd, "feat_extractor.res.")
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert params["bn1"]["scale"].shape == (64,)
    assert stats["bn1"]["mean"].shape == (64,)
    assert params["layer1_0"]["conv1"]["kernel"].shape == (3, 3, 64, 64)
    assert params["layer2_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 128)
    assert stats["layer2_0"]["downsample_bn"]["var"].shape == (128,)
    # OIHW -> HWIO transpose correctness.
    w = sd["feat_extractor.res.conv1.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["conv1"]["kernel"]), w.transpose(2, 3, 1, 0)
    )


def test_convert_realnvp_matches_module():
    """Build the actual reference flow, convert its state_dict, and check the
    converted params give the same log_prob as our parity-tested loader."""
    import sys

    sys.path.insert(0, "/root/reference/hand")
    try:
        import flows as ref_flows
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    cfg = RealNVPConfig(dim=8, cond_dim=6, h_dim=16, num_steps=2)
    ref = ref_flows.RealNVP(
        dim=cfg.dim, tsfm_on=cfg.cond_dim, kemb=False, jointN=21,
        h_dims=[cfg.h_dim, cfg.h_dim], num_steps=cfg.num_steps,
    )
    sd = {k: v for k, v in ref.state_dict().items()}
    params = convert_torch.convert_realnvp(sd, "", cfg.n_layers)

    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    feat = np.random.RandomState(1).randn(4, 6).astype(np.float32)
    with torch.no_grad():
        ref_lp = ref.log_prob(torch.from_numpy(x), logvar=torch.from_numpy(feat)).numpy()
    ours = np.asarray(
        realnvp.log_prob(params, cfg, jnp.asarray(x), feat=jnp.asarray(feat))
    )
    np.testing.assert_allclose(ours, ref_lp, atol=1e-4)


def test_mixed_dataset_indexing_and_schema():
    import pytest

    from mhentropy_tpu.data.mixed import MixedDataset

    class Fake:
        def __init__(self, n, tag, extra_key):
            self.n, self.tag, self.extra = n, tag, extra_key
            self.probes = 0  # __init__ probes ds[0] once for the schema

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.probes += 1
            return (f"{self.tag}{i}",
                    {"pose3d": (self.tag, i), self.extra: 1})

    a, b = Fake(3, "a", "object_verts"), Fake(2, "b", "patch")
    ds = MixedDataset([a, b])
    # Schema computed EAGERLY (one probe per member — the lazy version
    # raced the thread-pooled collator and consumed hidden RNG draws).
    assert (a.probes, b.probes) == (1, 1)
    assert len(ds) == 5
    # Targets are projected onto the key intersection.
    assert ds[0] == ("a0", {"pose3d": ("a", 0)})
    assert ds[2] == ("a2", {"pose3d": ("a", 2)})
    assert ds[3] == ("b0", {"pose3d": ("b", 0)})
    assert ds[4] == ("b1", {"pose3d": ("b", 1)})
    # Negative indices follow Python convention (the concatenation's
    # end, not the first member's).
    assert ds[-1] == ds[4] and ds[-5] == ds[0]
    with pytest.raises(IndexError):
        ds[5]
    with pytest.raises(IndexError):
        ds[-6]
    # Loss inputs that only a subset of members carry fail at
    # construction with a clear message, not at trace time.
    with pytest.raises(ValueError, match="object_verts"):
        MixedDataset([Fake(3, "a", "object_verts"),
                      Fake(2, "b", "patch")], required={"object_verts"})
    # Non-dict targets are rejected up front.
    class Bad:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return ("img", 0)

    with pytest.raises(TypeError):
        MixedDataset([Bad()])


def test_mixed_dataset_sample_cache_support():
    """cached.eval_deterministic/fingerprint recurse into MixedDataset
    members, so cfg.tpu.sample_cache works for mixed eval datasets."""
    from mhentropy_tpu.data import cached
    from mhentropy_tpu.data.mixed import MixedDataset

    class _Member:
        aug = False
        heavy = frozenset()
        mode = "evaluation"

        def __init__(self, n, tag):
            self.n, self.tag = n, tag

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (i, {"pose3d": (self.tag, i)})

    # eval_deterministic whitelists by loader class NAME.
    class HO3DDataset(_Member):
        pass

    class RHDDataset(_Member):
        pass

    ds = MixedDataset([HO3DDataset(2, "a"), RHDDataset(3, "b")])
    assert cached.eval_deterministic(ds)
    fp = cached.fingerprint(ds)
    assert isinstance(fp, str) and len(fp) == 16
    # The fingerprint tracks member identity (size change -> new dir).
    ds2 = MixedDataset([HO3DDataset(2, "a"), RHDDataset(4, "b")])
    assert cached.fingerprint(ds2) != fp
    # A train-mode member makes the whole mix non-deterministic.
    m = HO3DDataset(2, "a")
    m.aug = True
    assert not cached.eval_deterministic(
        MixedDataset([m, RHDDataset(3, "b")]))


def test_profiling_harness():
    from mhentropy_tpu.utils import profiling

    @jax.jit
    def f(x):
        return x * 2.0

    sec, res = profiling.time_fn(f, jnp.ones(8), iters=3)
    # time_fn perturbs the input per call (relay execution-cache rule,
    # CLAUDE.md "Measurement gotchas") — the result is ~2, not exactly 2.
    assert sec > 0 and np.allclose(np.asarray(res), 2.0, atol=1e-3)
    assert not np.all(np.asarray(res) == 2.0), "inputs were not varied"
    hps = profiling.hypotheses_per_sec(f, jnp.ones(8), n_hypotheses=10,
                                       batch=4, iters=3)
    assert hps > 0

    # The canonical scan harness: per-step varied input, full-carry
    # reduction, one jitted dispatch for `steps` executions.
    acc = profiling.traced_scan(f, (jnp.ones(8),), jax.random.key(0),
                                steps=4)
    assert np.isfinite(float(acc))
    best = profiling.scan_seconds_per_step(f, (jnp.ones(8),),
                                           jax.random.key(0), steps=4,
                                           rounds=2)
    assert best > 0

    with profiling.nan_sanitizer(False):
        pass  # toggles restore without error
