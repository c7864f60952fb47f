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


def test_mixed_dataset_indexing():
    from mhentropy_tpu.data.mixed import MixedDataset

    class Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (self.tag, i)

    ds = MixedDataset([Fake(3, "a"), Fake(2, "b")])
    assert len(ds) == 5
    assert ds[0] == ("a", 0) and ds[2] == ("a", 2)
    assert ds[3] == ("b", 0) and ds[4] == ("b", 1)


def test_profiling_harness():
    from mhentropy_tpu.utils import profiling

    @jax.jit
    def f(x):
        return x * 2.0

    sec, res = profiling.time_fn(f, jnp.ones(8), iters=3)
    assert sec > 0 and np.all(np.asarray(res) == 2.0)
    hps = profiling.hypotheses_per_sec(f, jnp.ones(8), n_hypotheses=10,
                                       batch=4, iters=3)
    assert hps > 0

    with profiling.nan_sanitizer(False):
        pass  # toggles restore without error
