"""Fused Pallas stage-1 (3 bottleneck blocks) vs the XLA path — interpret
mode on the CPU test platform (the on-TPU A/B is in docs/PERF.md).
"""


import flax.linen as nn
import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.models import resnet, stage1_pallas


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _rand_bn(key, n, mean_scale=0.1):
    ks = jax.random.split(key, 4)
    return {
        "scale": 1.0 + jax.random.normal(ks[0], (n,)) * 0.2,
        "bias": jax.random.normal(ks[1], (n,)) * 0.1,
        "mean": jax.random.normal(ks[2], (n,)) * mean_scale,
        "var": 1.0 + jax.random.uniform(ks[3], (n,)) * 0.5,
    }


def _rand_blocks(key):
    blocks = []
    for j in range(3):
        kj = jax.random.fold_in(key, j)
        ks = jax.random.split(kj, 8)
        cin = 64 if j == 0 else 256
        blk = {
            "conv1": jax.random.normal(ks[0], (1, 1, cin, 64)) * 0.1,
            "bn1": _rand_bn(ks[1], 64),
            "conv2": jax.random.normal(ks[2], (3, 3, 64, 64)) * 0.1,
            "bn2": _rand_bn(ks[3], 64),
            "conv3": jax.random.normal(ks[4], (1, 1, 64, 256)) * 0.1,
            "bn3": _rand_bn(ks[5], 256),
        }
        if j == 0:
            blk["ds_conv"] = jax.random.normal(ks[6], (1, 1, 64, 256)) * 0.1
            blk["ds_bn"] = _rand_bn(ks[7], 256)
        blocks.append(blk)
    return blocks


def _xla_reference(x, blocks, eps=1e-5):
    def bn(y, p):
        g = p["scale"] * jax.lax.rsqrt(p["var"] + eps)
        return y * g + (p["bias"] - p["mean"] * g)

    def conv(y, k, pad):
        return jax.lax.conv_general_dilated(
            y, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for j, b in enumerate(blocks):
        y = nn.relu(bn(conv(x, b["conv1"], "VALID"), b["bn1"]))
        y = nn.relu(bn(conv(y, b["conv2"], [(1, 1), (1, 1)]), b["bn2"]))
        y = bn(conv(y, b["conv3"], "VALID"), b["bn3"])
        res = bn(conv(x, b["ds_conv"], "VALID"), b["ds_bn"]) if j == 0 else x
        x = nn.relu(y + res)
    return x


@pytest.mark.parametrize("h,w", [(8, 64), (8, 56), (16, 40)])
def test_stage1_kernel_matches_xla_f32(h, w):
    """Exact math at f32 (interpret mode has no VMEM budget). Small H keeps
    the emulation affordable while exercising every code path — the
    top/bottom dy margins, both dx wrap masks, all bias rows, and the NHWC
    emit. (8, 56) covers the ProHMR-width half-chunk emit tail
    (hw % 128 == 64); (16, 40) covers hw % 128 == 0 at W != 64."""
    assert stage1_pallas.hw_ok(h, w)
    x = jax.random.normal(jax.random.key(0), (2, h, w, 64))
    blocks = _rand_blocks(jax.random.key(1))
    ours = stage1_pallas.stage1_forward(
        x, blocks, compute_dtype=jnp.float32, out_dtype=jnp.float32)
    ref = _xla_reference(x, blocks)
    assert ours.shape == ref.shape == (2, h, w, 256)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_supported_gate(monkeypatch):
    """Pins the production gate: eval-only, TPU-only, stage-1 geometry,
    and the empirical hw >= 4096 win threshold (64x64 ON; ProHMR's 56x56
    measured a wash on the full pipeline, so OFF — docs/PERF.md)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def ok(h, w, c=64, f=64, n=3, train=False):
        return stage1_pallas.supported(
            jnp.zeros((2, h, w, c)), f, n, train)

    assert ok(64, 64)
    assert not ok(64, 64, train=True)       # training keeps XLA
    assert ok(56, 56)                       # wins since the K=640 conv2
    assert not ok(48, 56)                   # hw=2688 < win gate: unmeasured
    assert not ok(64, 128)                  # taps exceed the lane margin
    assert not ok(64, 64, c=128)            # wrong stage geometry
    assert not ok(64, 64, n=4)
    assert not ok(60, 60)                   # hw % 128 == 16: no emit path
    assert ok(128, 64)                      # big inputs still qualify
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not ok(64, 64)                   # CPU backend never fuses


def test_resnet_pallas_stage1_wiring(monkeypatch):
    """ResNet(pallas_stage1=True) with the backend gate forced: identical
    variable trees (checkpoints oblivious to the kernel choice) and outputs
    at bf16 tolerance. The kernel is substituted with its XLA-equivalent
    math (kernel ≡ XLA is the previous test's job): this checks the flax
    WIRING — param paths, BN fold inputs, dtype flow."""
    monkeypatch.setattr(stage1_pallas, "supported",
                        lambda x, f, n, train: not train)

    def xla_equiv(x, blocks, eps=1e-5, compute_dtype=jnp.bfloat16,
                  out_dtype=jnp.bfloat16):
        blocks = jax.tree.map(lambda a: a.astype(compute_dtype), blocks)
        return _xla_reference(x.astype(compute_dtype),
                              blocks, eps).astype(out_dtype)

    monkeypatch.setattr(stage1_pallas, "stage1_forward", xla_equiv)
    image = jax.random.normal(jax.random.key(7), (1, 64, 64, 3))

    bb_ref = resnet.ResNet(stage_sizes=(3, 1, 1, 1),
                           block_cls=resnet.Bottleneck,
                           dtype=jnp.bfloat16)
    variables = bb_ref.init(jax.random.key(8), image, train=False)
    out_ref = bb_ref.apply(variables, image, train=False)

    bb_pal = resnet.ResNet(stage_sizes=(3, 1, 1, 1),
                           block_cls=resnet.Bottleneck,
                           dtype=jnp.bfloat16, pallas_stage1=True)
    v_pal = bb_pal.init(jax.random.key(8), image, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v_pal))
    shapes_ref = jax.tree.map(jnp.shape, variables)
    shapes_pal = jax.tree.map(jnp.shape, v_pal)
    assert shapes_ref == shapes_pal
    out_pal = bb_pal.apply(variables, image, train=False)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=0.05, atol=0.05)
