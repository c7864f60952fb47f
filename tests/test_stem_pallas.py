"""Fused Pallas stem (conv7x7/2+BN+ReLU+maxpool) vs the XLA path —
interpret mode on the CPU test platform (the on-TPU A/B is in docs/PERF.md).
"""

import flax.linen as nn
import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.models import resnet, stem_pallas


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _xla_reference(image, kernel, scale, bias, mean, var, eps=1e-5):
    y = jax.lax.conv_general_dilated(
        image, kernel, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = (y - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    y = jnp.maximum(y, 0.0)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def test_stem_kernel_matches_xla_f32():
    """Exact math check at f32 (interpret mode has no VMEM budget).

    h=64 (W stays 256, the lane-locked dim): H only scales the row-loop
    trip counts, and 64 rows still exercise every code path incl. the
    padded top/bottom edges — at 1/4 the interpret-emulation cost (150 s
    -> ~40 s of suite time at h=256)."""
    k = jax.random.key(0)
    image = jax.random.normal(k, (1, 64, 256, 3))
    kernel = jax.random.normal(jax.random.key(1), (7, 7, 3, 64)) * 0.1
    scale = 1.0 + jax.random.normal(jax.random.key(2), (64,)) * 0.2
    bias = jax.random.normal(jax.random.key(3), (64,)) * 0.1
    mean = jax.random.normal(jax.random.key(4), (64,)) * 0.1
    var = 1.0 + jax.random.uniform(jax.random.key(5), (64,)) * 0.5

    ours = stem_pallas.stem_forward(
        image, kernel, scale, bias, mean, var,
        compute_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    ref = _xla_reference(image, kernel, scale, bias, mean, var)
    assert ours.shape == ref.shape == (1, 16, 64, 64)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_resnet_pallas_stem_wiring(monkeypatch):
    """ResNet(pallas_stem=True) with the backend gate forced: same params
    drive both stems; outputs agree at bf16 tolerance; the param/stat paths
    are identical so checkpoints are oblivious to the stem choice.

    The kernel itself is substituted with its XLA-equivalent math (the
    kernel ≡ XLA equivalence is the previous test's job): this test checks
    the flax WIRING — param paths, BN folding inputs, dtype flow — and the
    interpreted kernel costs ~2 min of suite time it doesn't need."""
    monkeypatch.setattr(stem_pallas, "supported",
                        lambda x, f, train: not train and x.shape[1] == 256)

    def xla_equiv_forward(image, kernel, scale, bias, mean, var, eps=1e-5,
                          compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16):
        return _xla_reference(
            image.astype(compute_dtype), kernel.astype(compute_dtype),
            scale, bias, mean, var, eps
        ).astype(out_dtype)

    monkeypatch.setattr(stem_pallas, "stem_forward", xla_equiv_forward)
    image = jax.random.normal(jax.random.key(7), (1, 256, 256, 3))

    bb_ref = resnet.ResNet(stage_sizes=(1, 1, 1, 1),
                           block_cls=resnet.BasicBlock,
                           dtype=jnp.bfloat16, pallas_stem=False)
    variables = bb_ref.init(jax.random.key(8), image, train=False)
    out_ref = bb_ref.apply(variables, image, train=False)

    bb_pal = resnet.ResNet(stage_sizes=(1, 1, 1, 1),
                           block_cls=resnet.BasicBlock,
                           dtype=jnp.bfloat16, pallas_stem=True)
    v_pal = bb_pal.init(jax.random.key(8), image, train=False)
    ref_paths = jax.tree_util.tree_structure(variables)
    pal_paths = jax.tree_util.tree_structure(v_pal)
    assert ref_paths == pal_paths
    out_pal = bb_pal.apply(variables, image, train=False)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=0.05, atol=0.05)
