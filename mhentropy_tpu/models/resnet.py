"""ResNet-18/50 image encoder in flax, NHWC, bf16-friendly.

Capability parity with the reference's torchvision backbone usage
(/root/reference/hand/network.py:54-61: resnet18/resnet50 with the fc head
replaced by identity, output = pooled features). Implemented natively (the
environment has no torchvision): the block structure follows the standard
ResNet v1.5 layout (stride on the 3x3 conv) so released torch checkpoints
convert 1:1 via tools/convert_torch.py.

TPU notes: convolutions run in bf16 by default (param dtype stays f32) — the
backbone feeds a flow that is precision-critical, but the image features
themselves tolerate bf16; flip `dtype` to f32 for strict parity runs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class S2DStemConv(nn.Module):
    """The 7x7/2 stem conv, computed as a 4x4/1 conv on a 2x2 space-to-depth
    input with identically-transformed weights (the MLPerf-style TPU stem).

    Exact rewrite: out[i] = sum_k x[2i-3+k] w[k] becomes, after zero-padding
    the kernel on the top/left to 8x8 and padding the input (4, 2) per dim,
    out[i] = sum_{q,r} X[i+q, r] w'[2q+r] — a stride-1 VALID conv over 12
    channels, which tiles onto the MXU far better than a strided conv over 3.
    The parameter keeps the torch layout (7, 7, 3, features) under the same
    "conv1"/"kernel" path, so checkpoints and the torch converter are
    unchanged.
    """

    features: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, self.features),
            jnp.float32,
        )
        w = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w = (
            w.reshape(4, 2, 4, 2, 3, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, self.features)
        )
        xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
        b, h, wd, c = xp.shape
        xs = (
            xp.reshape(b, h // 2, 2, wd // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, wd // 2, 4 * c)
        )
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype),
            w.astype(self.dtype),
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class _StemConvParam(nn.Module):
    """Declares conv1's kernel under the exact path nn.Conv would use
    (conv1/kernel), so checkpoints are oblivious to which stem ran."""

    features: int = 64

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, self.features),
            jnp.float32,
        )


class _StemBNParam(nn.Module):
    """bn1's params/stats under flax BatchNorm's exact paths."""

    features: int = 64

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mean = self.variable("batch_stats", "mean", jnp.zeros,
                             (self.features,))
        var = self.variable("batch_stats", "var", jnp.ones, (self.features,))
        return scale, bias, mean.value, var.value


class _BottleneckParams(nn.Module):
    """Declares one bottleneck block's params/stats under the exact paths
    nn.Conv/nn.BatchNorm would use inside Bottleneck (conv1/bn1/conv2/bn2/
    conv3/bn3 [+ downsample_*]), so checkpoints — and flax init RNG streams,
    which key on module paths — are oblivious to whether the fused Pallas
    stage-1 kernel or the block modules consume them."""

    in_filters: int
    filters: int = 64
    downsample: bool = False

    @nn.compact
    def __call__(self):
        def conv_kernel(name, shape):
            class _K(nn.Module):
                @nn.compact
                def __call__(s):
                    return s.param("kernel", nn.initializers.lecun_normal(),
                                   shape, jnp.float32)

            return _K(name=name)()

        def bn(name, features):
            class _BN(nn.Module):
                @nn.compact
                def __call__(s):
                    return {
                        "scale": s.param("scale", nn.initializers.ones,
                                         (features,), jnp.float32),
                        "bias": s.param("bias", nn.initializers.zeros,
                                        (features,), jnp.float32),
                        "mean": s.variable("batch_stats", "mean", jnp.zeros,
                                           (features,)).value,
                        "var": s.variable("batch_stats", "var", jnp.ones,
                                          (features,)).value,
                    }

            return _BN(name=name)()

        f, fo = self.filters, self.filters * 4
        out = {
            "conv1": conv_kernel("conv1", (1, 1, self.in_filters, f)),
            "bn1": bn("bn1", f),
            "conv2": conv_kernel("conv2", (3, 3, f, f)),
            "bn2": bn("bn2", f),
            "conv3": conv_kernel("conv3", (1, 1, f, fo)),
            "bn3": bn("bn3", fo),
        }
        if self.downsample:
            out["ds_conv"] = conv_kernel(
                "downsample_conv", (1, 1, self.in_filters, fo))
            out["ds_bn"] = bn("downsample_bn", fo)
        return out


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        # Explicit pad 1 (torch semantics): SAME mis-centres strided kernels.
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                      name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), (self.strides, self.strides), name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # v1.5: stride lives on the 3x3 (torchvision semantics); explicit
        # pad 1 — SAME mis-centres strided kernels vs torch.
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * self.expansion, (1, 1),
                (self.strides, self.strides), name="downsample_conv",
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature extractor: (B, H, W, 3) -> (B, feat_dim) pooled features."""

    stage_sizes: Sequence[int]
    block_cls: Callable
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    # Exact space-to-depth stem rewrite. Measured on v5e (honest scanned
    # A/B, B=32 @ 256px): the input reshuffle costs more than the better
    # conv tiling wins back (5.06 vs 4.64 ms/backbone-step), so the naive
    # stem is the default; the option is kept for larger batches/images
    # where the balance may flip.
    s2d_stem: bool = False
    # Fused Pallas stem (conv+BN+ReLU+maxpool in one kernel) on the TPU
    # inference path at 256px — see models/stem_pallas.py and docs/PERF.md.
    pallas_stem: bool = False
    # Fused Pallas stage-1 (all three bottleneck blocks VMEM-resident) on
    # the TPU inference path — see models/stage1_pallas.py and docs/PERF.md.
    pallas_stage1: bool = False
    # Train-mode BN stats/grad reductions as Pallas kernels — measured
    # LOSS on chip, kept opt-in as the r5 A/B record (models/bn_pallas.py
    # header; docs/PERF.md "BUILT, MEASURED, DISPROVEN"). Param/stat
    # paths are identical to nn.BatchNorm, so checkpoints and init
    # streams are oblivious to the flag. False | True ("stats") | "full".
    fused_train_bn: bool | str = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        if self.fused_train_bn:
            from mhentropy_tpu.models import bn_pallas

            # True -> "stats" (the shipping mode); a string selects
            # explicitly ("full" is the measured-loss A/B record).
            mode = (self.fused_train_bn
                    if isinstance(self.fused_train_bn, str) else "stats")
            norm_cls = partial(bn_pallas.FusedTrainBN, mode=mode)
        else:
            norm_cls = nn.BatchNorm
        norm = partial(
            norm_cls,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        use_pallas = False
        if self.pallas_stem and not self.s2d_stem and self.dtype == jnp.bfloat16:
            # bf16 only: the f32 im2col scratch would exceed VMEM.
            from mhentropy_tpu.models import stem_pallas

            use_pallas = stem_pallas.supported(x, self.num_filters, train)
        if use_pallas:
            w = _StemConvParam(self.num_filters, name="conv1")()
            scale, bias, mean, var = _StemBNParam(
                self.num_filters, name="bn1"
            )()
            x = stem_pallas.stem_forward(
                x, w, scale, bias, mean, var, eps=1e-5,
                compute_dtype=self.dtype, out_dtype=self.dtype,
            )
        else:
            x = x.astype(self.dtype)
            if self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                x = S2DStemConv(self.num_filters, dtype=self.dtype,
                                name="conv1")(x)
            else:
                x = conv(self.num_filters, (7, 7), (2, 2),
                         padding=[(3, 3), (3, 3)], name="conv1")(x)
            x = norm(name="bn1")(x)
            x = nn.relu(x)
            # NOTE: reduce_window + select-and-scatter bwd is the right
            # call here. A 9-strided-slice max reformulation (to avoid the
            # 0.55 ms/step select-and-scatter in the bwd) measured 35.0 vs
            # 23.4 ms/train-step — stride-2 spatial slices tile terribly.
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, block_count in enumerate(self.stage_sizes):
            if (i == 0 and self.pallas_stage1
                    and self.block_cls is Bottleneck
                    and self.dtype == jnp.bfloat16):
                # bf16 only: the f32 scratch set would double to ~26 MB.
                from mhentropy_tpu.models import stage1_pallas

                if stage1_pallas.supported(x, self.num_filters, block_count,
                                           train):
                    blocks = [
                        _BottleneckParams(
                            in_filters=x.shape[-1] if j == 0
                            else self.num_filters * 4,
                            filters=self.num_filters,
                            downsample=j == 0,
                            name=f"layer1_{j}",
                        )()
                        for j in range(block_count)
                    ]
                    x = stage1_pallas.stage1_forward(
                        x, blocks, compute_dtype=self.dtype,
                        out_dtype=self.dtype,
                    )
                    continue
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    name=f"layer{i + 1}_{j}",
                )(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x.astype(jnp.float32)


def resnet18(dtype=jnp.bfloat16, pallas_stem: bool = False,
             pallas_stage1: bool = False,
             fused_train_bn: bool = False) -> ResNet:
    # pallas_stage1 is Bottleneck-only; accepted and ignored for symmetry.
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, dtype=dtype,
                  pallas_stem=pallas_stem, fused_train_bn=fused_train_bn)


def resnet50(dtype=jnp.bfloat16, pallas_stem: bool = False,
             pallas_stage1: bool = False,
             fused_train_bn: bool = False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, dtype=dtype,
                  pallas_stem=pallas_stem, pallas_stage1=pallas_stage1,
                  fused_train_bn=fused_train_bn)


FEAT_DIMS = {"resnet18": 512, "resnet50": 2048}


def make_backbone(name: str, dtype=jnp.bfloat16,
                  pallas_stem: bool = False,
                  pallas_stage1: bool = False,
                  fused_train_bn: bool = False) -> ResNet:
    if name == "resnet18":
        return resnet18(dtype, pallas_stem, pallas_stage1, fused_train_bn)
    if name == "resnet50":
        return resnet50(dtype, pallas_stem, pallas_stage1, fused_train_bn)
    raise NotImplementedError(name)
