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
import jax.numpy as jnp

ModuleDef = Any


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

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        x = conv(self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, block_count in enumerate(self.stage_sizes):
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


def resnet18(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, dtype=dtype)


def resnet50(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, dtype=dtype)


FEAT_DIMS = {"resnet18": 512, "resnet50": 2048}


def make_backbone(name: str, dtype=jnp.bfloat16) -> ResNet:
    if name == "resnet18":
        return resnet18(dtype)
    if name == "resnet50":
        return resnet50(dtype)
    raise NotImplementedError(name)
