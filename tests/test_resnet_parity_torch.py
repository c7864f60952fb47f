"""Numeric parity of the flax ResNet + convert_resnet against a torch
reimplementation of torchvision's resnet blocks (VERDICT r1 item 6: a silent
BN/stride/downsample mapping bug must fail here, not when the released
checkpoint arrives). torchvision itself is absent; the in-test modules use
its exact module names so state_dict keys match the real checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mhentropy_tpu.models.resnet import BasicBlock, Bottleneck, ResNet  # noqa: E402
from tools.convert_torch import convert_resnet  # noqa: E402


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        # torchvision v1.5: stride on the 3x3.
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    """torchvision.models.ResNet feature extractor (fc = Identity, matching
    hand/network.py:61)."""

    def __init__(self, block, layers, num_filters=64):
        super().__init__()
        self.inplanes = num_filters
        self.conv1 = nn.Conv2d(3, num_filters, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(num_filters)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, num_filters, layers[0])
        self.layer2 = self._make_layer(block, num_filters * 2, layers[1], 2)
        self.layer3 = self._make_layer(block, num_filters * 4, layers[2], 2)
        self.layer4 = self._make_layer(block, num_filters * 8, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride,
                          bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        return torch.flatten(x, 1)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)


@pytest.mark.parametrize("block_name", ["basic", "bottleneck"])
def test_converted_resnet_forward_matches_torch(block_name):
    t_block = {"basic": TorchBasicBlock, "bottleneck": TorchBottleneck}[
        block_name
    ]
    j_block = {"basic": BasicBlock, "bottleneck": Bottleneck}[block_name]
    layers = [1, 1, 1, 1]
    t_model = TorchResNet(t_block, layers, num_filters=8)
    _randomize(t_model, seed=0)
    t_model.eval()

    params, stats = convert_resnet(
        {k: v for k, v in t_model.state_dict().items()}, prefix=""
    )
    j_model = ResNet(stage_sizes=layers, block_cls=j_block, num_filters=8,
                     dtype=jnp.float32)

    rng = np.random.RandomState(1)
    # Odd spatial size exercises the strided-conv padding alignment too.
    for size in (64, 57):
        x = rng.randn(2, size, size, 3).astype(np.float32)
        with torch.no_grad():
            want = t_model(torch.tensor(x.transpose(0, 3, 1, 2)))
        got = j_model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), train=False,
        )
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"size {size}",
        )


def test_s2d_stem_equals_naive_stem():
    """The space-to-depth stem is an exact rewrite: same params, same
    output as the strided 7x7 conv (resnet.py::S2DStemConv)."""
    layers = [1, 1, 1, 1]
    kw = dict(stage_sizes=layers, block_cls=BasicBlock, num_filters=8,
              dtype=jnp.float32)
    naive = ResNet(s2d_stem=False, **kw)
    s2d = ResNet(s2d_stem=True, **kw)
    x = np.random.RandomState(2).randn(2, 64, 64, 3).astype(np.float32)
    variables = naive.init(jax.random.key(0), jnp.asarray(x), train=False)
    want = naive.apply(variables, jnp.asarray(x), train=False)
    got = s2d.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
