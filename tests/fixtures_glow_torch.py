"""In-test torch reimplementation of the nkolot/nflows ConditionalGlow.

The real fork is not installable here (pinned at
/root/reference/hand/environment.yml:284, zero-egress box; no retrieved
source in SNIPPETS.md either), so every op below carries a citation to the
upstream symbol it mirrors — file::class.method granularity (upstream line
numbers are unverifiable without the source; symbols are stable across the
fork, which only adds ConditionalGlow/sample-noise plumbing on top of
bayesiains/nflows). Numerically sensitive constants are called out inline at
the op. Module attribute names are chosen so `state_dict()` produces the
fork's exact key schema (`_transform._transforms.{i}...`), pinned in
tests/golden_glow_state_dict_keys.json; the triangulation test
(test_glow_parity_torch.py::test_fixture_schema_triangulates) asserts this
fixture == that pin == tools/convert_torch.convert_conditional_glow's
expected schema, so a mis-read of any one side fails loudly. It is the
parity anchor for mhentropy_tpu/flows/glow.py.

Upstream map (nkolot/nflows == bayesiains/nflows unless noted):
  ActNorm                  -> nflows/transforms/normalization.py::ActNorm
  LULinear                 -> nflows/transforms/lu.py::LULinear
                              (+ base nflows/transforms/linear.py::Linear)
  AffineCouplingTransform  -> nflows/transforms/coupling.py::
                              CouplingTransform / AffineCouplingTransform
  ResidualNet/ResidualBlock-> nflows/nn/nets/resnet.py
  CompositeTransform       -> nflows/transforms/base.py::CompositeTransform
  ConditionalGlow          -> fork-only: nflows/flows/glow.py::
                              ConditionalGlow (used by ProHMR; consumed by
                              the reference at hand/network.py:20, 343-344)
"""

import numpy as np
import torch
from torch import nn
from torch.nn import functional as F


class ActNorm(nn.Module):
    """nflows/transforms/normalization.py::ActNorm.

    Op-by-op: `scale` is exp(log_scale) (ActNorm.scale property); forward is
    scale * x + shift with logabsdet = sum(log_scale) per row (the image
    h*w factor is absent for 2-D inputs, as upstream); the data-dependent
    init runs on the FIRST TRAINING-MODE forward only (ActNorm.forward
    checks `self.training and not self.initialized`)."""

    def __init__(self, features):
        super().__init__()
        self.register_buffer("initialized", torch.tensor(False))
        self.log_scale = nn.Parameter(torch.zeros(features))
        self.shift = nn.Parameter(torch.zeros(features))

    @property
    def scale(self):
        return torch.exp(self.log_scale)

    def forward(self, inputs, context=None):
        if self.training and not self.initialized:
            self._initialize(inputs)
        outputs = self.scale * inputs + self.shift
        logabsdet = torch.sum(self.log_scale) * inputs.new_ones(inputs.shape[0])
        return outputs, logabsdet

    def inverse(self, inputs, context=None):
        outputs = (inputs - self.shift) / self.scale
        logabsdet = -torch.sum(self.log_scale) * inputs.new_ones(inputs.shape[0])
        return outputs, logabsdet

    def _initialize(self, inputs):
        """nflows ActNorm._initialize, expression-exact: std = x.std(dim=0)
        (unbiased, torch default — NO epsilon added), mu = (x / std).mean(0)
        — note mu is computed on the PRE-scaled-by-1/std data, not raw x —
        then log_scale = -log(std), shift = -mu. Post-actnorm activations
        come out ~ zero-mean unit-variance."""
        with torch.no_grad():
            std = inputs.std(dim=0)
            mu = (inputs / std).mean(dim=0)
            self.log_scale.data = -torch.log(std)
            self.shift.data = -mu
            self.initialized.data = torch.tensor(True)


class LULinear(nn.Module):
    """nflows/transforms/lu.py::LULinear (bias from the Linear base class,
    nflows/transforms/linear.py).

    Op-by-op: weight = L @ U with L unit-lower-triangular (diag forced to
    1.0 in _create_lower_upper) and U upper-triangular whose diag is
    softplus(unconstrained) + eps, eps = 1e-3 (LULinear.__init__ default);
    identity init sets unconstrained_upper_diag to the softplus preimage of
    1 - eps, i.e. log(exp(1 - eps) - 1) (LULinear._initialize with
    identity_init=True; off-diagonals zero). forward = x @ U^T then @ L^T
    + bias (two F.linear calls in LULinear.forward_no_cache — U applied
    FIRST); logabsdet = sum(log(upper_diag)), input-independent. inverse
    solves the two triangular systems in the opposite order
    (LULinear.inverse_no_cache)."""

    def __init__(self, features, identity_init=True, eps=1e-3):
        super().__init__()
        self.features = features
        self.eps = eps
        self.bias = nn.Parameter(torch.zeros(features))
        self.lower_indices = np.tril_indices(features, k=-1)
        self.upper_indices = np.triu_indices(features, k=1)
        self.diag_indices = np.diag_indices(features)
        n_tri = ((features - 1) * features) // 2
        self.lower_entries = nn.Parameter(torch.zeros(n_tri))
        self.upper_entries = nn.Parameter(torch.zeros(n_tri))
        self.unconstrained_upper_diag = nn.Parameter(torch.zeros(features))
        if identity_init:
            nn.init.constant_(
                self.unconstrained_upper_diag, np.log(np.exp(1 - eps) - 1)
            )
        else:
            stdv = 1.0 / np.sqrt(features)
            nn.init.uniform_(self.lower_entries, -stdv, stdv)
            nn.init.uniform_(self.upper_entries, -stdv, stdv)
            nn.init.uniform_(self.unconstrained_upper_diag, -stdv, stdv)

    @property
    def upper_diag(self):
        return F.softplus(self.unconstrained_upper_diag) + self.eps

    def _create_lower_upper(self):
        lower = self.lower_entries.new_zeros(self.features, self.features)
        lower[self.lower_indices] = self.lower_entries
        lower[self.diag_indices] = 1.0
        upper = self.upper_entries.new_zeros(self.features, self.features)
        upper[self.upper_indices] = self.upper_entries
        upper[self.diag_indices] = self.upper_diag
        return lower, upper

    def logabsdet(self):
        return torch.sum(torch.log(self.upper_diag))

    def forward(self, inputs, context=None):
        lower, upper = self._create_lower_upper()
        outputs = F.linear(inputs, upper)
        outputs = F.linear(outputs, lower, self.bias)
        return outputs, self.logabsdet() * inputs.new_ones(inputs.shape[0])

    def inverse(self, inputs, context=None):
        lower, upper = self._create_lower_upper()
        outputs = (inputs - self.bias).t()
        outputs = torch.linalg.solve_triangular(
            lower, outputs, upper=False, unitriangular=True
        )
        outputs = torch.linalg.solve_triangular(upper, outputs, upper=True)
        outputs = outputs.t()
        return outputs, -self.logabsdet() * inputs.new_ones(inputs.shape[0])


class ResidualBlock(nn.Module):
    """nflows/nn/nets/resnet.py::ResidualBlock.

    Op order (ResidualBlock.forward): [bn0] -> relu -> linear0 -> [bn1] ->
    relu -> dropout -> linear1 -> context fusion -> residual add. The
    context fusion is GLU with the BLOCK OUTPUT in the value half and the
    projected context in the GATE half: glu(cat([temps, context_layer(ctx)],
    dim=1), dim=1) == temps * sigmoid(context_layer(ctx)) — gating order
    matters and is asserted against the manual sigmoid form in
    test_glow_parity_torch. Final linear initialised U(-1e-3, 1e-3)
    (ResidualBlock.__init__). BatchNorm eps = 1e-3 when enabled."""

    def __init__(self, features, context_features, dropout_probability=0.0,
                 use_batch_norm=False):
        super().__init__()
        if context_features is not None:
            self.context_layer = nn.Linear(context_features, features)
        self.use_batch_norm = use_batch_norm
        if use_batch_norm:
            self.batch_norm_layers = nn.ModuleList(
                [nn.BatchNorm1d(features, eps=1e-3) for _ in range(2)]
            )
        self.linear_layers = nn.ModuleList(
            [nn.Linear(features, features) for _ in range(2)]
        )
        self.dropout = nn.Dropout(p=dropout_probability)
        nn.init.uniform_(self.linear_layers[-1].weight, -1e-3, 1e-3)
        nn.init.uniform_(self.linear_layers[-1].bias, -1e-3, 1e-3)

    def forward(self, inputs, context=None):
        temps = inputs
        if self.use_batch_norm:
            temps = self.batch_norm_layers[0](temps)
        temps = F.relu(temps)
        temps = self.linear_layers[0](temps)
        if self.use_batch_norm:
            temps = self.batch_norm_layers[1](temps)
        temps = F.relu(temps)
        temps = self.dropout(temps)
        temps = self.linear_layers[1](temps)
        if context is not None:
            temps = F.glu(torch.cat((temps, self.context_layer(context)), dim=1),
                          dim=1)
        return inputs + temps


class ResidualNet(nn.Module):
    """nflows/nn/nets/resnet.py::ResidualNet: initial_layer consumes
    cat([inputs, context], dim=1) when context_features is set
    (ResidualNet.forward), then num_blocks ResidualBlocks (each ALSO fed the
    raw context for its GLU gate), then final_layer."""

    def __init__(self, in_features, out_features, hidden_features,
                 context_features=None, num_blocks=2, dropout_probability=0.0,
                 use_batch_norm=False):
        super().__init__()
        self.context_features = context_features
        if context_features is not None:
            self.initial_layer = nn.Linear(
                in_features + context_features, hidden_features
            )
        else:
            self.initial_layer = nn.Linear(in_features, hidden_features)
        self.blocks = nn.ModuleList(
            [ResidualBlock(hidden_features, context_features,
                           dropout_probability, use_batch_norm)
             for _ in range(num_blocks)]
        )
        self.final_layer = nn.Linear(hidden_features, out_features)

    def forward(self, inputs, context=None):
        if context is None:
            temps = self.initial_layer(inputs)
        else:
            temps = self.initial_layer(torch.cat((inputs, context), dim=1))
        for block in self.blocks:
            temps = block(temps, context=context)
        return self.final_layer(temps)


class AffineCouplingTransform(nn.Module):
    """nflows/transforms/coupling.py::CouplingTransform (split/scatter
    mechanics) + AffineCouplingTransform (_scale_and_shift).

    Op-by-op: mask <= 0 selects identity_features, mask > 0 the transformed
    half (CouplingTransform.__init__); the net maps identity -> 2 *
    n_transform params, SHIFT in the first half, unconstrained scale in the
    second (AffineCouplingTransform._scale_and_shift reads
    transform_params[:, :nt] as shift); scale = sigmoid(unconstrained + 2)
    + 1e-3 (same method — the +2 bias centres init scale near sigmoid(2)
    ~ 0.88); forward is x * scale + shift on the transformed half with
    logabsdet = sum(log(scale)), identity half passed through untouched."""

    def __init__(self, mask, transform_net_create_fn):
        super().__init__()
        mask = torch.as_tensor(mask)
        self.features = len(mask)
        features_vector = torch.arange(self.features)
        self.register_buffer(
            "identity_features", features_vector.masked_select(mask <= 0)
        )
        self.register_buffer(
            "transform_features", features_vector.masked_select(mask > 0)
        )
        self.transform_net = transform_net_create_fn(
            len(self.identity_features), len(self.transform_features) * 2
        )

    def _scale_and_shift(self, transform_params):
        nt = len(self.transform_features)
        shift = transform_params[:, :nt]
        unconstrained_scale = transform_params[:, nt:]
        scale = torch.sigmoid(unconstrained_scale + 2) + 1e-3
        return scale, shift

    def forward(self, inputs, context=None):
        identity_split = inputs[:, self.identity_features]
        transform_split = inputs[:, self.transform_features]
        transform_params = self.transform_net(identity_split, context)
        scale, shift = self._scale_and_shift(transform_params)
        transform_split = transform_split * scale + shift
        logabsdet = torch.log(scale).sum(-1)
        outputs = torch.empty_like(inputs)
        outputs[:, self.identity_features] = identity_split
        outputs[:, self.transform_features] = transform_split
        return outputs, logabsdet

    def inverse(self, inputs, context=None):
        identity_split = inputs[:, self.identity_features]
        transform_split = inputs[:, self.transform_features]
        transform_params = self.transform_net(identity_split, context)
        scale, shift = self._scale_and_shift(transform_params)
        transform_split = (transform_split - shift) / scale
        logabsdet = -torch.log(scale).sum(-1)
        outputs = torch.empty_like(inputs)
        outputs[:, self.identity_features] = identity_split
        outputs[:, self.transform_features] = transform_split
        return outputs, logabsdet


class CompositeTransform(nn.Module):
    """nflows/transforms/base.py::CompositeTransform: forward applies
    transforms in list order accumulating logabsdet; inverse applies the
    element-wise inverses in REVERSED order (CompositeTransform._cascade)."""

    def __init__(self, transforms):
        super().__init__()
        self._transforms = nn.ModuleList(transforms)

    def forward(self, inputs, context=None):
        total = inputs.new_zeros(inputs.shape[0])
        outputs = inputs
        for tf in self._transforms:
            outputs, logabsdet = tf(outputs, context=context)
            total = total + logabsdet
        return outputs, total

    def inverse(self, inputs, context=None):
        total = inputs.new_zeros(inputs.shape[0])
        outputs = inputs
        for tf in reversed(self._transforms):
            outputs, logabsdet = tf.inverse(outputs, context=context)
            total = total + logabsdet
        return outputs, total


class ConditionalGlow(nn.Module):
    """Fork-only class (nkolot/nflows nflows/flows/glow.py::ConditionalGlow,
    the ProHMR dependency): num_layers x (ActNorm, LULinear identity-init,
    conditional AffineCoupling with a ResidualNet conditioner), standard
    normal base, binary mask starting -1 on EVEN indices (mask[::2] = -1)
    and flipped between layers (mask *= -1). sample_and_log_prob is the
    fork's noise-injection variant (accepts pre-drawn base noise — the API
    the reference drives at hand/network.py:736-742); log_prob returns
    (logp, noise) with logp = base_log_prob(forward(x)) + logabsdet."""

    def __init__(self, features, hidden_features, num_layers,
                 num_blocks_per_layer, context_features=None,
                 dropout_probability=0.0, batch_norm_within_layers=False):
        super().__init__()
        self.features = features
        mask = torch.ones(features)
        mask[::2] = -1

        def create_resnet(in_features, out_features):
            return ResidualNet(
                in_features, out_features, hidden_features=hidden_features,
                context_features=context_features,
                num_blocks=num_blocks_per_layer,
                dropout_probability=dropout_probability,
                use_batch_norm=batch_norm_within_layers,
            )

        layers = []
        for _ in range(num_layers):
            layers.append(ActNorm(features))
            layers.append(LULinear(features, identity_init=True))
            layers.append(
                AffineCouplingTransform(
                    mask=mask, transform_net_create_fn=create_resnet
                )
            )
            mask = mask * -1
        self._transform = CompositeTransform(layers)

    def _base_log_prob(self, noise):
        return -0.5 * (noise ** 2).sum(-1) - 0.5 * self.features * np.log(
            2 * np.pi
        )

    def log_prob(self, inputs, context=None):
        noise, logabsdet = self._transform(inputs, context=context)
        return self._base_log_prob(noise) + logabsdet, noise

    def sample_and_log_prob(self, num_samples, noise=None, context=None):
        """(samples (B, N, D), log_prob (B, N), noise) given externally
        supplied base noise (B, N, D) — the fork API the reference uses at
        network.py:736-742."""
        b = context.shape[0]
        if noise is None:
            noise = torch.randn(b, num_samples, self.features)
        noise_flat = noise.reshape(-1, self.features)
        ctx_rows = context[:, None].expand(-1, num_samples, -1).reshape(
            -1, context.shape[-1]
        )
        samples, logabsdet = self._transform.inverse(noise_flat, context=ctx_rows)
        log_prob = self._base_log_prob(noise_flat) - logabsdet
        return (
            samples.reshape(b, num_samples, self.features),
            log_prob.reshape(b, num_samples),
            noise,
        )


def randomize_(module: nn.Module, seed: int = 0, scale: float = 0.3):
    """Give every parameter a non-degenerate random value (identity-init
    LULinears and zero actnorms wouldn't exercise the mapping). Per-name
    scales keep the 4-layer composition numerically tame so f32 parity is
    meaningful (dense random LU entries at 0.3 explode to ~1e19)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if "upper_diag" in name:
                # softplus(x) ~ 1: keeps every LU step well-conditioned in
                # both directions (f32 parity is meaningless at cond ~ 1e6).
                p.copy_(0.5413 + torch.randn(p.shape, generator=g) * 0.05)
                continue
            s = scale
            if "entries" in name:
                s = 0.3 / np.sqrt(module_features(module))
            elif name.endswith("log_scale"):
                s = 0.2
            elif "final_layer.weight" in name:
                s = 0.05  # keeps coupling shifts O(1): the inverse direction
            elif any(t in name for t in ("initial_layer", "linear_layers",
                                         "context_layer")):
                s = 0.15  # compounds over 4 layers otherwise (~1e10 outputs)
            p.copy_(torch.randn(p.shape, generator=g) * s)
        for name, buf in module.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.2)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)


def module_features(module: nn.Module) -> int:
    for m in module.modules():
        if isinstance(m, ConditionalGlow):
            return m.features
        if isinstance(m, LULinear):
            return m.features
    return 45
