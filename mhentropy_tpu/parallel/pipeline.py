"""GPipe pipeline parallelism over the coupling-flow stack.

The RealNVP stack is L identical coupling layers with stacked (L, ...)
weights (flows/realnvp.py RealNVPParams) — the textbook pipeline shape.
`inverse_pipelined` splits the stack into P contiguous stages over the
mesh's 'pipe' axis and streams M microbatches through them on a GPipe
schedule (T = M + P - 1 ticks), moving activations between stages with
`jax.lax.ppermute` inside a `shard_map`. The whole schedule lives in one
`lax.scan`, so it is a single compiled program and fully differentiable:
the transpose of ppermute is the reverse permute, so `jax.grad` yields
the standard reverse-order pipeline for the backward pass for free.

The reference has no distributed code at all (SURVEY.md §2.3); this is
part of the TPU-native scaling design, alongside DP ('data'),
hypothesis sharding ('hypo'), FSDP/ZeRO-3 and Megatron TP ('model') in
parallel/mesh.py. For the shipped 12-layer hand flow a pipeline is
latency-motivated only at very deep stacks; the value here is the
verified schedule (≡ the sequential scan, gradients included — tested)
that a deeper flow would shard over a real pod's 'pipe' axis.

Expert parallelism (EP) is deliberately absent framework-wide: no model
family in the reference (MHEnt hand, RLE, ProHMR) contains a
mixture-of-experts — there is nothing to shard expert-wise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # jax >= 0.4.35 exports it at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax nests it
    from jax.experimental.shard_map import shard_map

# The check_rep -> check_vma rename (~jax 0.7) is independent of where
# shard_map is exported, so probe the signature, not the import path:
# jax in [0.4.35, 0.7) has the top-level export but only check_rep.
import inspect as _inspect

_NO_REP_CHECK = (
    {"check_vma": False}
    if "check_vma" in _inspect.signature(shard_map).parameters
    else {"check_rep": False}
)
from jax.sharding import NamedSharding, PartitionSpec as P

from mhentropy_tpu.flows import realnvp
from mhentropy_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS


def inverse_pipelined(
    params: realnvp.RealNVPParams,
    cfg: realnvp.RealNVPConfig,
    x: jax.Array,
    cproj: jax.Array,
    mesh,
    n_micro: int,
):
    """`realnvp.inverse` with the layer stack pipelined over 'pipe'.

    Args:
        x: (R, D) data rows; R must divide into n_micro microbatches whose
            size divides the mesh's 'data' axis.
        cproj: (L, 4, R, H) conditioning cache (realnvp.cond_cache).
        n_micro: number of microbatches streamed through the pipeline.

    Returns:
        (z, logdet), identical to `realnvp.inverse(params, cfg, x, cproj)`
        up to float reassociation.
    """
    # inverse applies layers last-to-first: flip the stack so stage 0 runs
    # the last layers and activations flow in increasing stage order.
    return _run_pipelined(
        params, cfg, x, cproj, mesh, n_micro,
        layer_fn=realnvp.inverse_layer, flip=True,
    )


def forward_pipelined(
    params: realnvp.RealNVPParams,
    cfg: realnvp.RealNVPConfig,
    z: jax.Array,
    cproj: jax.Array,
    mesh,
    n_micro: int,
):
    """`realnvp.forward` (base -> data, the sampling direction) with the
    layer stack pipelined over 'pipe' — the stack runs first-to-last, so no
    flip. Returns (x, logdet), identical to `realnvp.forward` up to float
    reassociation."""
    return _run_pipelined(
        params, cfg, z, cproj, mesh, n_micro,
        layer_fn=realnvp.forward_layer, flip=False,
    )


def _run_pipelined(params, cfg, x, cproj, mesh, n_micro, layer_fn, flip):
    n_pipe = mesh.shape[PIPE_AXIS]
    layers_per = cfg.n_layers // n_pipe
    assert layers_per * n_pipe == cfg.n_layers, (cfg.n_layers, n_pipe)
    rows, dim = x.shape
    assert rows % n_micro == 0, (rows, n_micro)
    rows_m = rows // n_micro
    conditional = cfg.effective_cond_dim() > 0

    def stage_stack(a):
        a = jnp.flip(a, 0) if flip else a
        return a.reshape(n_pipe, layers_per, *a.shape[1:])

    layers = jax.tree_util.tree_map(stage_stack, realnvp._layer_tree(params))
    # (L, 4, R, H) -> (flipped,) staged, microbatched: (P, Ls, 4, M, Rm, H).
    cp = (jnp.flip(cproj, 0) if flip else cproj).reshape(
        n_pipe, layers_per, 4, n_micro, rows_m, cproj.shape[-1]
    )
    x_m = x.reshape(n_micro, rows_m, dim)

    fwd = [(i, i + 1) for i in range(n_pipe - 1)]

    def staged(layers_s, cp_s, xm):
        s_idx = jax.lax.axis_index(PIPE_AXIS)
        layers_s = jax.tree_util.tree_map(lambda a: a[0], layers_s)
        cp_s = cp_s[0]  # (Ls, 4, M, Rm_local, H)
        rm_l, d = xm.shape[1], xm.shape[2]

        def layer_body(carry, inp):
            z, ld = carry
            layer, c = inp
            return layer_fn(layer, c, z, ld, conditional), None

        def tick(carry, t):
            recv, out = carry
            # Stage 0 ingests microbatch t (clamped past the end — those
            # ticks' results are never written); later stages consume what
            # the previous stage sent last tick.
            m_in = jnp.clip(t, 0, n_micro - 1)
            fresh = jnp.concatenate(
                [
                    jax.lax.dynamic_index_in_dim(xm, m_in, 0, keepdims=False),
                    jnp.zeros((rm_l, 1), xm.dtype),
                ],
                axis=-1,
            )
            inp = jnp.where(s_idx == 0, fresh, recv)
            m_here = jnp.clip(t - s_idx, 0, n_micro - 1)
            c_t = jax.lax.dynamic_index_in_dim(cp_s, m_here, 2, keepdims=False)
            (z, ld), _ = jax.lax.scan(
                layer_body, (inp[:, :d], inp[:, d]), (layers_s, c_t)
            )
            packed = jnp.concatenate([z, ld[:, None]], axis=-1)
            # The last stage commits microbatch t-(P-1) once it's flowed
            # through every stage.
            m_out = t - (n_pipe - 1)
            valid = (s_idx == n_pipe - 1) & (m_out >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                out, packed, jnp.clip(m_out, 0, n_micro - 1), 0
            )
            out = jnp.where(valid, upd, out)
            sent = jax.lax.ppermute(packed, PIPE_AXIS, fwd)
            return (sent, out), None

        init = (
            jnp.zeros((rm_l, d + 1), xm.dtype),
            jnp.zeros((n_micro, rm_l, d + 1), xm.dtype),
        )
        (_, out), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + n_pipe - 1)
        )
        # Only the last stage holds the result; psum over 'pipe' makes the
        # declared replicated out_spec true.
        out = jax.lax.psum(
            jnp.where(s_idx == n_pipe - 1, out, jnp.zeros_like(out)),
            PIPE_AXIS,
        )
        return out

    out = shard_map(
        staged,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(PIPE_AXIS), layers),
            P(PIPE_AXIS, None, None, None, DATA_AXIS, None),
            P(None, DATA_AXIS, None),
        ),
        out_specs=P(None, DATA_AXIS, None),
        **_NO_REP_CHECK,
    )(layers, cp, x_m)
    z = out[..., :dim].reshape(rows, dim)
    logdet = out[..., dim].reshape(rows)
    return z, logdet


def log_prob_pipelined(
    params: realnvp.RealNVPParams,
    cfg: realnvp.RealNVPConfig,
    x: jax.Array,
    feat: jax.Array,
    mesh,
    n_micro: int,
) -> jax.Array:
    """Standard-conditional log q(x | feat) through the pipelined stack
    (the tsfm/vis-weight variants stay on the sequential path — they wrap
    the same inverse)."""
    if cfg.dim in (2, 3):
        raise NotImplementedError(
            "log_prob_pipelined covers the standard-conditional flow; "
            "per-joint configs (dim in {2,3}) reshape rows and sum/weight "
            "per sample — use realnvp.log_prob."
        )
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)
    z, logdet = inverse_pipelined(params, cfg, x, cproj, mesh, n_micro)
    return realnvp._std_normal_logp(z) + logdet


def sample_pipelined(
    params: realnvp.RealNVPParams,
    cfg: realnvp.RealNVPConfig,
    key,
    batch_rows: int,
    feat: jax.Array,
    mesh,
    n_micro: int,
    temp: float = 0.7,
    n_per_image: int = 1,
    return_log_prob: bool = False,
):
    """`realnvp.sample` (standard-conditional path) with the coupling stack
    pipelined over 'pipe' — the training draw of reverse_kld, so it must be
    differentiable: the whole schedule is one lax.scan of ppermutes, whose
    transpose is the reverse-order pipeline (gradients ≡ sequential,
    tested). The tsfm/actnorm variants stay sequential, as in
    log_prob_pipelined.

    n_per_image: hypotheses per feat row; conditioning projections are
    computed once per image and tiled, like mhent.sample_q_z does.
    """
    if cfg.tsfm_on in ("x", "z"):
        raise NotImplementedError(
            "sample_pipelined covers the standard-conditional flow; "
            "actnorm-wrapped variants use realnvp.sample."
        )
    d = cfg.dim
    z0 = jax.random.normal(key, (batch_rows, d)) * temp
    if cfg.effective_cond_dim() > 0:
        cond = realnvp.make_cond(params, cfg, feat)
        cproj = realnvp.cond_cache(params, cfg, cond)
        if n_per_image > 1:
            cproj = jnp.tile(cproj, (1, 1, n_per_image, 1))
    else:
        cproj = jnp.zeros((cfg.n_layers, 4, batch_rows, 1))
    x, fwd_logdet = forward_pipelined(params, cfg, z0, cproj, mesh, n_micro)
    if return_log_prob:
        return x, realnvp._std_normal_logp(z0) - fwd_logdet
    return x
