"""Fused LBS blend kernel: verts = blend(W, chain_R, skin_t) applied to the
posed mesh, without the (3, 3, V, R) per-vertex-rotation intermediate.

The XLA path (core/mano.py, reference hand/manopth/manolayer.py:236-268)
computes

    per_vert_r[r, c, v, b] = sum_j W[v, j] * R[r, c, j, b]      (9 planes)
    verts[r, v, b] = sum_c per_vert_r[r, c] * vp[c] + W @ t[r]

materialising all nine (V, R) planes: ~90 MB of f32 HBM round-trips at the
bench shape (V=778, R=3200) and ~360 MB at the shipped eval shape
(R=12800) — the blend is pure bandwidth, not FLOPs. This kernel streams
R-tiles through VMEM instead: per tile, twelve tiny (V, 16) @ (16, tile)
GEMMs and nine elementwise multiply-accumulates, reading each posed-mesh
plane once and writing each output plane once (~5x less HBM traffic).

Inference-path only (sample_hypotheses / eval): the training step's decode
keeps the XLA einsums, which autodiff cleanly and sit in a step that is
encoder-bwd dominated anyway.

No Mosaic exotica: GEMMs + elementwise on (V, tile) f32 planes — none of
the stem kernel's roll/layout landmines (models/stem_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel(w_ref, r_ref, t_ref, vp_ref, out_ref):
    acc = None
    for r in range(3):
        # Translation term: W (V, J) @ skin_t[r] (J, tile).
        acc = jax.lax.dot_general(
            w_ref[...], t_ref[0, r],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for c in range(3):
            # Per-vertex rotation column (V, tile), consumed immediately.
            pvr = jax.lax.dot_general(
                w_ref[...], r_ref[0, r, c],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            acc = acc + pvr * vp_ref[0, c]
        out_ref[0, r] = acc


@functools.partial(jax.jit, static_argnames=("tile",))
def lbs_blend(
    lbs_weights: jax.Array,
    chain_r_nl: jax.Array,
    skin_t_nl: jax.Array,
    v_posed_nl: jax.Array,
    tile: int = 256,
):
    """Batch-last fused LBS blend.

    Args:
        lbs_weights: (V, J) skinning weights.
        chain_r_nl: (3, 3, J, R) chain rotations, batch-last.
        skin_t_nl: (3, J, R) chain translations (rest-pose offset removed).
        v_posed_nl: (3, V, R) posed mesh, batch-last.
        tile: R-tile width (lanes); R pads up to a multiple.

    Returns:
        verts_nl: (3, V, R) skinned mesh.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v, j = lbs_weights.shape
    rows = v_posed_nl.shape[-1]
    padded = (rows + tile - 1) // tile * tile
    if padded != rows:
        chain_r_nl = jnp.pad(
            chain_r_nl, ((0, 0), (0, 0), (0, 0), (0, padded - rows))
        )
        skin_t_nl = jnp.pad(skin_t_nl, ((0, 0), (0, 0), (0, padded - rows)))
        v_posed_nl = jnp.pad(v_posed_nl, ((0, 0), (0, 0), (0, padded - rows)))

    # Vertex tiling bounds VMEM at SMPL scale (V=6890: a full (3, V, tile)
    # block is ~21 MB); MANO's 778 verts fit one tile.
    v_tile = min(v, 1024)
    v_pad = (v + v_tile - 1) // v_tile * v_tile
    if v_pad != v:
        lbs_weights = jnp.pad(lbs_weights, ((0, v_pad - v), (0, 0)))
        v_posed_nl = jnp.pad(v_posed_nl, ((0, 0), (0, v_pad - v), (0, 0)))

    grid = (v_pad // v_tile, padded // tile)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((v_tile, j), lambda iv, ir: (iv, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, j, tile), lambda iv, ir: (0, 0, 0, 0, ir),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, j, tile), lambda iv, ir: (0, 0, 0, ir),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, v_tile, tile), lambda iv, ir: (0, 0, iv, ir),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, v_tile, tile), lambda iv, ir: (0, 0, iv, ir),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((1, 3, v_pad, padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # Block double-buffering + per-iteration stack temps overflow
            # the default scoped-vmem limit at tile=512 (31 MB measured);
            # tile=256 plus this kernel-local raise keeps headroom.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        lbs_weights.astype(jnp.float32),
        chain_r_nl.astype(jnp.float32)[None],
        skin_t_nl.astype(jnp.float32)[None],
        v_posed_nl.astype(jnp.float32)[None],
    )
    return out[0, :, :v, :rows]


def supported(rows: int, n_verts: int = 778) -> bool:
    """Gate: TPU only, and only at plane sizes (V x R elements) where the
    XLA einsum path's nine (V, R) blend planes no longer fit XLA's VMEM
    residency. Full-pipeline A/B (r3, MANO V=778): at R=3200 (2.5M-element
    planes) the kernel LOSES (776k vs 801k hypos/s — XLA already serves
    the planes from VMEM, S(1) layouts in the profile); at R=12800 (10M
    elements, 360 MB of f32 planes) it WINS (1.10M vs 1.03M, +6.5%).
    Threshold between the two measured shapes; real-SMPL inference
    (V=6890) crosses it from R~1200."""
    return jax.default_backend() == "tpu" and rows * n_verts >= 8_000_000
