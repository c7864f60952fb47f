"""SMPL body model as pure-JAX forward kinematics — the 'Humans' variant
engine.

The reference ships no body-model code: its README only links pretrained
SMPL-flow weights to be loaded into the external ProHMR repo
(/root/reference/README.md:26-42). BASELINE.json config 5 requires the human
variant to run through this framework, so this module supplies the SMPL
forward (shape/pose blendshapes, 24-joint kinematic tree, LBS) behind the
same functional interface as core/mano.py, sharing its rotation kernels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mhentropy_tpu.core.mano import _as_np, _install_chumpy_stub, mm3, mv3
from mhentropy_tpu.core.rotations import batch_rodrigues, rotmat_from_6d

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGH)

N_VERTS = 6890
N_JOINTS = 24
# SMPL kinematic tree (parent of joint i); standard SMPL topology.
PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21]
)


class SmplModel(NamedTuple):
    v_template: jax.Array  # (6890, 3)
    shapedirs: jax.Array  # (6890, 3, 10)
    posedirs: jax.Array  # (6890, 3, 207)
    j_regressor: jax.Array  # (24, 6890)
    lbs_weights: jax.Array  # (6890, 24)
    faces: jax.Array  # (F, 3) int32


def load_smpl_pkl(path: str) -> SmplModel:
    import io
    import pickle

    _install_chumpy_stub()
    with open(path, "rb") as f:
        data = pickle.load(io.BytesIO(f.read()), encoding="latin1")
    return SmplModel(
        v_template=jnp.asarray(_as_np(data["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(_as_np(data["shapedirs"])[..., :10], jnp.float32),
        posedirs=jnp.asarray(_as_np(data["posedirs"]), jnp.float32),
        j_regressor=jnp.asarray(_as_np(data["J_regressor"]), jnp.float32),
        lbs_weights=jnp.asarray(_as_np(data["weights"]), jnp.float32),
        faces=jnp.asarray(_as_np(data["f"]).astype(np.int32)),
    )


def synthetic_smpl_model(seed: int = 0, n_verts: int = 1024) -> SmplModel:
    """Structurally-valid random SMPL (smaller vertex count for tests)."""
    rng = np.random.RandomState(seed)
    # Plausible rest skeleton: pelvis at origin, limbs fanning out.
    joints = rng.randn(N_JOINTS, 3).astype(np.float32) * 0.05
    for i in range(1, N_JOINTS):
        joints[i] = joints[PARENTS[i]] + rng.randn(3) * 0.12
    owner = rng.randint(0, N_JOINTS, n_verts)
    v_template = joints[owner] + rng.randn(n_verts, 3).astype(np.float32) * 0.03
    j_reg = np.zeros((N_JOINTS, n_verts), np.float32)
    for j in range(N_JOINTS):
        near = np.argsort(np.linalg.norm(v_template - joints[j], axis=1))[:6]
        j_reg[j, near] = 1.0 / 6.0
    d = np.linalg.norm(v_template[:, None] - joints[None], axis=-1)
    w = np.exp(-d / 0.05)
    w = (w / w.sum(1, keepdims=True)).astype(np.float32)
    return SmplModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(rng.randn(n_verts, 3, 10).astype(np.float32) * 0.003),
        posedirs=jnp.asarray(
            rng.randn(n_verts, 3, 207).astype(np.float32) * 0.0005
        ),
        j_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(w),
        faces=jnp.asarray(rng.randint(0, n_verts, (2000, 3)).astype(np.int32)),
    )


def smpl_forward(
    model: SmplModel,
    rotmats: jax.Array,
    betas: jax.Array,
    transl: jax.Array | None = None,
    pallas_lbs: bool = False,
):
    """SMPL LBS from per-joint rotation MATRICES (the ProHMR convention).

    Args:
        rotmats: (B, 24, 3, 3) global-orient ++ 23 body rotations.
        betas: (B, 10).

    Returns:
        verts (B, V, 3), joints (B, 24, 3) in metres.
    """
    b = rotmats.shape[0]
    # Batch-LAST (d, v, b) mesh end to end, like core/mano.py: (V, B)
    # planes tile T(8,128) with rows on lanes; the old (B, V, 3) layout
    # paid a 42x lane-padded elementwise pass + relayout copies (r3).
    v_shaped_nl = model.v_template.T[:, :, None] + _einsum(
        "vdc,bc->dvb", model.shapedirs, betas
    )
    # Rest joints with the regressor folded into template/shapedirs (see
    # core/mano.py::_chain_nl): joints-only consumers (MPJPE eval, the
    # eval_prohmr GT path) never materialise the (3, V, B) v_shaped planes.
    joints_nl = (
        _einsum("jv,vd->dj", model.j_regressor, model.v_template)[:, :, None]
        + _einsum(
            "jds,bs->djb",
            _einsum("jv,vds->jds", model.j_regressor, model.shapedirs),
            betas,
        )
    )
    pose_map = (rotmats[:, 1:] - jnp.eye(3, dtype=rotmats.dtype)).reshape(b, 207)
    v_posed_nl = v_shaped_nl + _einsum("vdp,bp->dvb", model.posedirs, pose_map)

    # Kinematic tree: sequential composition (parents[i] < i) on (R, t)
    # affine pairs in batch-LAST layout — trailing (3, 3)/(4, 4) dims tile
    # T(4,128) with heavy lane padding (see core/mano.py, profiled r2);
    # with B on lanes the 3x3 algebra is pure elementwise VPU work.
    rots_nl = jnp.transpose(rotmats, (2, 3, 1, 0))  # (3, 3, 24, B)
    rel_t = joints_nl - jnp.concatenate(
        [jnp.zeros_like(joints_nl[:, :1]), joints_nl[:, PARENTS[1:]]], 1
    )  # (3, 24, B)

    chain_r = [rots_nl[:, :, 0]]  # each (3, 3, B)
    chain_t = [rel_t[:, 0]]  # each (3, B)
    for i in range(1, N_JOINTS):
        par_r, par_t = chain_r[PARENTS[i]], chain_t[PARENTS[i]]
        chain_r.append(mm3(par_r, rots_nl[:, :, i]))
        chain_t.append(mv3(par_r, rel_t[:, i]) + par_t)
    chain_r_nl = jnp.stack(chain_r, axis=2)  # (3, 3, 24, B)
    chain_t_nl = jnp.stack(chain_t, axis=1)  # (3, 24, B)

    skin_t_nl = chain_t_nl - mv3(chain_r_nl, joints_nl)
    # Shared blend (core/mano.py::_lbs_blend_nl — ONE implementation;
    # SmplModel duck-types the lbs_weights field it reads). The SMPL
    # path previously carried a third verbatim copy of this blend, the
    # exact silent-fork class that helper exists to prevent.
    from mhentropy_tpu.core.mano import _lbs_blend_nl

    verts_nl = _lbs_blend_nl(model, chain_r_nl, skin_t_nl, v_posed_nl,
                             pallas_lbs)
    verts = jnp.transpose(verts_nl, (2, 1, 0))
    joints_out = jnp.transpose(chain_t_nl, (2, 1, 0))  # (B, 24, 3)
    if transl is not None:
        verts = verts + transl[:, None]
        joints_out = joints_out + transl[:, None]
    return verts, joints_out


def smpl_forward_axis_angle(model: SmplModel, pose_aa: jax.Array,
                            betas: jax.Array,
                            transl: jax.Array | None = None,
                            pallas_lbs: bool = False):
    """(B, 72) axis-angle pose convenience wrapper (the standard SMPL
    ingestion format); same transl/pallas_lbs pass-through as the rotmat
    and 6D wrappers."""
    b = pose_aa.shape[0]
    rotmats = batch_rodrigues(pose_aa.reshape(b, N_JOINTS, 3))
    return smpl_forward(model, rotmats, betas, transl=transl,
                        pallas_lbs=pallas_lbs)


def smpl_forward_6d(model: SmplModel, pose_6d: jax.Array, betas: jax.Array,
                    transl: jax.Array | None = None,
                    pallas_lbs: bool = False):
    """(B, 144) 6D-rotation pose (the ProHMR flow's output space)."""
    b = pose_6d.shape[0]
    rotmats = rotmat_from_6d(pose_6d.reshape(b, N_JOINTS, 6))
    return smpl_forward(model, rotmats, betas, transl=transl,
                        pallas_lbs=pallas_lbs)
