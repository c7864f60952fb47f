"""MANO differentiable hand model as pure-JAX forward kinematics.

Capability parity with the vendored manopth LBS kernel
(/root/reference/hand/manopth/manolayer.py:13-274) and the high-level wrapper
(/root/reference/hand/ManoLayer.py:10-165): PCA pose coefficients -> axis
angles, Rodrigues rotations, shape/pose blendshapes, the 3-level kinematic
chain, linear blend skinning, fingertip augmentation, 21-joint regression and
skeleton remapping. The implementation is a fresh TPU-first design: model
constants live in a frozen pytree, every step is a batched einsum/matmul that
XLA tiles onto the MXU, and the 5-finger chain is one vectorised 4x4 matmul
per level (no Python loop over joints).

The MANO asset (MANO_RIGHT.pkl) is an external download in the reference too
(its .gitignore excludes mano/*); `load_mano_pkl` reads it when present, and
`synthetic_mano_model` builds a structurally-valid random model so every test
and benchmark runs without the asset.
"""

from __future__ import annotations

import functools
import io
import os
import pickle
import sys
import types
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.lax import Precision
import numpy as np

from mhentropy_tpu.core import skeletons
from mhentropy_tpu.core.rotations import batch_rodrigues

# Parity-critical matmuls avoid the MXU's raw bf16 path (~3e-3 relative
# error — too coarse for mm-level LBS). HIGH (3-pass bf16 on TPU, ~5e-7
# relative) meets the 0.02 mm parity budget at half the MXU passes of
# HIGHEST; measured equal on the CPU test backend.
_einsum = functools.partial(jnp.einsum, precision=Precision.HIGH)

N_VERTS = 778
N_JOINTS = 16  # wrist + 15 articulated
N_POSE = 45  # 15 joints x 3 axis-angle dims

# Finger chains: level-k joint indices in MANO ordering
# (manopth/manolayer.py:197-199).
LEV1 = np.array([1, 4, 7, 10, 13])
LEV2 = np.array([2, 5, 8, 11, 14])
LEV3 = np.array([3, 6, 9, 12, 15])
# Interleave (root, lev1[f], lev2[f], lev3[f]) back to MANO joint order
# (manopth/manolayer.py:228).
CHAIN_REORDER = np.array([0, 1, 6, 11, 2, 7, 12, 3, 8, 13, 4, 9, 14, 5, 10, 15])


def mm3(a, b):
    """(3, 3, ...) @ (3, 3, ...) over the LEADING matrix dims.

    Batch-last 3x3 algebra: kinematic-chain tensors keep the batch axis on
    lanes (trailing (3, 3) dims tile T(4,128) with 42x padding — profiled
    r2), so matrix products are explicit elementwise VPU work. Shared by
    the MANO and SMPL chains.
    """
    return jnp.stack(
        [
            jnp.stack(
                [
                    a[i, 0] * b[0, j] + a[i, 1] * b[1, j] + a[i, 2] * b[2, j]
                    for j in range(3)
                ],
                0,
            )
            for i in range(3)
        ],
        0,
    )


def mv3(a, v):
    """(3, 3, ...) @ (3, ...) over the leading matrix dims (see mm3)."""
    return jnp.stack(
        [a[i, 0] * v[0] + a[i, 1] * v[1] + a[i, 2] * v[2] for i in range(3)],
        0,
    )


class ManoModel(NamedTuple):
    """Frozen MANO constants (all float32 device arrays)."""

    v_template: jax.Array  # (778, 3)
    shapedirs: jax.Array  # (778, 3, 10)
    posedirs: jax.Array  # (778, 3, 135)
    j_regressor: jax.Array  # (16, 778)
    lbs_weights: jax.Array  # (778, 16)
    hands_mean: jax.Array  # (45,)
    hands_components: jax.Array  # (45, 45) PCA basis rows
    faces: jax.Array  # (1538, 3) int32
    tips: jax.Array  # (5,) fingertip vertex ids (side dependent)


class ManoConfig(NamedTuple):
    """Static configuration (hashable; safe as a jit static arg)."""

    use_pca: bool = True
    ncomps: int = 45
    flat_hand_mean: bool = False
    center_idx: int | None = 9
    side: str = "right"


def _install_chumpy_stub() -> None:
    """Register a minimal 'chumpy' so MANO pkls unpickle without the package.

    Chumpy Ch objects pickle as plain attribute dicts holding a numpy array
    under 'x'; only `.r` is read afterwards.
    """
    if "chumpy" in sys.modules:
        return

    class _Ch:
        def __init__(self, *args, **kwargs):
            if args:
                self.x = np.asarray(args[0])

        def __setstate__(self, state):
            self.__dict__.update(state)

        @property
        def r(self):
            return np.asarray(self.x)

    mod = types.ModuleType("chumpy")
    mod.Ch = _Ch
    sys.modules["chumpy"] = mod
    for sub in ("ch", "reordering", "ch_ops", "utils"):
        m = types.ModuleType(f"chumpy.{sub}")
        m.Ch = _Ch
        sys.modules[f"chumpy.{sub}"] = m
        setattr(mod, sub, m)


def _as_np(x) -> np.ndarray:
    if hasattr(x, "r"):
        return np.asarray(x.r)
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_mano_pkl(path: str, side: str = "right") -> ManoModel:
    """Load MANO_{RIGHT,LEFT}.pkl into a ManoModel pytree.

    Reads the same fields the reference consumes (manolayer.py:65-108).
    """
    _install_chumpy_stub()
    with open(path, "rb") as f:
        data = pickle.load(io.BytesIO(f.read()), encoding="latin1")
    tips = skeletons.MANO_TIPS_RIGHT if side == "right" else skeletons.MANO_TIPS_LEFT
    return ManoModel(
        v_template=jnp.asarray(_as_np(data["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(_as_np(data["shapedirs"])[..., :10], jnp.float32),
        posedirs=jnp.asarray(_as_np(data["posedirs"]), jnp.float32),
        j_regressor=jnp.asarray(_as_np(data["J_regressor"]), jnp.float32),
        lbs_weights=jnp.asarray(_as_np(data["weights"]), jnp.float32),
        hands_mean=jnp.asarray(_as_np(data["hands_mean"]).ravel(), jnp.float32),
        hands_components=jnp.asarray(_as_np(data["hands_components"]), jnp.float32),
        faces=jnp.asarray(_as_np(data["f"]).astype(np.int32)),
        tips=jnp.asarray(tips),
    )


def find_mano_assets(mano_dir: str = "./mano/", side: str = "right") -> str | None:
    name = f"MANO_{side.upper()}.pkl"
    for cand in (
        os.path.join(mano_dir, name),
        os.path.join(mano_dir, "models", name),
    ):
        if os.path.exists(cand):
            return cand
    return None


def synthetic_mano_model(seed: int = 0) -> ManoModel:
    """A structurally-valid random MANO for asset-free tests/benchmarks.

    The rest-pose joint tree has physically-plausible topology: joints sit at
    increasing radii per chain level so the kinematic chain and LBS are
    exercised with realistic magnitudes (~0.1 m hand scale).
    """
    rng = np.random.RandomState(seed)
    # Rest joints: wrist at origin, fingers fanning in +x with per-level reach.
    joints = np.zeros((N_JOINTS, 3), np.float32)
    for f in range(5):
        angle = (f - 2) * 0.3
        direction = np.array([np.cos(angle), np.sin(angle), 0.0])
        for lev, dist in zip((LEV1[f], LEV2[f], LEV3[f]), (0.05, 0.08, 0.10)):
            joints[lev] = direction * dist + rng.randn(3) * 0.002
    # Vertices scattered around joints.
    owner = rng.randint(0, N_JOINTS, N_VERTS)
    v_template = joints[owner] + rng.randn(N_VERTS, 3).astype(np.float32) * 0.01
    # J-regressor: rows select the vertices nearest each joint (row-stochastic).
    j_reg = np.zeros((N_JOINTS, N_VERTS), np.float32)
    for j in range(N_JOINTS):
        dists = np.linalg.norm(v_template - joints[j], axis=1)
        near = np.argsort(dists)[:8]
        j_reg[j, near] = 1.0 / 8.0
    # LBS weights: soft assignment by inverse distance to the 2 nearest joints.
    d = np.linalg.norm(v_template[:, None] - joints[None], axis=-1)
    w = np.exp(-d / 0.02)
    w = (w / w.sum(1, keepdims=True)).astype(np.float32)
    comps = np.linalg.qr(rng.randn(N_POSE, N_POSE))[0].astype(np.float32)
    faces = rng.randint(0, N_VERTS, (1538, 3)).astype(np.int32)
    return ManoModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(rng.randn(N_VERTS, 3, 10).astype(np.float32) * 0.001),
        posedirs=jnp.asarray(rng.randn(N_VERTS, 3, 135).astype(np.float32) * 0.0005),
        j_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(w),
        hands_mean=jnp.asarray(rng.randn(45).astype(np.float32) * 0.1),
        hands_components=jnp.asarray(comps),
        faces=jnp.asarray(faces),
        tips=jnp.asarray(skeletons.MANO_TIPS_RIGHT),
    )


def _chain_nl(
    model: ManoModel,
    theta: jax.Array,
    beta: jax.Array,
    config: ManoConfig,
):
    """Shared MANO prefix: pose -> rotations -> kinematic chain, batch-last.

    Returns (chain_r_nl (3, 3, 16, B), chain_t_nl (3, 16, B),
    skin_t_nl (3, 16, B), v_shaped_nl (3, 778, B), pose_map (B, 135)).
    Callers that never read v_shaped_nl (the folded-keypoint decode path)
    let XLA dead-code the blendshape planes except the 16 rest joints.
    """
    b = theta.shape[0]
    root_aa = theta[:, :3]
    coeffs = theta[:, 3 : 3 + config.ncomps]
    if config.use_pca:
        hand_pose = jnp.dot(coeffs, model.hands_components[: config.ncomps], precision=Precision.HIGH)
    else:
        hand_pose = coeffs
    if not config.flat_hand_mean:
        hand_pose = hand_pose + model.hands_mean

    # Rotations for all 16 joints in one Rodrigues batch.
    full_aa = jnp.concatenate([root_aa, hand_pose], axis=1).reshape(b, 16, 3)
    rots = batch_rodrigues(full_aa)  # (B, 16, 3, 3)
    pose_map = (rots[:, 1:] - jnp.eye(3, dtype=rots.dtype)).reshape(b, N_POSE * 3)

    # Blendshapes (MXU einsums) — batch-LAST (d, v, b): every (778, B)
    # plane tiles T(8,128) with rows on lanes; the old (B, 778, 3) layout
    # put the 3-dim minor (42x lane padding) and cost a 30 MB
    # T(8,128)->T(4,128) relayout copy per step at R=3200 (xplane r3).
    v_shaped_nl = model.v_template.T[:, :, None] + _einsum(
        "vdc,bc->dvb", model.shapedirs, beta
    )
    # Rest joints with the regressor folded into template/shapedirs: the
    # model-only contractions hoist out of scanned loops and the (3, 778, B)
    # v_shaped planes are only materialised when a caller reads the mesh.
    joints_nl = (
        _einsum("jv,vd->dj", model.j_regressor, model.v_template)[:, :, None]
        + _einsum(
            "jds,bs->djb",
            _einsum("jv,vds->jds", model.j_regressor, model.shapedirs),
            beta,
        )
    )  # (3, 16, B)

    # Kinematic chain: root + 3 levels, each level one batched affine
    # compose over the 5 fingers. Transforms are kept as (R, t) pairs —
    # (Ra, ta) o (Rb, tb) = (Ra Rb, Ra tb + ta) — never materialising 4x4
    # homogeneous matrices, and laid out BATCH-LAST: trailing (3, 3) dims
    # tile as T(4,128) (42x lane padding, ~0.9 ms/step of copies at R=3200,
    # profiled r2); with the row axis on lanes the 3x3 algebra is pure
    # elementwise VPU work.
    rots_nl = jnp.transpose(rots, (2, 3, 1, 0))  # (3, 3, 16, B)

    def _compose(r_par, t_par, level_rots, level_j, parent_j):
        return mm3(r_par, level_rots), mv3(r_par, level_j - parent_j) + t_par

    root_rot_nl = rots_nl[:, :, 0]  # (3, 3, B)
    root_j_nl = joints_nl[:, 0]  # (3, B)
    r1, t1 = _compose(
        root_rot_nl[:, :, None],
        root_j_nl[:, None],
        rots_nl[:, :, LEV1],
        joints_nl[:, LEV1],
        joints_nl[:, 0:1],
    )
    r2, t2 = _compose(
        r1, t1, rots_nl[:, :, LEV2], joints_nl[:, LEV2], joints_nl[:, LEV1]
    )
    r3, t3 = _compose(
        r2, t2, rots_nl[:, :, LEV3], joints_nl[:, LEV3], joints_nl[:, LEV2]
    )
    chain_r_nl = jnp.concatenate(
        [root_rot_nl[:, :, None], r1, r2, r3], axis=2
    )[:, :, CHAIN_REORDER]  # (3, 3, 16, B)
    chain_t_nl = jnp.concatenate([root_j_nl[:, None], t1, t2, t3], axis=1)[
        :, CHAIN_REORDER
    ]  # (3, 16, B)

    # LBS rest-pose removal: A_j = G_j - [0 | R_j @ j_j].
    skin_t_nl = chain_t_nl - mv3(chain_r_nl, joints_nl)
    return chain_r_nl, chain_t_nl, skin_t_nl, v_shaped_nl, pose_map


def _lbs_blend_nl(model: ManoModel, chain_r_nl, skin_t_nl, v_posed_nl,
                  pallas_lbs: bool):
    """Per-vertex LBS blend, batch-last (3, 778, B) — ONE implementation
    for both mano_forward and mano_decode (they silently forked before).
    Blending R and t separately costs 12/16 the HBM traffic of the
    homogeneous (4, 4) blend; the Pallas kernel variant streams the nine
    (V, R) planes through VMEM with no (3, 3, 778, B) intermediate
    (core/lbs_pallas.py, inference only — no custom VJP needed)."""
    if pallas_lbs:
        from mhentropy_tpu.core import lbs_pallas

        return lbs_pallas.lbs_blend(
            model.lbs_weights, chain_r_nl, skin_t_nl, v_posed_nl
        )
    per_vert_r_nl = _einsum("vj,rcjb->rcvb", model.lbs_weights, chain_r_nl)
    per_vert_t_nl = _einsum("vj,rjb->rvb", model.lbs_weights, skin_t_nl)
    return (
        _einsum("rcvb,cvb->rvb", per_vert_r_nl, v_posed_nl) + per_vert_t_nl
    )  # (3, 778, B)


@functools.partial(jax.jit, static_argnames=("config", "pallas_lbs"))
def _mano_forward_nl(
    model: ManoModel,
    theta: jax.Array,
    beta: jax.Array,
    config: ManoConfig = ManoConfig(),
    pallas_lbs: bool = False,
):
    """Batch-last MANO forward core: returns (verts_nl (3, 778, B) mm,
    joints21 (B, 21, 3) mm). Keeping the mesh batch-last end to end lets
    consumers (the J-regressor in mano_decode, projections) contract it
    with rows on lanes and lets XLA drop the (B, 778, 3) relayout whenever
    the caller never reads the mesh (the bench/eval xyz+uv path)."""
    chain_r_nl, chain_t_nl, skin_t_nl, v_shaped_nl, pose_map = _chain_nl(
        model, theta, beta, config
    )
    v_posed_nl = v_shaped_nl + _einsum("vdp,bp->dvb", model.posedirs, pose_map)
    verts_nl = _lbs_blend_nl(model, chain_r_nl, skin_t_nl, v_posed_nl,
                             pallas_lbs)

    chain_joints = jnp.transpose(chain_t_nl, (2, 1, 0))  # (B, 16, 3), tiny
    tips = jnp.transpose(verts_nl[:, model.tips], (2, 1, 0))  # (B, 5, 3)
    joints21 = jnp.concatenate([chain_joints, tips], axis=1)
    joints21 = joints21[:, skeletons.MANOCHAIN2VIZ]

    if config.center_idx is not None:
        center = joints21[:, config.center_idx : config.center_idx + 1]
        joints21 = joints21 - center
        verts_nl = verts_nl - jnp.transpose(center, (2, 1, 0))
    return verts_nl * 1000.0, joints21 * 1000.0


def mano_forward(
    model: ManoModel,
    theta: jax.Array,
    beta: jax.Array,
    config: ManoConfig = ManoConfig(),
):
    """MANO forward: (pose coeffs, shape) -> (verts, chain joints) in mm.

    Args:
        model: ManoModel constants.
        theta: (B, 3 + ncomps) = global axis-angle rot ++ PCA coefficients
            (or raw axis-angles when not use_pca).
        beta: (B, 10) shape coefficients.
        config: static ManoConfig.

    Returns:
        verts: (B, 778, 3) in millimetres.
        joints21: (B, 21, 3) kinematic-chain joints + 5 fingertip vertices,
            in the manopth visualisation order (= FreiHAND order), mm.
    """
    verts_nl, joints21 = _mano_forward_nl(model, theta, beta, config)
    return jnp.transpose(verts_nl, (2, 1, 0)), joints21


def _kp_regressor_matrix(model: ManoModel) -> jax.Array:
    """(26, 778) keypoint-from-vertex regressor: rows 0-20 the FreiHAND
    21-kp assembly (16 J-regressor rows in kp_src order, the 5 fingertip
    slots replaced by one-hot vertex selectors — ManoLayer.py:109-148) and
    rows 21-25 one-hot selectors of the kinematic-chain tip vertices."""
    kp_src, tip_ids, tip_verts = skeletons.freihand_gather_indices()
    m21 = model.j_regressor[kp_src]
    m21 = m21.at[tip_ids].set(
        jax.nn.one_hot(tip_verts, N_VERTS, dtype=m21.dtype)
    )
    m5 = jax.nn.one_hot(model.tips, N_VERTS, dtype=m21.dtype)
    return jnp.concatenate([m21, m5], axis=0)


def _folded_kp26_nl(model, chain_r_nl, skin_t_nl, beta, pose_map):
    """All 26 decode keypoints WITHOUT materialising the 778-vertex mesh.

    Keypoints are linear in the skinned vertices, and LBS is linear in the
    rest-pose vertices, so the regressor folds through:

        kp[k] = sum_j (M diag(w_j)) (v_posed R_j^T + 1 t_j^T)
              = sum_j (C_T[j,k] + C_S[j,k] @ beta + C_P[j,k] @ f) R_j^T
                + (M W)[k, j] t_j

    with C_* = (M diag(w_j)) @ {template, shapedirs, posedirs} contracted
    over all 778 vertices ONCE per model (loop-invariant: XLA hoists the
    fold out of scanned eval loops). This replaces the ~320 us/step of f32
    (778, R, 3) HBM plane traffic of the explicit blend at R=3200 (xplane
    r3) with a (1248, 146) GEMM per sample batch — exact up to float
    reassociation. The mesh path below survives for callers that read it.

    Returns (kp26_nl (3, 26, B) in metres, uncentered; rowsum (26,) —
    sum of regressor rows, the centering weight for non-row-stochastic
    regressors).
    """
    m = _kp_regressor_matrix(model)  # (26, 778)
    mw = m[:, :, None] * model.lbs_weights[None]  # (26, 778, 16)
    c_t = _einsum("kvj,vc->jkc", mw, model.v_template)  # (16, 26, 3)
    c_s = _einsum("kvj,vcs->jkcs", mw, model.shapedirs)  # (16, 26, 3, 10)
    c_p = _einsum("kvj,vcp->jkcp", mw, model.posedirs)  # (16, 26, 3, 135)
    w1 = jnp.sum(mw, axis=1)  # (26, 16)

    q = (
        c_t[..., None]
        + _einsum("jkcs,bs->jkcb", c_s, beta)
        + _einsum("jkcp,bp->jkcb", c_p, pose_map)
    )  # (16, 26, 3, B)

    kp = _einsum("kj,rjb->rkb", w1, skin_t_nl)  # (3, 26, B)
    # The (j, c) contraction stays an explicit 48-term accumulate over
    # (3, 26, B) planes: batch-last elementwise VPU work, like mm3 — a
    # batched dot would make XLA relayout to 3200 tiny (3, 48) matmuls.
    for j in range(N_JOINTS):
        for c in range(3):
            kp = kp + chain_r_nl[:, c, j][:, None, :] * q[j, :, c][None]
    return kp, jnp.sum(m, axis=1)


@functools.partial(jax.jit, static_argnames=("skeidx", "pallas_lbs", "config"))
def mano_decode(model: ManoModel, theta: jax.Array, beta: jax.Array,
                skeidx: str = "RHD", pallas_lbs: bool = False,
                config: ManoConfig = ManoConfig()):
    """High-level decode used by MHEnt (parity: hand/ManoLayer.py:45-60).

    Returns a dict with the mesh, the J-regressor 21 keypoints ('joints') and
    the kinematic-chain 21 keypoints ('mano_joints'), remapped to the
    requested skeleton ordering.

    Both keypoint sets come from the folded regressor (`_folded_kp26_nl`)
    and never touch the 778-vertex planes; the mesh is produced by the
    explicit LBS blend and dead-codes away whenever the caller does not
    read it (the bench/eval xyz+uv path) — numerically both routes agree
    to float-reassociation (tested, test_mano.py).
    """
    chain_r_nl, chain_t_nl, skin_t_nl, v_shaped_nl, pose_map = _chain_nl(
        model, theta, beta, config
    )
    kp26_nl, rowsum = _folded_kp26_nl(
        model, chain_r_nl, skin_t_nl, beta, pose_map
    )

    # Kinematic-chain 21 keypoints: chain joints ++ folded tip vertices.
    chain21_nl = jnp.concatenate([chain_t_nl, kp26_nl[:, 21:]], axis=1)[
        :, skeletons.MANOCHAIN2VIZ
    ]  # (3, 21, B)
    if config.center_idx is not None:
        center_nl = chain21_nl[:, config.center_idx]  # (3, B)
    else:
        center_nl = jnp.zeros_like(chain21_nl[:, 0])
    chain21_nl = chain21_nl - center_nl[:, None]
    # Centering a regressed point shifts it by rowsum * center (exactly
    # -center for row-stochastic regressor rows / one-hot tip selectors).
    joints_nl = kp26_nl[:, :21] - rowsum[:21][None, :, None] * center_nl[:, None]
    joints = jnp.transpose(joints_nl, (2, 1, 0)) * 1000.0  # (B, 21, 3) mm
    chain21 = jnp.transpose(chain21_nl, (2, 1, 0)) * 1000.0

    # Mesh: the explicit per-vertex blend (XLA einsums or the Pallas
    # streaming kernel), computed only if the caller reads it.
    v_posed_nl = v_shaped_nl + _einsum("vdp,bp->dvb", model.posedirs, pose_map)
    verts_nl = _lbs_blend_nl(model, chain_r_nl, skin_t_nl, v_posed_nl,
                             pallas_lbs)
    verts_nl = (verts_nl - center_nl[:, None]) * 1000.0
    verts = jnp.transpose(verts_nl, (2, 1, 0))

    if skeidx == "RHD":
        joints = joints[:, skeletons.FREIHAND2RHD]
        mano_joints = chain21[:, skeletons.FREIHAND2RHD]
    elif skeidx == "BigHand":
        joints = joints[:, skeletons.FREIHAND2RHD][:, skeletons.RHD2BIGHAND]
        mano_joints = chain21[:, skeletons.FREIHAND2RHD][:, skeletons.RHD2BIGHAND]
    elif skeidx == "FreiHand":
        mano_joints = chain21
    else:
        # Loud, not a silent FreiHand fallthrough: a typo'd or lowercase
        # key ('rhd') would otherwise skip the remap and every 21-joint
        # metric downstream would score a permuted skeleton. Free check —
        # skeidx is a static jit argument.
        raise ValueError(
            f"unknown skeidx {skeidx!r}; expected RHD | BigHand | FreiHand")
    return {
        "beta": beta,
        "theta": theta,
        "mesh": verts,
        "joints": joints,
        "mano_joints": mano_joints,
    }
