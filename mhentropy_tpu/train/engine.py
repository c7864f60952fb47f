"""Training engine: TrainState, pjit-sharded train/eval steps, the experiment
driver, checkpointing.

Capability parity with the reference trainer
(/root/reference/hand/CrossModalHand.py:18-610): module assembly from the
config schema, Adam + MultiStep LR (gamma 0.1) with grad-clip 1.0
(CrossModalHand.py:201-203,462-467), the R2P epoch loop with AverageMeters /
log lines / TensorBoard scalars (:402-566), eval with N test hypotheses
(:357-361), checkpoint save/load with module subsetting (:573-602).

TPU-first: one jitted train step over a (data, hypo) mesh — batch sharded
over 'data', parameters replicated, gradient all-reduce inserted by the
partitioner; eval shards the N-hypothesis axis over 'hypo'. Checkpoints are a
single orbax pytree {params, batch_stats, opt_state, step} (the reference
saves no optimizer state; we do, and the torch->jax converter fills params
only).
"""

from __future__ import annotations

import collections
import functools
import os
import time
import weakref
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mhentropy_tpu.core import mano as mano_lib
from mhentropy_tpu.core.mano import ManoConfig, ManoModel
from mhentropy_tpu.data import common as data_common, synthetic
from mhentropy_tpu.flows.realnvp import RealNVPConfig
from mhentropy_tpu.models import mhent, rle
from mhentropy_tpu.models.encoder import EncoderConfig
from mhentropy_tpu.models.mhent import MHEntConfig
from mhentropy_tpu.models.rle import RLEConfig
from mhentropy_tpu.parallel import mesh as mesh_lib
from mhentropy_tpu.train import metrics as metrics_lib
from mhentropy_tpu.utils.logging import AverageMeter, ScalarWriter, get_logger


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _fused_bn_mode(cfg):
    """cfg.tpu.fused_train_bn -> False | True | mode string. bool() would
    collapse the documented "full" A/B mode to True (= "stats") silently."""
    if "tpu" not in cfg:
        return False
    v = cfg.tpu.get("fused_train_bn", False)
    return v if isinstance(v, str) else bool(v)


def build_model_config(cfg) -> MHEntConfig:
    """YAML schema -> MHEntConfig (mirrors CrossModalHand.py:54-85)."""
    net = cfg.network
    image_size = max(cfg.dataset.image_size)
    n_latent = net.nums_latent if net.nums_latent else net.num_latent
    enc = EncoderConfig(
        backbone=net.backbone,
        n_latent=(n_latent, n_latent) if isinstance(n_latent, int) else tuple(n_latent),
        feat_dim=net.feat_dim,
        sigma_act=net.acts,
        deterministic=net.deterministic,
        dtype=cfg.tpu.compute_dtype if "tpu" in cfg else "bfloat16",
        fused_train_bn=_fused_bn_mode(cfg),
    )
    flow = RealNVPConfig(
        dim=45,
        cond_dim=net.num_latent,
        h_dim=net.h_dims[0],
        num_steps=net.num_steps,
        joint_n=cfg.dataset.jointN,
    )
    tr = cfg.training
    return MHEntConfig(
        encoder=enc,
        flow=flow,
        mano=ManoConfig(use_pca=True, ncomps=45, flat_hand_mean=False),
        regressor=net.regressor,
        ds=cfg.dataset.dataset_name,
        image_size=image_size,
        feat_dim=net.num_latent,
        b_2d=net.b_2d,
        b_3d=net.get("b_3d", 0.03),
        th45_ref_alpha=float(net.w_reg_th),
        th3_ref_alpha=float(net.get("th3_ref_alpha", 5.0)),
        bt_alpha=float(net.get("bt_alpha", 50.0)),
        temperature=float(net.get("T", 1.0)),
        entropy=bool(net.entropy),
        kld_w=float(net.get("kld_w", 1.0)),
        kld_w_annealing=tuple(net.get("kld_w_annealing", (1.0, 24000))),
        n_train_hypotheses=int(tr.get("n_train_hypotheses", 10)),
        use_chamfer_loss=bool(net.get("use_chamfer_loss", False)),
        w_chamfer=float(net.get("w_chamfer", 10.0)),
        use_mask_loss=bool(net.get("use_mask_loss", False)),
        b_mask=float(net.get("b_mask", 0.02)),
        # Reference-hardcoded glow shape (network.py:343-344) unless the
        # config overrides it (smoke/CI runs trace a smaller posterior).
        glow_hidden=int(net.get("glow_hidden", 512)),
        glow_layers=int(net.get("glow_layers", 4)),
        glow_blocks=int(net.get("glow_blocks", 2)),
    )


def build_rle_config(cfg) -> RLEConfig:
    """YAML schema -> RLEConfig for the non-integrated BasicEnc + p_nf mode
    (CrossModalHand.py:89-105, 262-346)."""
    net = cfg.network
    n_latent = net.nums_latent if net.nums_latent else net.num_latent
    tsfm_on = net.tsfm_on
    cond = tsfm_on if isinstance(tsfm_on, int) else 0
    flow = RealNVPConfig(
        dim=net.p_nf_dim,
        cond_dim=cond,
        h_dim=net.h_dims[0],
        num_steps=net.num_steps,
        joint_n=cfg.dataset.jointN,
        kemb=bool(net.kemb),
        tsfm_on=tsfm_on if isinstance(tsfm_on, str) else None,
        cond_mapping_dims=tuple(
            tuple(x) for x in (net.cond_mapping_dims or ())
        ),
    )
    enc = EncoderConfig(
        backbone=net.backbone,
        n_latent=(n_latent, n_latent) if isinstance(n_latent, int) else tuple(n_latent),
        feat_dim=net.feat_dim,
        sigma_act=net.acts,
        deterministic=net.deterministic,
        dtype=cfg.tpu.compute_dtype if "tpu" in cfg else "bfloat16",
        fused_train_bn=_fused_bn_mode(cfg),
    )
    return RLEConfig(
        encoder=enc,
        flow=flow,
        pe=cfg.dataset.pe,
        nf_res=net.nf_res,
        image_size=max(cfg.dataset.image_size),
    )



def _mesh_jit(fn, mesh, in_shardings, out_shardings, donate=()):
    """jit with explicit shardings on real meshes; plain jit on one device.

    On the single-chip axon backend explicit NamedShardings force a
    reshard/relay round-trip per call (~8 s/step vs ~33 ms measured); the
    shardings only matter when mesh.size > 1 anyway.
    """
    if mesh.size == 1:
        return jax.jit(fn, donate_argnums=donate)
    return jax.jit(
        fn, in_shardings=in_shardings, out_shardings=out_shardings,
        donate_argnums=donate,
    )


# Process-global LRU of step programs and optimizers, shared across
# Experiment instances. Re-tracing one of the big jitted step programs costs
# ~20-60 s on a 1-core host; sweep drivers, serving warmup, and the test
# process all build many identically-shaped Experiments, so cache the built
# callables across instances. Safe by construction as long as the key covers
# every closure input of the builder (model constants, model config, mesh
# layout, optimizer hyperparameters, sharding flags) — the values themselves
# are pure: optax transforms and jitted callables hold no per-Experiment
# state (TrainState is always an argument, never captured).
_SHARED_PROGRAMS: collections.OrderedDict = collections.OrderedDict()
_SHARED_PROGRAMS_MAX = 16


def _shared_program(key, build):
    if key in _SHARED_PROGRAMS:
        _SHARED_PROGRAMS.move_to_end(key)
        return _SHARED_PROGRAMS[key]
    val = build()
    _SHARED_PROGRAMS[key] = val
    while len(_SHARED_PROGRAMS) > _SHARED_PROGRAMS_MAX:
        _SHARED_PROGRAMS.popitem(last=False)
    return val


def _mesh_fingerprint(mesh) -> tuple:
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
            tuple(mesh.devices.shape))


def _prep_image(image, target):
    """Device-side image normalisation for uint8-transport batches.

    Loaders with image_u8=True ship the crop as uint8 (4x less H2D — a
    B=64 f32 image batch costs ~50 ms through the relay vs ~8 ms of eval
    compute, docs/PERF.md) plus per-sample `_img_scale`/`_img_bias`
    affines, and the normalisation fuses into the first conv here. f32
    batches (synthetic, full-parity loaders) pass through untouched; the
    dtype test is a trace-time constant, so one jitted step serves either
    transport for its own dtype."""
    if image.dtype != jnp.uint8:
        return image
    img = image.astype(jnp.float32)
    pn = target.get("_pixel_noise")
    if pn is not None:
        # Train-mode per-channel multiplicative pixel noise, moved off the
        # host so augmented batches ship u8 too (ho3d_dataloader.py:191-198
        # semantics: noise on the 0..255 range, clipped, BEFORE the
        # normalisation affine below). Pointwise, so it commutes exactly
        # with the loader's nearest-gather warp.
        img = jnp.clip(img * pn[:, None, None, :], 0.0, 255.0)
    scale = target.get("_img_scale")
    if scale is None:
        return img / 255.0
    bias = target["_img_bias"]
    return img * scale[:, None, None, None] + bias[:, None, None, None]


def _prep_batch(image, target):
    """Trace-time batch preparation at every step entry: uint8 image
    normalisation (`_prep_image`) plus device-side targets the loaders
    chose not to compute on the host.

    st: loaders built with device_st=True omit the per-item scipy
    Procrustes fit (~0.8 ms/item of the host budget) and the batched
    `core.camera.compute_st` — the same restricted fit, parity-tested
    against the reference's compute_st (rhddataloader.py:237-269) —
    reconstructs it here from the final pose3d/crop_uv for ~free on
    device."""
    image = _prep_image(image, target)
    if "st" not in target and "pose3d" in target and "crop_uv" in target:
        from mhentropy_tpu.core import camera

        target = dict(target)
        uv = target["crop_uv"]
        k = uv.shape[-1] // 2
        target["st"] = camera.compute_st(
            target["pose3d"].reshape(-1, k, 3), uv.reshape(-1, k, 2)
        )
    return image, target


def make_rle_train_step(model_cfg: RLEConfig, optimizer, mesh):
    def step_fn(state: TrainState, image, target, key):
        image, target = _prep_batch(image, target)
        def loss_fn(params):
            out, new_stats = rle.loss_and_predict(
                params, state.batch_stats, model_cfg, image, target, key,
                train=True,
            )
            lp = out["log_p"]
            if "valid" in target:  # padded tail batch: mask padding out
                v = target["valid"]
                loss = -(lp * v).sum() / (v.sum() + 1e-16)
            else:
                loss = -lp.mean()
            return loss, (out, new_stats)

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        aux = {"loss": loss, "sigma_i": out["sigma_i"]}
        return new_state, aux

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    return _mesh_jit(step_fn, mesh, (repl, data, data, repl), (repl, repl),
                     donate=(0,))


def make_rle_eval_step(model_cfg: RLEConfig, mesh):
    def eval_fn(params, batch_stats, image, target, key):
        image, target = _prep_batch(image, target)
        out, _ = rle.loss_and_predict(
            params, batch_stats, model_cfg, image, target, key, train=False
        )
        output = {"log_p": out["log_p"]}
        if "xyz" in out:
            output["xyz"] = out["xyz"].reshape(*out["xyz"].shape[:2], -1)
        if "uv" in out:
            output["uv"] = out["uv"].reshape(*out["uv"].shape[:2], -1)
        total, losses, mets = metrics_lib.mhent_metrics(
            output, target, image_size=model_cfg.image_size
        )
        mets = {k: v.mean() for k, v in mets.items()}
        mets["loss_total"] = total
        mets["sigma_i"] = out["sigma_i"]
        return mets

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    return _mesh_jit(eval_fn, mesh, (repl, repl, data, data, repl), repl)


def _num_samples(data) -> int:
    return data.images.shape[0] if hasattr(data, "images") else len(data)


def _mano_fingerprint(mano_dir: str):
    """Content fingerprint of the resolved MANO asset: (abspath,
    mtime_ns, size), or None for the synthetic stand-in. A bare
    (possibly relative) path is NOT enough to key caches on — a test or
    tool that swaps the pkl at the same path, or chdirs to another tree
    with its own ./mano, must not be served the previous model (nor a
    shared step program compiled around its constants)."""
    path = mano_lib.find_mano_assets(mano_dir)
    if not path:
        return None
    path = os.path.abspath(path)
    st = os.stat(path)
    return (path, st.st_mtime_ns, st.st_size)


@functools.lru_cache(maxsize=4)
def _load_mano_cached(fp) -> ManoModel:
    if fp:
        return mano_lib.load_mano_pkl(fp[0])
    return mano_lib.synthetic_mano_model(seed=0)


def load_mano_model(mano_dir: str = "./mano/") -> ManoModel:
    # The asset probe runs every call (assets can appear mid-process, e.g.
    # test fixtures); the load itself is cached so every Experiment on the
    # same assets shares one constant pytree — which also makes the shared
    # step-program cache below see one stable model per asset fingerprint.
    return _load_mano_cached(_mano_fingerprint(mano_dir))


def make_optimizer(lr: float, milestones, steps_per_epoch: int, gamma: float = 0.1):
    """Adam + MultiStepLR(gamma=0.1) + global-norm clip 1.0
    (CrossModalHand.py:201-203, 462-467)."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    schedule = optax.piecewise_constant_schedule(lr, boundaries)
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(schedule),
    )


def init_state(key, model_cfg: MHEntConfig, optimizer) -> TrainState:
    params, batch_stats = mhent.init(key, model_cfg)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model: ManoModel, model_cfg: MHEntConfig, optimizer,
                    mesh, fsdp: bool = False, tp: bool = False,
                    pipe: bool = False, n_micro: int = 2):
    """One pjit-compiled optimisation step; batch sharded over 'data'.

    fsdp=True additionally shards the TrainState itself (params, optimizer
    moments) over 'data' per `mesh_lib.fsdp_sharding` — ZeRO-3 layout, with
    XLA inserting the param all-gathers and gradient reduce-scatters. Same
    math as the replicated step (tested); per-device memory for state
    drops ~linearly with the data-axis size.

    tp=True shards the model itself over the mesh's 'model' axis
    (Megatron-style column/row-parallel pairs, `mesh_lib.tp_sharding`);
    composes with fsdp (TP-sharded leaves pick up a second 'data' axis).

    pipe=True routes the training flow draw through the GPipe schedule
    over the mesh's 'pipe' axis (parallel/pipeline.sample_pipelined,
    n_micro microbatches) — composes with tp/fsdp, so all four mesh axes
    can be live in one step. Requires n_train_hypotheses*batch rows per
    microbatch to divide the 'data' axis."""
    pipeline = None
    if pipe and mesh.shape[mesh_lib.PIPE_AXIS] > 1:
        pipeline = (mesh, n_micro)

    def step_fn(state: TrainState, image, target, key):
        image, target = _prep_batch(image, target)

        def loss_fn(params):
            out, new_stats = mhent.reverse_kld(
                model, params, state.batch_stats, model_cfg, target, image,
                key, train=True, pipeline=pipeline,
            )
            lp = out["log_p"]  # criteria.py:55,173
            if "valid" in target:  # padded tail batch: mask padding out
                v = target["valid"]
                loss = -(lp * v).sum() / (v.sum() + 1e-16)
            else:
                loss = -lp.mean()
            return loss, (out, new_stats)

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        aux = {
            "loss": loss,
            "th_norm": out["th_norm"].mean(),
            "bt_norm": out["bt_norm"].mean(),
            "h_q": out.get("h_q_z_giv_i", jnp.zeros(1)).mean(),
            "q_log_p": out["q_log_p_z_giv_y"].mean(),
        }
        return new_state, aux

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    state_sh = repl
    if (fsdp or tp) and mesh.size > 1:
        tmpl = jax.eval_shape(
            lambda k: init_state(k, model_cfg, optimizer), jax.random.key(0)
        )
        state_sh = mesh_lib.state_sharding(mesh, tmpl, fsdp=fsdp, tp=tp)
    return _mesh_jit(step_fn, mesh, (state_sh, data, data, repl),
                     (state_sh, repl), donate=(0,))


def make_eval_step(
    model: ManoModel, model_cfg: MHEntConfig, mesh, n: int, temp: float,
    n_quant: int | None = None, quant_spec=None, tp: bool = False,
    fsdp: bool = False,
):
    """Multi-hypothesis eval: N sharded over 'hypo', batch over 'data';
    tp/fsdp mirror the training-state layout (`mesh_lib.state_sharding`)
    so an fsdp- or tensor-parallel-trained state evals in place instead
    of re-gathering the whole parameter tree every call.

    quant_spec: optional models/quant.QuantSpec — the returned step takes
    a trailing int8 qtree argument and samples hypotheses through the
    quantized encoder (the reverse-KLD log_p metric stays float). The
    qtree is an argument, not a closure constant, so per-epoch
    recalibration never recompiles."""

    def eval_fn(params, batch_stats, image, target, key, *qtree):
        image, target = _prep_batch(image, target)
        # Independent streams: with one shared key the log_p metric's
        # q-draws and the scored hypotheses share base noise (bit-identical
        # when test_samples == n_train_hypotheses at eval_temp=1.0) — the
        # reported loss and EPE/diversity metrics would be computed on
        # statistically dependent randomness.
        k_kld, k_hypo = jax.random.split(key)
        out, _ = mhent.reverse_kld(
            model, params, batch_stats, model_cfg, target, image, k_kld,
            train=False,
        )
        samples = mhent.sample_hypotheses(
            model, params, batch_stats, model_cfg, image, k_hypo,
            n=n, n_quant=n_quant if n_quant is not None else n, temp=temp,
            quant=(quant_spec, qtree[0]) if quant_spec is not None else None,
        )
        hypo_spec = mesh_lib.hypo_batch_spec()
        for k in ("xyz", "uv", "verts"):
            if k in samples:
                samples[k] = jax.lax.with_sharding_constraint(
                    samples[k], NamedSharding(mesh, hypo_spec)
                )
        output = dict(samples)
        output["log_p"] = out["log_p"]
        total, losses, mets = metrics_lib.mhent_metrics(
            output, target, image_size=model_cfg.image_size
        )
        mets = {k: v.mean() for k, v in mets.items()}
        mets["loss_total"] = total
        return mets

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    params_sh = repl
    if (tp or fsdp) and mesh.size > 1:
        tmpl = jax.eval_shape(lambda k: mhent.init(k, model_cfg)[0],
                              jax.random.key(0))
        params_sh = mesh_lib.state_sharding(mesh, tmpl, fsdp=fsdp, tp=tp)
    in_sh = (params_sh, repl, data, data, repl)
    if quant_spec is not None:
        in_sh = in_sh + (repl,)
    return _mesh_jit(eval_fn, mesh, in_sh, repl)


class Experiment:
    """The experiment driver (CrossModalHand equivalent).

    Owns a ScalarWriter (tensorboardX spawns an event-writer thread + a
    multiprocessing queue per instance) and a file logger; call close()
    (or use as a context manager) when done — leaked writer threads
    accumulated across a long-lived process were implicated in a
    full-test-suite crash (17 live TB threads at the fault point).
    Cleanup is two-layered because a sweep alone provably misses
    instances: a WeakSet registry feeds close_all_experiments (test
    harness sweep of still-referenced instances), and a
    weakref.finalize closes the sinks the moment a dropped instance is
    refcount-collected — a test-local Experiment is collected when the
    test function returns, BEFORE any teardown sweep runs (observed: 17
    leaked tensorboardX threads at the r4 cold-suite crash with a
    sweep-only design)."""

    _live: "weakref.WeakSet" = None  # initialised below

    def __init__(self, cfg, mano_dir: str = "./mano/"):
        self.cfg = cfg
        # Integrated MHEnt vs the non-integrated BasicEnc(+p_nf) RLE mode
        # (CrossModalHand.py:86-105, 229-349 dispatch).
        self.integrated = cfg.network.enc_type == "MHEnt"
        if self.integrated:
            self.model_cfg = build_model_config(cfg)
        else:
            if not cfg.network.p_nf:
                raise NotImplementedError(
                    "non-integrated mode requires network.p_nf (realnvp)"
                )
            self.model_cfg = build_rle_config(cfg)
        # ONE asset probe for both the model and its cache key: probing
        # twice raced asset swaps (self.model from the old state, the
        # shared-step-program key from the new — a poisoned cache entry).
        # (path, mtime, size) pins the values; id() could be recycled and
        # a bare path survives content swaps.
        _mano_fp = _mano_fingerprint(mano_dir)
        self.model = _load_mano_cached(_mano_fp)
        self._model_key = _mano_fp or "synthetic"
        hypo = cfg.tpu.mesh_hypo if "tpu" in cfg else 1
        tp = int(cfg.tpu.get("tp") or 1) if "tpu" in cfg else 1
        pp = int(cfg.tpu.get("pp") or 1) if "tpu" in cfg else 1
        # Use as many devices as divide the batch (a 2-image batch cannot
        # shard over 8 virtual devices).
        n_dev = mesh_lib.fit_devices(cfg.training.batch_size, hypo=hypo,
                                     tp=tp, pp=pp)
        self.mesh = mesh_lib.make_mesh(n_devices=n_dev, hypo=hypo, tp=tp,
                                       pp=pp)
        self._tp = tp > 1
        self._pp = pp > 1

        os.makedirs(cfg.model_dir, exist_ok=True)
        self.log = get_logger(
            os.path.join(cfg.model_dir, f"info_{cfg.training.mode}.log"),
            name=f"mhent_{id(self)}",
        )
        self.log.info(str(cfg))
        self.writer = ScalarWriter(cfg.model_dir)
        self._step = 0

        self.seed = cfg.training.seed if cfg.training.seed is not None else int(
            time.time()
        ) % 10000
        self.key = jax.random.key(self.seed)

        self.steps_per_epoch = None  # set once data is known
        self.optimizer = None
        self.state = None
        self._train_step = None
        self._eval_step = {}

        if cfg.training.pth:
            self._pending_restore = cfg.training.pth
        else:
            self._pending_restore = None

        Experiment._live.add(self)
        # The finalizer must not capture self (it would never fire);
        # it owns the sink objects directly.
        self._finalizer = weakref.finalize(
            self, _close_sinks, self.writer, self.log)

    # ------------------------------------------------------------ lifecycle
    def close(self):
        """Release the TB writer thread, queue, and log file handles.

        Idempotent (weakref.finalize runs at most once). The Experiment
        remains constructed after close(), but logging sinks are gone —
        eval/train after close() is not supported."""
        self._finalizer()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ------------------------------------------------------------------ data
    def make_datasets(self, which=("train", "eval")):
        """Synthetic fixture unless a real dataset dir is configured.
        Returns (train, eval); a split absent from `which` is None (an
        eval-only run should not pay train-split construction — prefix
        plumbing, annotation indexing, the mixed loader's probe items)."""
        name = self.cfg.dataset.dataset_name
        data_dir = self.cfg.tpu.data_dir if "tpu" in self.cfg else None
        if data_dir:
            from mhentropy_tpu.data import freihand, ho3d, mixed, rhd

            cache = self.cfg.tpu.get("decode_cache") if "tpu" in self.cfg \
                else None
            if cache:
                data_common.set_decode_cache(cache)

            loader = {"ho3d": ho3d, "rhd": rhd, "freihand": freihand,
                      "mixed_ho3d_rhd": mixed}.get(name)
            if loader is None:
                raise NotImplementedError(name)
            # "auto": have the loaders skip heavy target fields (clouds,
            # heatmaps, per-pixel masks) that this model config never
            # consumes — less host work per item, less H2D per batch.
            # "full" restores the complete reference-parity target.
            heavy = None
            if self.cfg.tpu.get("target_fields", "auto") != "full":
                heavy = set()
                if getattr(self.model_cfg, "use_mask_loss", False):
                    # Both spellings: HO3D emits "hand_mask", RHD "mask"
                    # (each loader gates on its own key; requesting the
                    # other's is a no-op for it).
                    heavy |= {"hand_mask", "mask"}
            u8 = bool(self.cfg.tpu.get("image_u8", True))
            dst = bool(self.cfg.tpu.get("device_st", True))
            scache = self.cfg.tpu.get("sample_cache")
            # Train side: the deterministic-prefix cache (decode through
            # flip served from disk; only the augmentation suffix runs
            # per epoch — 3.6x the per-item rate, bit-identical items).
            extra = {}
            if name == "mixed_ho3d_rhd":
                # Config-gated loss inputs must survive the mixed
                # schema projection — fail at construction, not as a
                # trace-time KeyError on the first batch (mixed.py).
                need = set()
                if getattr(self.model_cfg, "use_chamfer_loss", False):
                    need.add("object_verts")
                if getattr(self.model_cfg, "use_mask_loss", False):
                    need.add("hand_mask")
                extra["required"] = need
            train = loader.load(data_dir, mode="training",
                                heavy_fields=heavy, image_u8=u8,
                                device_st=dst, prefix_cache=scache,
                                **extra) if "train" in which else None
            evald = loader.load(data_dir, mode="evaluation",
                                heavy_fields=heavy, image_u8=u8,
                                device_st=dst, **extra) \
                if "eval" in which else None
            if scache and evald is not None:
                from mhentropy_tpu.data import cached

                if cached.eval_deterministic(evald):
                    evald = cached.SampleCache(evald, scache)
                else:
                    self.log.info(
                        "sample_cache skipped: eval items draw RNG "
                        "(full target_fields with the RHD cloud?)"
                    )
            return train, evald
        img = self.model_cfg.image_size
        bs = self.cfg.training.batch_size
        ds = name if name in ("rhd", "ho3d", "freihand") else "ho3d"
        # Floors sized for smoke/CI runs on the 1-core box (the synthetic
        # path is only ever a stand-in when no real data_dir is configured).
        n_train = max(4 * bs, 32)
        train = synthetic.make_dataset(
            self.model, n=n_train, image_size=img, seed=self.seed, ds=ds
        ) if "train" in which else None
        evald = synthetic.make_dataset(
            self.model, n=max(2 * bs, 32), image_size=img, seed=self.seed + 1,
            ds=ds,
        ) if "eval" in which else None
        return train, evald

    # ----------------------------------------------------------------- setup
    def _apply_pending_restore(self):
        """Consume a queued checkpoint restore (cfg.training.pth or
        eval(name=...)). Must run whenever the restore is set — not only on
        first state init — or eval("ckpt") after train_baseline() on the
        same Experiment would silently evaluate the current params."""
        if self._pending_restore:
            pr, self._pending_restore = self._pending_restore, None
            if isinstance(pr, tuple):  # (path, mod_names) via load_model
                self.load_model(*pr)
            else:
                self.load_model(pr)

    # ---------------------------------------------- shared-program plumbing
    @property
    def _fsdp(self) -> bool:
        return bool(self.cfg.tpu.fsdp) if "tpu" in self.cfg else False

    def _opt_fingerprint(self, steps_per_epoch: int) -> tuple:
        t = self.cfg.training
        return ("opt", float(t.lr), tuple(int(m) for m in t.milestones),
                int(steps_per_epoch))

    def _get_optimizer(self, steps_per_epoch: int):
        """The optimizer for this schedule, shared across Experiments with
        the same hyperparameters — so a shared train step's captured
        optimizer IS this object and opt_state stays consistent."""
        t = self.cfg.training
        return _shared_program(
            self._opt_fingerprint(steps_per_epoch),
            lambda: make_optimizer(t.lr, t.milestones, steps_per_epoch),
        )

    def _get_train_step(self):
        key = ("train_step", self.integrated, self._model_key,
               repr(self.model_cfg), _mesh_fingerprint(self.mesh),
               self._opt_fingerprint(self.steps_per_epoch), self._fsdp,
               self._tp, self._pp)
        if self.integrated:
            build = lambda: make_train_step(  # noqa: E731
                self.model, self.model_cfg, self.optimizer, self.mesh,
                fsdp=self._fsdp, tp=self._tp, pipe=self._pp,
            )
        else:
            build = lambda: make_rle_train_step(  # noqa: E731
                self.model_cfg, self.optimizer, self.mesh
            )
        return _shared_program(key, build)

    def _ensure_state(self, steps_per_epoch: int, for_training: bool = False):
        if self.state is not None:
            if (for_training and steps_per_epoch != self.steps_per_epoch
                    and int(self.state.step) == 0):
                # State was initialised by an eval_loop (eval-dataset
                # sizing): rebuild the LR schedule + opt_state with the
                # TRAIN steps_per_epoch, or the MultiStepLR milestones
                # fire at eval-set scale (e.g. ~15x early on RHD).
                # Params/batch_stats are kept; training has not stepped.
                self.log.info(
                    f"rebuilding optimizer: steps_per_epoch "
                    f"{self.steps_per_epoch} -> {steps_per_epoch}"
                )
                self.steps_per_epoch = steps_per_epoch
                self.optimizer = self._get_optimizer(steps_per_epoch)
                self.state = self.state._replace(
                    opt_state=self.optimizer.init(self.state.params)
                )
                self._train_step = self._get_train_step()
            elif for_training and steps_per_epoch != self.steps_per_epoch:
                # Trained state: re-initialising opt_state here would wipe
                # the Adam moments and reset the LR schedule to step 0 (the
                # schedule position rides opt_state). Keep the existing
                # optimizer; the milestone boundaries stay at the ORIGINAL
                # steps_per_epoch scale, which is the lesser evil — warn.
                self.log.warning(
                    f"steps_per_epoch changed {self.steps_per_epoch} -> "
                    f"{steps_per_epoch} on an already-trained state "
                    f"(step {int(self.state.step)}); keeping the existing "
                    f"optimizer/schedule to preserve Adam moments"
                )
            self._apply_pending_restore()
            return
        self.steps_per_epoch = steps_per_epoch
        self.optimizer = self._get_optimizer(steps_per_epoch)
        self.key, k_init = jax.random.split(self.key)
        if self.integrated:
            self.state = init_state(k_init, self.model_cfg, self.optimizer)
        else:
            params, stats = rle.init(k_init, self.model_cfg)
            self.state = TrainState(
                params=params, batch_stats=stats,
                opt_state=self.optimizer.init(params),
                step=jnp.zeros((), jnp.int32),
            )
        self._train_step = self._get_train_step()
        self._dump_models_txt()
        self._apply_pending_restore()

    def _dump_models_txt(self):
        """Architecture + parameter counts (CrossModalHand.py:129-142)."""

        def count(tree):
            return sum(
                int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(tree)
                if hasattr(x, "shape")
            )

        lines = [repr(self.model_cfg), ""]
        for name, sub in self.state.params.items():
            lines.append(f"{name}: {count(sub):,} params")
        lines.append(f"total: {count(self.state.params):,} params")
        lines.append(f"batch_stats: {count(self.state.batch_stats):,} entries")
        with open(os.path.join(self.cfg.model_dir, "models.txt"), "w") as fp:
            fp.write("\n".join(lines) + "\n")

    def _get_eval_step(self, n: int, temp: float, quant_spec=None):
        # The RLE step uses none of these knobs — key it constant or each
        # (n, temp) pair would re-trace an identical program (~20-60 s on
        # this 1-core host).
        if self.integrated:
            # The instance key must carry every knob the shared skey does
            # (minus the per-Experiment constants): a cfg.training.test_quant
            # or cfg.tpu.fsdp mutation between eval_loop calls would
            # otherwise be served the stale compiled step.
            n_quant = min(self.cfg.training.get("test_quant") or n, n)
            key = (n, temp, quant_spec, n_quant, self._fsdp, self._tp)
        else:
            key = "rle"
        if key not in self._eval_step:
            if self.integrated:
                skey = ("eval_step", True, self._model_key,
                        repr(self.model_cfg), _mesh_fingerprint(self.mesh),
                        n, float(temp), n_quant, repr(quant_spec),
                        self._fsdp, self._tp)
                self._eval_step[key] = _shared_program(
                    skey,
                    lambda: make_eval_step(
                        self.model, self.model_cfg, self.mesh, n, temp,
                        n_quant=n_quant, quant_spec=quant_spec,
                        tp=self._tp, fsdp=self._fsdp,
                    ),
                )
            else:
                skey = ("eval_step", False, repr(self.model_cfg),
                        _mesh_fingerprint(self.mesh))
                self._eval_step[key] = _shared_program(
                    skey,
                    lambda: make_rle_eval_step(self.model_cfg, self.mesh),
                )
        return self._eval_step[key]

    # ------------------------------------------------------------------ loops
    def _latest_checkpoint(self):
        """(epoch, path) of the newest per-epoch checkpoint in model_dir,
        or None. orbax saves atomically (tmp dir + rename), so any dir
        matching the tag is a complete checkpoint."""
        import re

        tag = re.escape(f"baseline_{self.cfg.network.decoder_type}_")
        best = None
        if not os.path.isdir(self.cfg.model_dir):
            return None
        for name in os.listdir(self.cfg.model_dir):
            m = re.fullmatch(tag + r"(\d+)", name)
            path = os.path.join(self.cfg.model_dir, name)
            if m and os.path.isdir(path):
                e = int(m.group(1))
                if best is None or e > best[0]:
                    best = (e, path)
        return best

    def train_baseline(self):
        train_data, eval_data = self.make_datasets()
        bs = self.cfg.training.batch_size
        n_batches = max(1, _num_samples(train_data) // bs)
        self._ensure_state(n_batches, for_training=True)

        # Preemption-safe auto-resume (cfg.tpu.autoresume): pick up the
        # newest per-epoch checkpoint in model_dir — params, Adam moments
        # and step all restore, so a preempted pod job continues where it
        # stopped. Off by default: the reference retrains from scratch on
        # rerun, and model_dir is random per run unless pinned.
        start_epoch = 0
        if "tpu" in self.cfg and self.cfg.tpu.get("autoresume"):
            latest = self._latest_checkpoint()
            if latest:
                epoch_done, path = latest
                self.load_model(path)
                start_epoch = epoch_done + 1
                self._step = int(self.state.step)  # TB x-axis continuity
                self.log.info(
                    f"autoresume: restored {path} (epoch {epoch_done}), "
                    f"continuing at epoch {start_epoch}"
                )

        if start_epoch == 0:
            self.eval_loop(eval_data, epoch=0)
        for epoch in range(start_epoch, self.cfg.training.epochs):
            self.train_epoch(train_data, epoch)
            if (epoch + 1) % self.cfg.eval_interval == 0:
                self.eval_loop(eval_data, epoch=epoch)
            if epoch % self.cfg.save_interval == 0:
                self.save_model(f"baseline_{self.cfg.network.decoder_type}", epoch)
        if self.cfg.training.epochs:
            self.save_model("baseline_final")

    def train_epoch(self, data, epoch: int):
        bs = self.cfg.training.batch_size
        if hasattr(data, "set_epoch"):
            # Advance the loaders' per-(seed, epoch, idx) augmentation
            # stream (data/common.item_rng) so augmentations differ
            # across epochs without any shared-RandomState draw ordering.
            data.set_epoch(epoch)
        loss_meter = AverageMeter()
        # Device scalars are only fetched at log points and at epoch end:
        # a per-step float(aux["loss"]) forces a D2H sync each step, and a
        # scalar fetch costs ~25 ms through the axon relay — more than the
        # ~20 ms train step itself. Deferring keeps dispatch async (the
        # device runs ahead of the host between log lines).
        pending = []

        def drain():
            for v in jax.device_get(pending):
                loss_meter.update(float(v))
            pending.clear()

        for idx, (image, target) in enumerate(data_common.prefetch(
                data_common.batches(data, bs, shuffle=True, seed=self.seed + epoch,
                                    pad_remainder=True)
        )):
            self.key, k_step = jax.random.split(self.key)
            self.state, aux = self._train_step(self.state, image, target, k_step)
            pending.append(aux["loss"])
            self._step += 1
            if idx % self.cfg.info_interval == 0:
                drain()
                # ONE device_get for all the log scalars — a float() per
                # key is a separate ~25 ms relay round-trip each.
                extras = jax.device_get(
                    {k: aux[k] for k in ("h_q", "q_log_p", "sigma_i")
                     if k in aux})
                msg = f"Epoch:{epoch}| Step:{idx}| Avg_Loss:{loss_meter.avg:.4f}|"
                for k, v in extras.items():
                    msg += f" {k}:{float(v):.4f}|"
                self.log.info(msg)
                self.writer.add_scalar(
                    "loss_avg/loss_total", loss_meter.avg, global_step=self._step
                )
        drain()
        return loss_meter.avg

    def _quant_spec(self, batch_size: int):
        """The QuantSpec the quantized eval path runs with, or None when
        cfg.tpu.quantize_encoder is off (or the model is non-integrated).
        The int8 fused hypothesis sampler is part of the quantized eval
        by default (measured +5.1% full-pipeline on top of the int8
        encoder); cfg.tpu.quantize_sampler=False opts out, and
        unsupported flow shapes / the use_pallas_sampler kill switch
        gate it off (models/quant.sampler_supported)."""
        if not (self.integrated and "tpu" in self.cfg
                and bool(self.cfg.tpu.get("quantize_encoder", False))):
            return None
        from mhentropy_tpu.models import quant as quant_mod

        img = self.model_cfg.image_size
        return quant_mod.QuantSpec(
            backbone=self.model_cfg.encoder.backbone,
            q_from=quant_mod.resolve_q_from(
                self.cfg.tpu.get("quantize_q_from", "auto"),
                self.model_cfg.encoder.backbone, (batch_size, img, img, 3)),
            dtype=self.model_cfg.encoder.dtype,
            pallas_stem=getattr(self.model_cfg.encoder, "pallas_stem",
                                True),
            pallas_stage1=getattr(self.model_cfg.encoder,
                                  "pallas_stage1", True),
            pallas_mid=getattr(self.model_cfg.encoder, "pallas_mid", False),
            int8_sampler=(
                bool(self.cfg.tpu.get("quantize_sampler", True))
                and quant_mod.sampler_supported(self.model_cfg)))

    def eval_loop(self, data, epoch: int = 0, n: int | None = None):
        if self.state is None:
            bs = self.cfg.training.batch_size
            self._ensure_state(max(1, _num_samples(data) // bs))
        self._apply_pending_restore()
        n = n or self.cfg.training.test_samples
        bs = self.cfg.training.batch_size
        temp = self.cfg.training.get("eval_temp", 0.8)
        # int8 eval sampling (cfg.tpu.quantize_encoder): recalibrated on
        # the first eval batch EVERY eval_loop call (params move between
        # epochs); the qtree is a step argument, so this never recompiles.
        # Calibration happens lazily INSIDE the loop so batch 0 is not
        # decoded twice (and an empty dataset stays a no-op).
        quant_spec = self._quant_spec(bs)
        if quant_spec is not None:
            step = self._get_eval_step(n, temp, quant_spec=quant_spec)
        else:
            step = self._get_eval_step(n, temp)
        qargs = None
        meters = {}
        batch_mets = []
        # pad_remainder keeps tail samples (no drop_last in the reference's
        # eval DataLoader, CrossModalHand.py:176-179); metric means are
        # weighted by the per-batch valid count.
        for image, target in data_common.prefetch(
                data_common.batches(data, bs, pad_remainder=True)):
            self.key, k = jax.random.split(self.key)
            if quant_spec is not None and qargs is None:
                from mhentropy_tpu.models import quant as quant_mod

                calib = _prep_image(jnp.asarray(image), target)
                act = quant_mod.calibrate(
                    quant_spec, self.state.params["encoder"]["backbone"],
                    self.state.batch_stats, calib)
                qtree = quant_mod.prepare(
                    quant_spec, self.state.params["encoder"]["backbone"],
                    self.state.batch_stats, act)
                if quant_spec.int8_sampler:
                    # Calibrated at this eval's exact temperature: the
                    # flow's activation scales are amaxes of a
                    # temp-scaled trajectory, so a hotter draw than
                    # calibrated would saturate the int8 clip.
                    _, qtree = quant_mod.quantize_sampler_into(
                        quant_spec, qtree, self.state.params,
                        self.model_cfg.flow, calib, temp=temp)
                qargs = (qtree,)
            mets = step(self.state.params, self.state.batch_stats, image,
                        target, k, *(qargs or ()))
            batch_mets.append(mets)
        # ONE D2H transfer for the whole eval: fetching each metric
        # scalar per batch cost ~25 ms of relay round-trip PER FETCH and
        # serialized the dispatch pipeline (docs/PERF.md "Measurement
        # gotchas"); deferred, the device streams through all batches.
        for mets in jax.device_get(batch_mets):
            n_valid = float(mets.pop("n_valid", bs))
            for name, v in mets.items():
                meters.setdefault(name, AverageMeter()).update(float(v), n=n_valid)
        summary = {k: m.avg for k, m in meters.items()}
        line = f"Epoch:{epoch}|"
        if "eucLoss_3d_rgb_sample" in summary:
            line += f" eval_3d_rgb:{summary['eucLoss_3d_rgb_sample'] * 1000:.4f}|"
        for k in sorted(summary):
            self.writer.add_scalar(f"metric_eval/{k}", summary[k], self._step)
        self.log.info(line + " " + str({k: round(v, 4) for k, v in summary.items()}))
        return summary

    def eval(self, name: str | None = None):
        if name:
            # An EXPLICITLY requested restore must exist up front: the
            # soft "keeping init" path below is for cfg-default paths
            # (e.g. ho3d.yaml's ./model/ent_ho3d.pth absent from the
            # env), but eval(name=typo) silently publishing metrics of
            # un-restored params is a trap.
            p = os.path.abspath(name)
            if not (os.path.isdir(p) or os.path.isfile(p)):
                raise FileNotFoundError(
                    f"eval(name={name!r}): no checkpoint at {p}")
            self._pending_restore = name
        _, eval_data = self.make_datasets(which=("eval",))
        return self.eval_loop(eval_data)

    # ------------------------------------------------------------ checkpoints
    def _ckpt_tree(self):
        """The one checkpoint pytree template — save_model and load_model
        must stay in lockstep (a TrainState field added to one and not the
        other would save checkpoints that silently fail to round-trip)."""
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }

    def save_model(self, name: str, epoch: int | None = None):
        import orbax.checkpoint as ocp

        tag = name if epoch is None else f"{name}_{epoch}"
        path = os.path.abspath(os.path.join(self.cfg.model_dir, tag))
        ckpt = self._ckpt_tree()
        with ocp.StandardCheckpointer() as saver:
            saver.save(path, ckpt, force=True)
        self.log.info(f"save model in {path}")

    def load_model(self, path: str, mod_names=None):
        """Restore from an orbax dir or a torch .pth via the converter
        (load_mod_names subsetting as CrossModalHand.py:589-602)."""
        if self.state is None:
            # No state to restore into yet: queue it for the next
            # _ensure_state (the cfg.training.pth machinery) instead of
            # crashing on self.state.params.
            self._pending_restore = (path, mod_names)
            self.log.info(f"queued restore of {path} until state init")
            return
        path = os.path.abspath(path)
        if path.endswith(".pth"):
            from tools.convert_torch import load_torch_checkpoint

            params = load_torch_checkpoint(path, self.model_cfg)
            self._merge_params(params, mod_names)
            self.log.info(f"load torch model from {path}")
            return
        if not os.path.isdir(path):
            self.log.info(f"checkpoint {path} not found; keeping init")
            return
        import orbax.checkpoint as ocp

        template = self._ckpt_tree()
        with ocp.StandardCheckpointer() as loader:
            ckpt = loader.restore(path, template)
        self.state = TrainState(
            ckpt["params"], ckpt["batch_stats"], ckpt["opt_state"], ckpt["step"]
        )
        self.log.info(f"load model from {path}")

    def _merge_params(self, new_params: dict, mod_names=None):
        params = dict(self.state.params)
        for k, v in new_params.items():
            if mod_names is not None and k not in mod_names:
                continue
            if v is not None:
                params[k] = v
        self.state = self.state._replace(params=params)


Experiment._live = weakref.WeakSet()


def _close_sinks(writer, log):
    try:
        writer.close()
    except Exception:
        pass
    for h in list(log.handlers):
        try:
            h.close()
        except Exception:
            pass
        log.removeHandler(h)


def close_all_experiments():
    """Close every live Experiment's logging sinks (test-harness sweep)."""
    for exp in list(Experiment._live):
        exp.close()
