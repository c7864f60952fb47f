"""yacs-compatible config system preserving the reference's YAML schema.

The reference uses yacs CfgNode defaults + `--cfg file.yaml` overlay
(/root/reference/hand/configs/config.py:13-99); BASELINE.json requires the
schema be preserved so HO3D/RHD/FreiHAND experiment YAMLs run unchanged. yacs
is not in this environment, so CfgNode is implemented here (attribute access,
clone, YAML merge with type checking, new_allowed groups).
"""

from __future__ import annotations

import argparse
import copy
from typing import Any

import yaml


class CfgNode(dict):
    """Minimal yacs-compatible config node."""

    def __init__(self, init: dict | None = None, new_allowed: bool = False):
        super().__init__()
        object.__setattr__(self, "_new_allowed", new_allowed)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def merge_from_other_cfg(self, other: dict) -> None:
        for k, v in other.items():
            if k not in self:
                if not object.__getattribute__(self, "_new_allowed"):
                    raise KeyError(f"Non-existent config key: {k}")
                self[k] = CfgNode(v) if isinstance(v, dict) else v
                continue
            cur = self[k]
            if isinstance(cur, CfgNode) and isinstance(v, dict):
                cur.merge_from_other_cfg(v)
            else:
                self[k] = _coerce(v, cur, k)

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            overlay = yaml.safe_load(f) or {}
        self.merge_from_other_cfg(overlay)

    def dump(self) -> str:
        def plain(node):
            return {
                k: plain(v) if isinstance(v, CfgNode) else v for k, v in node.items()
            }

        return yaml.safe_dump(plain(self), default_flow_style=False)


def _coerce(new: Any, old: Any, key: str) -> Any:
    if old is None:
        # Keep dict overlays addressable as cfg nodes (a raw dict broke
        # attribute access and wholesale-replaced on a second merge).
        return CfgNode(new) if isinstance(new, dict) else new
    if new is None:
        if isinstance(old, CfgNode):
            # A YAML section with all keys commented out parses as None;
            # silently replacing the whole group would crash far from the
            # merge ("'NoneType' has no attribute ..."). yacs raises at
            # merge time — so do we.
            raise TypeError(
                f"Type mismatch for key {key}: the YAML overlay sets the "
                "config group to null (empty section?) — delete the "
                "section header or give it keys")
        return new
    if isinstance(old, bool):
        # yacs raises on a non-bool overlay; bool("false") == True would
        # silently invert the user's intent.
        if not isinstance(new, bool):
            raise TypeError(
                f"Type mismatch for key {key}: bool vs {type(new)} "
                f"({new!r}) — unquote true/false in the YAML")
        return new
    if isinstance(old, (int, float)) and isinstance(new, (int, float)) \
            and not isinstance(new, bool):
        coerced = type(old)(new)
        if isinstance(old, int) and coerced != new:
            # int(0.5) == 0 would silently disable a fractional weight.
            raise TypeError(
                f"Type mismatch for key {key}: int default cannot hold "
                f"{new!r} losslessly")
        return coerced
    if type(old) is type(new):
        return new
    if isinstance(old, (list, tuple)) and isinstance(new, (list, tuple)):
        return list(new)
    raise TypeError(f"Type mismatch for key {key}: {type(old)} vs {type(new)}")


def get_cfg_defaults() -> CfgNode:
    """Defaults mirroring the reference schema (configs/config.py:13-71)."""
    from mhentropy_tpu.utils.logging import rand_model_name

    model_dir = f"./model/{rand_model_name()}/"
    cfg = CfgNode()

    cfg.dataset = CfgNode()
    cfg.dataset.dataset_name = "rhd"
    cfg.dataset.image_size = [256, 256]
    cfg.dataset.range_ = [[-5.0, -5.0, -5.0], [5.0, 5.0, 5.0]]
    cfg.dataset.pe = "3d"
    cfg.dataset.jointN = 21

    cfg.model_dir = model_dir
    cfg.pretrain_model = model_dir + "pretrain.pth"
    cfg.final_model = model_dir + "final.pth"
    cfg.info_interval = 200
    cfg.save_interval = 5
    cfg.eval_interval = 1
    cfg.eval_mscoco = False

    cfg.training = CfgNode(new_allowed=True)
    cfg.training.mode = "pretrain"
    cfg.training.seed = None
    cfg.training.view_correction = True
    cfg.training.batch_size = 32
    cfg.training.num_workers = 32
    cfg.training.pth = None
    cfg.training.load_mod_names = None
    cfg.training.epochs = 80
    cfg.training.lr = 1e-4
    cfg.training.milestones = [30, 60]
    cfg.training.warmups = 0
    cfg.training.criterion = "ELBOLoss"
    cfg.training.test_samples = 200
    # Knobs the reference hardcodes, surfaced with its values as defaults:
    cfg.training.n_train_hypotheses = 10  # N (network.py:780)
    cfg.training.test_quant = None  # N_quant; None -> = test_samples (CrossModalHand.py:359)
    cfg.training.eval_temp = 0.8  # sample temp at eval (CrossModalHand.py:360)

    cfg.network = CfgNode(new_allowed=True)
    cfg.network.enc_type = "BasicEnc"
    cfg.network.input = "image"
    cfg.network.num_latent = 64
    cfg.network.nums_latent = None
    cfg.network.backbone = "resnet18"
    cfg.network.resnet_pretrained = True
    cfg.network.conditional_p = False
    cfg.network.conditional_i = False
    cfg.network.feat_dim = None
    cfg.network.acts = "exp"
    cfg.network.deterministic = False
    cfg.network.iterative_refinement = False
    cfg.network.decoder_type = "mano"
    cfg.network.pgm = None
    cfg.network.p_nf = None
    cfg.network.p_nf_dim = 3
    cfg.network.tsfm_on = None
    cfg.network.cond_mapping_dims = None
    cfg.network.kemb = False
    cfg.network.h_dims = [64, 64]
    cfg.network.num_steps = 3
    cfg.network.nf_res = None
    cfg.network.ddpm = False
    # MHEntropy group (ho3d.yaml keys).
    cfg.network.regressor = "realnvp"
    cfg.network.rot_prior = None
    cfg.network.w_reg_th = 50
    cfg.network.w_prior_2d = 0
    cfg.network.w_reg_ds = 0
    cfg.network.b_2d = 0.03
    cfg.network.entropy = True
    cfg.network.mode = False
    # Knobs the reference hardcodes in special_cfg / module ctors
    # (CrossModalHand.py:85, network.py:392,429-435,441-442), surfaced with
    # the reference's values as defaults:
    cfg.network.b_3d = 0.03  # _Laplace b for p(xyz|z) (network.py:392)
    # ConditionalGlow posterior shape; defaults = the reference's hardcoded
    # ConditionalGlow(45, 512, 4, 2, ...) (network.py:343-344). Smoke/CI
    # configs shrink these to keep 1-core trace walls down.
    cfg.network.glow_hidden = 512
    cfg.network.glow_layers = 4
    cfg.network.glow_blocks = 2
    cfg.network.T = 1.0  # log_p temperature divisor (special_cfg T)
    cfg.network.kld_w = 1.0
    cfg.network.kld_w_annealing = [1.0, 24000]  # [1, 20*1200]
    cfg.network.th3_ref_alpha = 5.0  # th3 ball prior alpha (network.py:433)
    cfg.network.bt_alpha = 50.0  # beta prior alpha (network.py:435)
    # Chamfer / mask terms (dead in the reference: network.py:821-826 chamfer
    # commented, renderer dead; functional here):
    cfg.network.use_chamfer_loss = False
    cfg.network.w_chamfer = 10.0
    cfg.network.use_mask_loss = False
    cfg.network.b_mask = 0.02  # Laplace scale like b_2d/b_3d (was an
    # inverse scale pre-r3-fix; 0.02 == the old default's effective value)

    cfg.loss = CfgNode()
    cfg.loss.kl = 0.0001

    # TPU-framework extensions (absent keys in the reference default to the
    # reference's behaviour).
    cfg.tpu = CfgNode(new_allowed=True)
    cfg.tpu.mesh_hypo = 1  # hypothesis-axis mesh size for eval sharding
    cfg.tpu.fsdp = False  # ZeRO-3: shard train state over the data axis
    cfg.tpu.tp = 1  # model-axis mesh size (Megatron-style tensor parallel)
    # pipe-axis mesh size: GPipe the training flow draw over 'pipe'
    # (parallel/pipeline.py; realnvp regressor only — the step raises
    # loudly otherwise). Composes with tp/fsdp/mesh_hypo.
    cfg.tpu.pp = 1
    cfg.tpu.autoresume = False  # resume from the newest epoch ckpt in model_dir
    cfg.tpu.compute_dtype = "bfloat16"  # backbone compute dtype
    cfg.tpu.data_dir = None  # dataset root; None -> synthetic fixture
    # int8 W8A8 encoder on the eval sampling path (models/quant.py):
    # calibrated on the first eval batch each eval_loop call, +21%
    # full-pipeline throughput measured (docs/PERF.md). Eval-only; the
    # reverse-KLD log_p metric stays float.
    cfg.tpu.quantize_encoder = False
    cfg.tpu.quantize_q_from = "auto"  # first backbone stage to quantize
    # ("auto" = 0 when the fused int8 stage-1 kernel applies, else 1;
    # YAML overrides must quote the stage: "0"/"1" — the schema type is str)
    # int8 fused RealNVP hypothesis sampler as part of the quantized eval
    # (flows/pallas_sampler_int8.py, +5.1% measured on top of the int8
    # encoder). Only active when quantize_encoder is on and the flow
    # shape/kill-switch gates pass (models/quant.sampler_supported).
    cfg.tpu.quantize_sampler = True
    # Train-mode BN stats/grad reductions as Pallas kernels
    # (models/bn_pallas.py). MEASURED LOSS on chip (r5 A/B: 22.4-27.6 vs
    # 19.9 ms/step — custom calls force activation relayout copies XLA's
    # native reduces never pay; docs/PERF.md "BUILT, MEASURED,
    # DISPROVEN"). Kept opt-in as the A/B record: False | True ("stats"
    # fwd-only mode) | "full" (stats+grad custom_vjp).
    cfg.tpu.fused_train_bn = False
    # Decoded-image disk cache (data/common.set_decode_cache): the host
    # pipeline is PNG-decode-bound; caching turns ~3-4 ms decodes into
    # ~30 us mmap reads from the second epoch on. Set to a directory path.
    cfg.tpu.decode_cache = None
    # Which heavy (per-pixel / large) target fields the loaders compute:
    # "auto" -> only what the configured model consumes (e.g. hand_mask when
    # network.use_mask_loss); "full" -> the complete reference-parity target
    # (cloud/heatmap/object_mask/... included). "auto" measurably raises
    # host input-pipeline throughput and cuts per-sample H2D (docs/PERF.md).
    cfg.tpu.target_fields = "auto"
    # uint8 image transport: loaders ship the crop as uint8 where that is
    # exact (RHD always — the host chain is uint8 end to end; HO3D/FreiHAND
    # eval mode) and the jitted step normalises on device. 4x less image
    # H2D; a B=64 f32 batch costs ~50 ms through the relay (docs/PERF.md).
    cfg.tpu.image_u8 = True
    # Preprocessing disk caches (None = off). Eval: whole deterministic
    # items (data/cached.SampleCache — one pickle read per item from the
    # 2nd epoch/run on). Train: the RHD/HO3D loaders' deterministic
    # PREFIX (decode through flip/crop; only the augmentation suffix
    # runs per epoch, bit-identical items, 3.6x the per-item rate).
    cfg.tpu.sample_cache = None
    # Move the per-item (s, t) orthographic Procrustes fit off the host:
    # loaders omit "st" and the jitted steps reconstruct it with the
    # batched core.camera.compute_st (engine._prep_batch).
    cfg.tpu.device_st = True

    return cfg


def update_cfg(cfg_file: str) -> CfgNode:
    cfg = get_cfg_defaults()
    cfg.merge_from_file(cfg_file)
    return cfg.clone()


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, help="cfg file path")
    args = parser.parse_args(argv)
    if args.cfg is not None:
        cfg = update_cfg(args.cfg)
    else:
        cfg = get_cfg_defaults()
    return cfg, args.cfg
