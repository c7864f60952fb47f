"""Full-stack integration: fabricated RHD on disk -> config -> Experiment ->
one training epoch + eval + checkpoint, through the same code path as
`python run.py --cfg`."""

import os

import numpy as np
import pytest

pytest.importorskip("imageio")


def test_experiment_trains_on_real_format_rhd(tmp_path):
    from tests.fixtures_data import build_rhd

    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import get_cfg_defaults

    data_root = build_rhd(str(tmp_path / "rhd"), n=4)

    cfg = get_cfg_defaults()
    cfg.merge_from_other_cfg(
        {
            "model_dir": str(tmp_path / "run") + "/",
            "info_interval": 1,
            "save_interval": 1,
            "eval_interval": 1,
            "dataset": {"dataset_name": "rhd", "image_size": [256, 256]},
            "network": {
                "enc_type": "MHEnt",
                "input": "image",
                "num_latent": 32,
                "backbone": "resnet18",
                "decoder_type": "id",
                "tsfm_on": 32,
                "h_dims": [32, 32],
                "num_steps": 1,
                "regressor": "realnvp",
                "w_reg_th": 50,
                "b_2d": 0.03,
                "entropy": True,
                "mode": False,
            },
            "training": {
                "mode": "baseline_VAE",
                "batch_size": 2,
                "seed": 0,
                "epochs": 1,
                "lr": 2e-4,
                "milestones": [10],
                "criterion": "MHEntLoss",
                "test_samples": 4,
            },
            "loss": {"kl": 0.0},
            "tpu": {"mesh_hypo": 1, "compute_dtype": "float32",
                    "data_dir": data_root},
        }
    )

    exp = Experiment(cfg)
    exp.train_baseline()

    # models.txt dumped, checkpoint written, eval metrics logged.
    assert os.path.exists(os.path.join(cfg.model_dir, "models.txt"))
    ckpts = [d for d in os.listdir(cfg.model_dir) if d.startswith("baseline_")]
    assert ckpts, os.listdir(cfg.model_dir)
    summary = exp.eval_loop(exp.make_datasets()[1], epoch=99)
    assert np.isfinite(summary["eucLoss_3d_rgb_sample"])
    assert np.isfinite(summary["loss_total"])

    # Checkpoint restores into a fresh experiment.
    exp2 = Experiment(cfg)
    exp2._ensure_state(1)
    exp2.load_model(os.path.join(cfg.model_dir, sorted(ckpts)[-1]))
    a = np.asarray(exp.state.params["det_head"]["l0"]["w"])
    b = np.asarray(exp2.state.params["det_head"]["l0"]["w"])
    assert a.shape == b.shape


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """ONE train_baseline shared by the restore and autoresume tests
    (r4 merged them into one 105-112 s straggler; r5 splits them around a
    module fixture so each stays under the 60 s budget while the
    expensive cycle still runs once)."""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    cfg.model_dir = str(tmp_path_factory.mktemp("resume") / "run")
    cfg.training.epochs = 1  # "preempted" after saving epoch 0
    cfg.tpu.autoresume = True
    exp = Experiment(cfg)
    exp.train_baseline()
    trained = np.asarray(exp.state.params["det_head"]["l0"]["w"]).copy()
    step_done = int(exp.state.step)
    assert step_done > 0
    return cfg, exp, trained, step_done


def test_eval_restores_named_checkpoint(trained_run):
    """eval(name=...) on an Experiment whose state is already initialised
    must restore the named checkpoint, not silently evaluate the current
    params (VERDICT r2 weak #5). Also leaves NO per-epoch checkpoint
    behind, which the autoresume test below depends on."""
    cfg, exp, trained, _ = trained_run
    exp.save_model("snap")
    train_data, _ = exp.make_datasets(which=("train",))
    exp.train_epoch(train_data, 1)
    assert not np.allclose(
        trained, np.asarray(exp.state.params["det_head"]["l0"]["w"])
    )
    summary = exp.eval(os.path.join(cfg.model_dir, "snap"))
    np.testing.assert_array_equal(
        trained, np.asarray(exp.state.params["det_head"]["l0"]["w"])
    )
    assert np.isfinite(summary["eucLoss_3d_rgb_sample"])


def test_autoresume_continues_from_newest_checkpoint(trained_run):
    """cfg.tpu.autoresume: a rerun in the same model_dir restores the
    newest per-epoch checkpoint — params, Adam moments AND step — and
    continues at the next epoch instead of retraining from scratch.
    (The eval-restore test's manual epoch saves no per-epoch checkpoint,
    so the newest is still epoch 0 whichever order the tests ran.)"""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg, _, trained, step_done = trained_run
    cfg2 = update_cfg("configs/smoke.yaml")
    cfg2.model_dir = cfg.model_dir
    cfg2.training.epochs = 2
    cfg2.tpu.autoresume = True
    exp2 = Experiment(cfg2)
    latest = exp2._latest_checkpoint()
    assert latest is not None and latest[0] == 0
    exp2.train_baseline()
    assert int(exp2.state.step) == 2 * step_done
    assert not np.allclose(
        trained, np.asarray(exp2.state.params["det_head"]["l0"]["w"])
    )


def test_experiment_quantized_eval_smoke(tmp_path):
    """cfg.tpu.quantize_encoder drives the int8 W8A8 eval path end to end
    through the Experiment (calibration on the first eval batch, qtree as
    a step argument)."""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    cfg.model_dir = str(tmp_path / "run")
    cfg.tpu.quantize_encoder = True
    exp = Experiment(cfg)
    _, eval_data = exp.make_datasets()
    summary = exp.eval_loop(eval_data, epoch=0)
    assert np.isfinite(summary["eucLoss_3d_rgb_sample"])
    # The cached eval step is the quantized variant, and the default
    # quantized path includes the int8 fused sampler (the flow qtree is
    # calibrated lazily alongside the encoder's — emulated on CPU).
    specs = [k[2] for k in exp._eval_step if k[2] is not None]
    assert specs and all(s.int8_sampler for s in specs)


def test_experiment_quant_spec_gates(tmp_path):
    """_quant_spec (what eval_loop runs with): quantize_sampler=False
    keeps the quantized eval encoder-only; the use_pallas_sampler kill
    switch gates the sampler off too; quantize_encoder off -> None.
    (Spec-level — the compiled quantized smoke above covers execution.)"""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    cfg.model_dir = str(tmp_path / "run")
    exp = Experiment(cfg)
    assert exp._quant_spec(4) is None

    cfg.tpu.quantize_encoder = True
    assert exp._quant_spec(4).int8_sampler

    cfg.tpu.quantize_sampler = False
    assert not exp._quant_spec(4).int8_sampler

    cfg.tpu.quantize_sampler = True
    exp.model_cfg = exp.model_cfg._replace(use_pallas_sampler=False)
    assert not exp._quant_spec(4).int8_sampler


def test_experiment_tp_mesh_wiring(tmp_path):
    """cfg.tpu.tp plumbs through fit_devices/make_mesh to a 'model' axis
    and flags the train/eval steps tensor-parallel (no compile — the
    numerics are pinned in test_engine)."""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    cfg.model_dir = str(tmp_path / "run")
    cfg.tpu.tp = 2
    cfg.tpu.mesh_hypo = 2
    exp = Experiment(cfg)
    assert exp.mesh.shape["model"] == 2
    assert exp.mesh.shape["hypo"] == 2
    assert exp._tp
    assert exp.mesh.size <= 8


def test_experiment_pp_mesh_wiring(tmp_path):
    """cfg.tpu.pp (r5) plumbs through fit_devices/make_mesh to a 'pipe'
    axis and flags the train step pipelined (no compile — the pipelined
    numerics are pinned by test_engine's composed tp+pp test and
    test_pipeline)."""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    cfg.model_dir = str(tmp_path / "run")
    cfg.tpu.pp = 2
    exp = Experiment(cfg)
    assert exp.mesh.shape["pipe"] == 2
    assert exp._pp
    assert exp.mesh.size <= 8


def test_experiment_rle_mode_smoke(tmp_path):
    """The non-integrated BasicEnc + p_nf RLE experiment path end to end
    (CrossModalHand.py:86-105, 262-346 dispatch): train an epoch on the
    synthetic fixture, eval, checkpoint."""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke_rle.yaml")
    cfg.model_dir = str(tmp_path / "run")
    exp = Experiment(cfg)
    exp.train_baseline()
    assert os.path.exists(os.path.join(cfg.model_dir, "models.txt"))
    ckpts = [d for d in os.listdir(cfg.model_dir) if d.startswith("baseline_")]
    assert ckpts, os.listdir(cfg.model_dir)


def test_experiment_glow_regressor_smoke(tmp_path):
    """MHEnt with the ConditionalGlow posterior through the full Experiment
    (the reference's network.regressor='glow' mode, CrossModalHand.py:101-104)."""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    cfg.network.regressor = "glow"
    cfg.model_dir = str(tmp_path / "run")
    # Skip the in-loop eval: tracing the glow N-hypothesis eval program
    # costs ~70 s on this 1-core host, and glow sampling/eval numerics
    # are pinned by test_glow_rle + test_pallas_glow_sampler — this
    # smoke is about the Experiment TRAIN dispatch with regressor=glow.
    cfg.eval_interval = 99
    # Shrink the posterior (reference shape 512/4/2 is pinned by the glow
    # parity tests; this smoke was a 101 s straggler at full size).
    cfg.network.glow_hidden = 64
    cfg.network.glow_layers = 2
    cfg.network.glow_blocks = 1
    exp = Experiment(cfg)
    exp.train_baseline()
    assert os.path.exists(os.path.join(cfg.model_dir, "models.txt"))
    ckpts = [d for d in os.listdir(cfg.model_dir) if d.startswith("baseline_")]
    assert ckpts, os.listdir(cfg.model_dir)


def test_load_model_before_state_and_train_schedule_rebuild(tmp_path):
    """Two engine regressions: (a) load_model on a fresh Experiment (state
    None) must queue the restore instead of crashing on self.state.params,
    and apply it at the next _ensure_state; (b) _ensure_state(...,
    for_training=True) after an eval-sized init must rebuild the LR
    schedule with the train steps_per_epoch (MultiStepLR milestones fired
    ~eval-set-scale early otherwise), keeping params."""
    import jax

    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    cfg.model_dir = str(tmp_path / "run")
    exp = Experiment(cfg)
    exp._ensure_state(3)
    exp.save_model("snap")
    snap = np.asarray(exp.state.params["det_head"]["l0"]["w"]).copy()

    cfg2 = update_cfg("configs/smoke.yaml")
    cfg2.model_dir = str(tmp_path / "run2")
    cfg2.training.seed = 9  # different init, so the restore is observable
    exp2 = Experiment(cfg2)
    exp2.load_model(os.path.join(cfg.model_dir, "snap"))  # state is None
    assert exp2.state is None and exp2._pending_restore is not None
    exp2._ensure_state(3)  # eval-style sizing; applies the queued restore
    np.testing.assert_array_equal(
        snap, np.asarray(exp2.state.params["det_head"]["l0"]["w"])
    )

    # (b) train-time rebuild: schedule re-sized, params untouched.
    opt_before = exp2.optimizer
    assert exp2.steps_per_epoch == 3
    exp2._ensure_state(40, for_training=True)
    assert exp2.steps_per_epoch == 40
    assert exp2.optimizer is not opt_before
    np.testing.assert_array_equal(
        snap, np.asarray(exp2.state.params["det_head"]["l0"]["w"])
    )
    # A second train-time call with the same sizing is a no-op.
    opt2 = exp2.optimizer
    exp2._ensure_state(40, for_training=True)
    assert exp2.optimizer is opt2


def test_shared_step_programs_across_experiments(tmp_path):
    """Experiments with identical (model, config, mesh, optimizer)
    fingerprints share one optimizer and one jitted train/eval step
    (engine._SHARED_PROGRAMS) — re-tracing a step program costs ~20-60 s
    on a 1-core host, and sweep drivers / test processes build many
    same-shaped Experiments. Any hyperparameter that shapes a program
    (here: lr -> LR schedule) must split the cache entry."""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    def make(tag, **training):
        cfg = update_cfg("configs/smoke.yaml")
        cfg.model_dir = str(tmp_path / tag)
        for k, v in training.items():
            setattr(cfg.training, k, v)
        exp = Experiment(cfg)
        exp._ensure_state(3)
        return exp

    e1, e2 = make("a"), make("b")
    assert e1.optimizer is e2.optimizer
    assert e1._train_step is e2._train_step
    assert e1._get_eval_step(4, 0.8) is e2._get_eval_step(4, 0.8)
    # Different temp -> different eval program; same key again -> cached.
    assert e1._get_eval_step(4, 1.0) is not e2._get_eval_step(4, 0.8)
    assert e1._get_eval_step(4, 1.0) is e2._get_eval_step(4, 1.0)

    e3 = make("c", lr=9e-4)
    assert e3.optimizer is not e1.optimizer
    assert e3._train_step is not e1._train_step

    # States stay per-Experiment even when programs are shared.
    assert e1.state.params is not e2.state.params


def test_eval_only_skips_train_split(tmp_path, monkeypatch):
    """Experiment.eval() must not construct the training dataset (an
    eval-only run paid train-split construction — annotation indexing,
    prefix plumbing, mixed probe items — for nothing)."""
    from mhentropy_tpu.train.engine import Experiment
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    cfg.model_dir = str(tmp_path / "run")
    exp = Experiment(cfg)
    train, evald = exp.make_datasets(which=("eval",))
    assert train is None and evald is not None


def test_eval_with_missing_checkpoint_raises(trained_run):
    """eval(name=...) is an EXPLICIT restore request — a typo'd path must
    raise up front, not silently publish metrics of un-restored params
    (r5 review finding; the soft keeping-init path remains for
    cfg-default paths like the absent ./model/ent_ho3d.pth)."""
    cfg, exp, _, _ = trained_run
    with pytest.raises(FileNotFoundError):
        exp.eval(os.path.join(cfg.model_dir, "no_such_checkpoint"))


def test_build_model_config_preserves_fused_bn_mode_string():
    """bool() must not collapse the 'full' BN-kernel A/B mode to True
    (= 'stats'): the mode string rides EncoderConfig verbatim."""
    from mhentropy_tpu.train.engine import build_model_config
    from mhentropy_tpu.utils.config import update_cfg

    cfg = update_cfg("configs/smoke.yaml")
    for v, want in ((True, True), (False, False), ("full", "full"),
                    ("stats", "stats")):
        cfg.tpu.fused_train_bn = v
        assert build_model_config(cfg).encoder.fused_train_bn == want


def test_eval_step_cache_keys_on_test_quant(trained_run):
    """Mutating cfg.training.test_quant between eval_loop calls must build
    a distinct eval step, not serve the stale cached program (the instance
    key now carries n_quant like the shared-program key does)."""
    _, exp, _, _ = trained_run
    before = len(exp._eval_step)
    exp._get_eval_step(4, 0.8)
    mid = len(exp._eval_step)
    exp.cfg.training.test_quant = 2
    try:
        exp._get_eval_step(4, 0.8)
    finally:
        exp.cfg.training.test_quant = None
    assert len(exp._eval_step) == mid + 1 >= before + 2
