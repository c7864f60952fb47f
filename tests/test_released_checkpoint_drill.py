"""End-to-end drill of the released-checkpoint path (VERDICT r4 item 2).

Fabricates a FULL `ent_ho3d.pth` with the exact reference schema — every
key `CrossModalHand.save_model` writes (CrossModalHand.py:573-587) for the
shipped ho3d.yaml config:

  - 'decoderPose': {}  (decoder_type: id -> nn.Identity, no params)
  - 'encoderRGB': the MHEnt module state_dict (network.py:309-441):
      feat_extractor.res.*      torchvision resnet50 naming, fc=Identity
      feat_extractor.l1.0.*     Linear(2048, 512)   (BasicEnc heads)
      feat_extractor.l2.0.*     Linear(2048, 512)
      q_z_giv_i.*               the ACTUAL reference RealNVP module
                                (hand/flows.py, importable standalone)
      det_head.0.* / det_head.2.*  Linear(512,512) / Linear(512,16)
      mano_dec.th_*             ManoLayer buffers (manolayer.py:71-99) —
                                fabricated shapes; the converter must
                                skip them, not trip over them

then drives `tools/eval_released_checkpoint.py` UNMODIFIED (its real
main(), argv and all) through convert -> restore -> N-hypothesis eval ->
README-table metrics on a fabricated on-disk HO3D split. The day a real
ent_ho3d.pth appears, the procedure is a file copy.
"""

import io
import os
import re
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/hand"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference not mounted")


def _reference_realnvp_state_dict(seed=3):
    """The actual torch reference flow (hand/flows.py) at the ho3d.yaml
    shape: dim=45, tsfm_on=512, h_dims=[512,512], num_steps=6."""
    sys.path.insert(0, REF)
    try:
        import flows as ref_flows
    finally:
        sys.path.pop(0)
    torch.manual_seed(seed)
    flow = ref_flows.RealNVP(
        dim=45, tsfm_on=512, kemb=False, jointN=21,
        h_dims=[512, 512], num_steps=6,
    )
    return flow.state_dict()


def _mano_dec_buffers(rng):
    """ManoLayer's registered buffers (manopth/manolayer.py:71-99) at the
    real MANO shapes; values are fabricated (the converter ignores them,
    our pipeline uses its own MANO assets)."""
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype("f4"))
    return {
        "th_betas": t(1, 10),
        "th_shapedirs": t(778, 3, 10),
        "th_posedirs": t(778, 3, 135),
        "th_v_template": t(1, 778, 3),
        "th_J_regressor": t(16, 778),
        "th_weights": t(778, 16),
        "th_faces": torch.from_numpy(
            rng.integers(0, 778, (1538, 3)).astype("i8")),
        "th_hands_mean": t(1, 45),
        "th_comps": t(45, 45),
        "th_selected_comps": t(45, 45),
    }


@pytest.fixture(scope="module")
def fabricated_pth(tmp_path_factory):
    from tests.test_resnet_parity_torch import (
        TorchBottleneck, TorchResNet, _randomize)

    res = TorchResNet(TorchBottleneck, [3, 4, 6, 3])
    _randomize(res, seed=11)
    torch.manual_seed(12)
    l1 = torch.nn.Linear(2048, 512)
    l2 = torch.nn.Linear(2048, 512)
    det0 = torch.nn.Linear(512, 512)
    det2 = torch.nn.Linear(512, 16)  # th3(3) + bt(10) + logs(1) + t(2)

    enc_sd = {}
    for k, v in res.state_dict().items():
        enc_sd[f"feat_extractor.res.{k}"] = v
    for mod, name in ((l1, "l1"), (l2, "l2")):
        for p in ("weight", "bias"):
            enc_sd[f"feat_extractor.{name}.0.{p}"] = mod.state_dict()[p]
    for k, v in _reference_realnvp_state_dict().items():
        enc_sd[f"q_z_giv_i.{k}"] = v
    for mod, idx in ((det0, "0"), (det2, "2")):
        for p in ("weight", "bias"):
            enc_sd[f"det_head.{idx}.{p}"] = mod.state_dict()[p]
    rng = np.random.default_rng(13)
    for k, v in _mano_dec_buffers(rng).items():
        enc_sd[f"mano_dec.{k}"] = v

    path = tmp_path_factory.mktemp("released") / "ent_ho3d.pth"
    torch.save({"decoderPose": {}, "encoderRGB": enc_sd}, str(path))
    return str(path)


def test_eval_released_checkpoint_cli_end_to_end(
        fabricated_pth, tmp_path_factory, monkeypatch, capsys):
    """The real main(), unmodified, from argv to the README-table print."""
    import jax

    from tests import fixtures_data
    from tools import eval_released_checkpoint

    data_root = str(fixtures_data.build_ho3d(
        str(tmp_path_factory.mktemp("ho3d")), n_train=1, n_eval=2, seed=7))
    mano_dir = str(tmp_path_factory.mktemp("mano"))  # empty -> synthetic

    monkeypatch.chdir(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # configs/ho3d.yaml is repo-relative
    monkeypatch.setattr(sys, "argv", [
        "eval_released_checkpoint",
        "--pth", fabricated_pth,
        "--data", data_root,
        "--mano", mano_dir,
        "--batch", "2",
        "--n", "4",
    ])
    # The script repoints the process compile cache (its own
    # enable_compilation_cache, which also raises min_compile_time to 1 s);
    # restore EVERY knob the conftest depends on afterwards — a leaked
    # min_compile_time=1.0 would silently stop sub-second compiles from
    # warming the suite cache for the rest of the run.
    prior = {k: getattr(jax.config, k) for k in (
        "jax_compilation_cache_dir",
        "jax_persistent_cache_min_compile_time_secs",
        "jax_persistent_cache_min_entry_size_bytes",
        "jax_persistent_cache_enable_xla_caches",
    )}
    try:
        eval_released_checkpoint.main()
    finally:
        for k, v in prior.items():
            jax.config.update(k, v)

    out = capsys.readouterr().out
    assert "evaluation split: 2 samples" in out
    assert "README-table metrics" in out
    # Every table line parses to a finite number (garbage-in converter or
    # metric plumbing shows up as nan/inf here).
    vals = re.findall(
        r"(?:MPJPE|AH 2D EPE|2D Vis PJD|3D Occ PJD)[^:]*:\s+([-\d.]+)", out)
    assert len(vals) == 4, out
    assert all(np.isfinite(float(v)) for v in vals), out


def test_converter_consumes_full_schema(fabricated_pth):
    """load_torch_checkpoint maps every module the schema carries: encoder
    (backbone + both heads), flow, det_head, batch stats — and tolerates
    the mano_dec buffers + empty decoderPose without warnings."""
    import jax

    from mhentropy_tpu.train import engine
    from mhentropy_tpu.utils.config import update_cfg
    from tools.convert_torch import load_torch_checkpoint

    cfg = update_cfg(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "ho3d.yaml"))
    model_cfg = engine.build_model_config(cfg)

    err = io.StringIO()
    old_err = sys.stderr
    try:
        sys.stderr = err
        params = load_torch_checkpoint(fabricated_pth, model_cfg)
    finally:
        sys.stderr = old_err
    assert "WARNING" not in err.getvalue(), err.getvalue()

    assert set(params) == {"encoder", "flow", "det_head", "_batch_stats"}
    enc = params["encoder"]
    assert {"backbone", "l1", "l2"} <= set(enc)
    assert enc["l1"]["w"].shape == (2048, 512)
    assert params["det_head"]["l1"]["w"].shape == (512, 16)
    # Flow params stacked over the ho3d n_layers with the cond projections.
    assert params["flow"].s_w0.shape[0] == model_cfg.flow.n_layers
    assert params["flow"].s_c0 is not None
    # Batch stats landed for every BN in the torch tree.
    flat = jax.tree_util.tree_leaves(params["_batch_stats"])
    assert len(flat) > 100  # resnet50: 53 BNs x (mean, var)
