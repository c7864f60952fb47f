import os

import pytest
import yaml

from mhentropy_tpu.utils import config as config_lib


def test_defaults_match_reference_schema():
    cfg = config_lib.get_cfg_defaults()
    # The reference's key groups (configs/config.py:13-71).
    assert cfg.dataset.dataset_name == "rhd"
    assert cfg.dataset.image_size == [256, 256]
    assert cfg.training.mode == "pretrain"
    assert cfg.training.criterion == "ELBOLoss"
    assert cfg.network.enc_type == "BasicEnc"
    assert cfg.network.num_steps == 3
    assert cfg.loss.kl == 0.0001


def test_shipped_yaml_loads_and_overrides():
    cfg = config_lib.update_cfg("configs/ho3d.yaml")
    assert cfg.dataset.dataset_name == "ho3d"
    assert cfg.network.enc_type == "MHEnt"
    assert cfg.network.backbone == "resnet50"
    assert cfg.network.num_steps == 6
    assert cfg.network.h_dims == [512, 512]
    assert cfg.training.test_samples == 200
    assert cfg.training.criterion == "MHEntLoss"
    assert cfg.loss.kl == 0.0


def test_unknown_key_rejected_outside_new_allowed(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("dataset:\n  not_a_key: 1\n")
    cfg = config_lib.get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(bad))


def test_new_allowed_groups_accept_new_keys(tmp_path):
    extra = tmp_path / "extra.yaml"
    extra.write_text("network:\n  brand_new_flag: 7\ntraining:\n  extra: hi\n")
    cfg = config_lib.get_cfg_defaults()
    cfg.merge_from_file(str(extra))
    assert cfg.network.brand_new_flag == 7
    assert cfg.training.extra == "hi"


def test_type_coercion_and_mismatch(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("training:\n  lr: 1\n")  # int -> float coerced
    cfg = config_lib.get_cfg_defaults()
    cfg.merge_from_file(str(f))
    assert isinstance(cfg.training.lr, float) and cfg.training.lr == 1.0

    f.write_text("dataset:\n  image_size: oops\n")
    cfg = config_lib.get_cfg_defaults()
    with pytest.raises(TypeError):
        cfg.merge_from_file(str(f))


def test_clone_is_deep():
    cfg = config_lib.get_cfg_defaults()
    c2 = cfg.clone()
    c2.dataset.dataset_name = "ho3d"
    assert cfg.dataset.dataset_name == "rhd"


def test_dump_roundtrip():
    cfg = config_lib.get_cfg_defaults()
    loaded = yaml.safe_load(cfg.dump())
    assert loaded["dataset"]["jointN"] == 21


def test_all_shipped_configs_build_model_configs():
    from mhentropy_tpu.train import engine

    for name in ("ho3d", "rhd", "freihand", "smoke"):
        cfg = config_lib.update_cfg(f"configs/{name}.yaml")
        mc = engine.build_model_config(cfg)
        assert mc.flow.dim == 45
    rle_cfg = config_lib.update_cfg("configs/rhd_rle.yaml")
    rc = engine.build_rle_config(rle_cfg)
    assert rc.flow.tsfm_on == "x" and rc.flow.dim == 3


def test_every_knob_lands_in_model_config(tmp_path):
    """Every reference-hardcoded knob is YAML-wirable (VERDICT r1 item 5):
    each key set in the YAML must land in the built MHEntConfig."""
    f = tmp_path / "knobs.yaml"
    f.write_text(
        """
dataset: {dataset_name: ho3d}
network:
  enc_type: MHEnt
  num_latent: 64
  backbone: resnet18
  h_dims: [64, 64]
  num_steps: 2
  b_2d: 0.05
  b_3d: 0.07
  T: 2.0
  kld_w: 0.5
  kld_w_annealing: [0.1, 1000]
  w_reg_th: 25
  th3_ref_alpha: 7.0
  bt_alpha: 60.0
  use_chamfer_loss: true
  w_chamfer: 3.0
  use_mask_loss: true
  b_mask: 11.0
training:
  n_train_hypotheses: 4
  test_quant: 8
  eval_temp: 0.5
  test_samples: 16
"""
    )
    from mhentropy_tpu.train import engine

    cfg = config_lib.get_cfg_defaults()
    cfg.merge_from_file(str(f))
    mc = engine.build_model_config(cfg)
    assert mc.b_2d == 0.05
    assert mc.b_3d == 0.07
    assert mc.temperature == 2.0
    assert mc.kld_w == 0.5
    assert mc.kld_w_annealing == (0.1, 1000)
    assert mc.th45_ref_alpha == 25.0
    assert mc.th3_ref_alpha == 7.0
    assert mc.bt_alpha == 60.0
    assert mc.use_chamfer_loss and mc.w_chamfer == 3.0
    assert mc.use_mask_loss and mc.b_mask == 11.0
    assert mc.n_train_hypotheses == 4
    assert cfg.training.test_quant == 8
    assert cfg.training.eval_temp == 0.5


def test_coercion_rejects_lossy_and_mistyped_overlays():
    """yacs-parity strictness (review regressions): int defaults refuse
    fractional overlays (int(0.5)==0 silently disabled weights), bool
    defaults refuse non-bools (bool('false')==True inverted intent),
    and dict-over-None stays attribute-addressable."""
    import pytest

    from mhentropy_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    with pytest.raises(TypeError, match="losslessly"):
        cfg.merge_from_other_cfg({"network": {"w_prior_2d": 0.5}})
    cfg.merge_from_other_cfg({"network": {"w_prior_2d": 2.0}})  # integral OK
    assert cfg.network.w_prior_2d == 2
    with pytest.raises(TypeError, match="bool"):
        cfg.merge_from_other_cfg({"network": {"entropy": "false"}})
    cfg.merge_from_other_cfg({"network": {"pgm": {"a": 1}}})
    assert cfg.network.pgm.a == 1  # CfgNode, not a raw dict


def test_empty_yaml_section_raises_not_nulls_group():
    """A YAML overlay section with every key commented out parses as
    {'training': None}; replacing the group with None would crash far from
    the merge (AttributeError on cfg.training.batch_size). yacs raises at
    merge time — so do we."""
    import pytest

    from mhentropy_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    with pytest.raises(TypeError, match="empty section"):
        cfg.merge_from_other_cfg({"training": None})
    assert cfg.training.batch_size  # group untouched
