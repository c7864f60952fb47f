"""Checkpoint-compatibility guard: the flagship param-tree schema (paths +
shapes) is pinned to a golden file. If this fails, orbax checkpoints and
converted .pth weights from earlier builds stop loading — either restore
the structure or consciously regenerate the golden (see failure message).
Uses jax.eval_shape: no compute, safe at full ho3d.yaml scale."""

import json
import os

import jax
import pytest

from mhentropy_tpu.models import mhent
from mhentropy_tpu.train import engine
from mhentropy_tpu.utils.config import update_cfg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_param_schema_ho3d.json")


def _schema():
    cfg = update_cfg("configs/ho3d.yaml")
    model_cfg = engine.build_model_config(cfg)
    params, batch_stats = jax.eval_shape(
        lambda k: mhent.init(k, model_cfg), jax.random.key(0)
    )
    flat = {}
    for tree, prefix in ((params, "params"), (batch_stats, "batch_stats")):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = prefix + jax.tree_util.keystr(path)
            flat[key] = [list(leaf.shape), str(leaf.dtype)]
    return flat


def test_param_tree_schema_stable():
    got = _schema()
    if not os.path.exists(GOLDEN):  # pragma: no cover
        pytest.fail(f"golden file missing: {GOLDEN}")
    want = json.load(open(GOLDEN))
    assert got == want, (
        "Param-tree schema changed — existing checkpoints/converted weights "
        "will no longer load. If intentional, regenerate with:\n"
        "  python -c \"import json, tests.test_param_schema as t; "
        "json.dump(t._schema(), open(t.GOLDEN, 'w'), indent=0, sort_keys=True)\""
    )
