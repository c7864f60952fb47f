"""Real-data epoch wall time on the TPU: old vs new input transport.

The synthetic-array benches (bench.py, bench_train.py) stage data on
device once, so they cannot see host->device transfer cost. This tool
drives the REAL product path — on-disk RHD -> loader -> collate ->
prefetch -> `Experiment.eval_loop` / `train_loop` on the actual chip —
and A/Bs the round-3 input-transport work:

  old: cfg.tpu.target_fields="full", image_u8=False  (f32 images + every
       reference target field crosses the relay)
  new: the defaults — "auto" fields + uint8 images
  new+scache: additionally cfg.tpu.sample_cache — eval items served from
       the preprocessed-sample disk cache (data/cached.py) and train
       items from the RHD deterministic-prefix cache (steady state from
       the 2nd epoch, which the warm+measured pair reproduces)

Context: a B=32 f32 image batch alone is ~25 MB of H2D (~30 ms through
the relay, docs/PERF.md "uint8 image transport") against a 19.9 ms train
step / ~4 ms eval step — the old transport makes real epochs
transfer-bound.

Usage: python -m tools.bench_epoch_io [n_samples] [mode] [dataset]
(mode = eval | train | both; dataset = rhd | ho3d | freihand. Runs each
epoch twice and reports the second, warm-jit, wall time. TPU via ambient
env; ~2 compiles per transport variant on first run. The ho3d dataset
exercises the train-mode uint8 transport with the device-side
`_pixel_noise` factors — the f32 train path was HO3D's last 4x-H2D
batch. freihand exercises the r5 prefix cache; its eval split is
eval_fraction=0.1 of n, so rates are reported per actual split length.)
"""

import json
import os
import sys
import tempfile
import time


def _make_cfg(data_dir, model_dir, u8: bool, fields: str, bs: int,
              sample_cache: bool = False, dataset: str = "rhd"):
    from mhentropy_tpu.utils.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    img = 224 if dataset == "freihand" else 256  # loaders' native sizes
    cfg.merge_from_other_cfg({
        "model_dir": model_dir + "/",
        "info_interval": 10_000,  # per-log D2H fetches would skew the wall
        "dataset": {"dataset_name": dataset, "image_size": [img, img]},
        "network": {
            "enc_type": "MHEnt", "input": "image", "num_latent": 64,
            "backbone": "resnet50", "decoder_type": "mano",
            "tsfm_on": 64, "h_dims": [64, 64], "num_steps": 12,
            "regressor": "realnvp", "entropy": True,
        },
        "training": {
            "mode": "evaluation", "batch_size": bs, "seed": 0,
            "criterion": "MHEntLoss", "test_samples": 100,
        },
        "tpu": {
            "mesh_hypo": 1,
            "data_dir": data_dir,
            "decode_cache": os.path.join(data_dir, "_decode_cache"),
            "image_u8": u8,
            # The "old" row must pin the pre-optimisation behavior; u8
            # tracks the same flag so one knob drives the whole variant.
            "device_st": u8,
            "target_fields": fields,
            "sample_cache": os.path.join(data_dir, "_sample_cache")
            if sample_cache else None,
        },
    })
    return cfg


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mode = sys.argv[2] if len(sys.argv) > 2 else "eval"
    dataset = sys.argv[3] if len(sys.argv) > 3 else "rhd"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import fixtures_data

    from mhentropy_tpu.train.engine import Experiment

    with tempfile.TemporaryDirectory() as root:
        if dataset == "ho3d":
            # n train frames AND n eval frames (the splits are disjoint
            # sequences), so both loops see n items either way.
            fixtures_data.build_ho3d(root, n_train=n, n_eval=n, seed=0)
        elif dataset == "freihand":
            fixtures_data.build_freihand(root, n=n, seed=0)
        else:
            fixtures_data.build_rhd(root, n=n, seed=0)
        results = {}
        for label, (fields, u8, scache) in (
            ("old_full_f32", ("full", False, False)),
            ("new_auto_u8", ("auto", True, False)),
            ("new_auto_u8_scache", ("auto", True, True)),
        ):
            cfg = _make_cfg(root, os.path.join(root, f"run_{label}"), u8,
                            fields, bs=32, sample_cache=scache,
                            dataset=dataset)
            exp = Experiment(cfg)
            train_data, eval_data = exp.make_datasets()
            if mode in ("eval", "both"):
                n_ev = len(eval_data)  # freihand: eval_fraction of n
                exp.eval_loop(eval_data)  # compile + cache warm
                t0 = time.perf_counter()
                exp.eval_loop(eval_data)
                wall = time.perf_counter() - t0
                results[f"eval_wall_s_{label}"] = round(wall, 2)
                results[f"eval_imgs_per_s_{label}"] = round(n_ev / wall, 1)
            if mode in ("train", "both"):
                n_tr = len(train_data)
                exp._ensure_state(max(1, n_tr // 32))
                exp.train_epoch(train_data, 0)  # compile + cache warm
                t0 = time.perf_counter()
                exp.train_epoch(train_data, 1)
                wall = time.perf_counter() - t0
                results[f"train_wall_s_{label}"] = round(wall, 2)
                results[f"train_imgs_per_s_{label}"] = round(n_tr / wall, 1)
        out = {"metric":
               f"real-data {dataset.upper()} epoch wall (n={n}, B=32, TPU)"}
        out.update(results)
        for kind in ("eval", "train"):
            ko, kn = (f"{kind}_wall_s_old_full_f32",
                      f"{kind}_wall_s_new_auto_u8")
            if ko in results and results[kn]:
                out[f"{kind}_speedup"] = round(results[ko] / results[kn], 2)
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
