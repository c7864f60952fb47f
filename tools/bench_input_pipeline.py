"""Host-side input-pipeline throughput: can this host feed the chip?

Fabricates an on-disk RHD-format dataset (the test fixtures' generator),
then measures sustained imgs/s through the REAL path the trainer uses —
`RHDDataset.__getitem__` (PNG decode, hand-side masking, depth visibility,
crop via the C++ hostops kernel, augmentation, heatmaps) collated by
`data.common.batches(num_workers=4)` + `prefetch`.

Context numbers: the TPU train step consumes 1,611 imgs/s/chip (B=32,
tools/bench_train.py) and a full-host eval scan ~9.8k imgs/s. One v5e
HOST serves 8 chips with ~100+ cores; this box has ONE core, so the
per-core number here x cores/chip decides whether real training is
host-bound — and `parallel/multihost.py` shards the dataset per host
when it is.

Usage: python -m tools.bench_input_pipeline [n_batches] [mode] [cached]
(CPU-only OK; mode = training | evaluation; a third arg enables the
decoded-image disk cache — the first pass populates it, the measured
pass reads it, i.e. the steady state from epoch 2 on.)
"""

import json
import os
import sys
import tempfile
import time


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    mode = sys.argv[2] if len(sys.argv) > 2 else "training"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import fixtures_data

    from mhentropy_tpu.data import common, rhd

    cached = len(sys.argv) > 3

    with tempfile.TemporaryDirectory() as root:
        # 64 distinct samples, cycled: big enough to defeat any warm-file
        # cache advantage of a single sample, small enough to fabricate fast.
        fixtures_data.build_rhd(root, n=64, seed=0)  # builds both splits

        bs = 32
        if cached:
            common.set_decode_cache(os.path.join(root, "_decode_cache"))
            # Populate: one full pass over the 64 samples.
            for _ in common.batches(rhd.load(root, mode), bs, to_device=False):
                pass
        # Measure both target configurations: "full" = the complete
        # reference-parity target, "auto" = the Experiment defaults
        # (heavy unconsumed fields skipped, uint8 image transport,
        # device-side st — engine.make_datasets).
        for label, kw in (
            ("full", dict()),
            ("auto", dict(heavy_fields=set(), image_u8=True,
                          device_st=True)),
        ):
            ds = rhd.load(root, mode, **kw)
            # Warm one epoch-fragment (imports, BAD_TRAIN path, numpy pools).
            next(iter(common.batches(ds, bs, to_device=False)))

            t0 = time.perf_counter()
            n_imgs = 0
            it = common.prefetch(
                _cycle_batches(common, ds, bs, n_batches), size=2
            )
            for images, target in it:
                n_imgs += images.shape[0]
            wall = time.perf_counter() - t0
            per_core = n_imgs / wall
            print(json.dumps({
                "metric": "host input pipeline (RHD preprocess, num_workers=4"
                          + (", decode-cached)" if cached else ")"),
                "target_fields": label,
                "imgs_per_sec_per_core": round(per_core, 1),
                "train_step_demand_imgs_s": 1611,
                "cores_needed_per_chip": round(1611 / per_core, 1),
            }))
    return 0


def _cycle_batches(common, ds, bs, n_batches):
    made = 0
    while made < n_batches:
        for b in common.batches(ds, bs, shuffle=True, seed=made,
                                to_device=False):
            yield b
            made += 1
            if made >= n_batches:
                return


if __name__ == "__main__":
    sys.exit(main())
