"""Reproduce the reference's HO3D results table with its released checkpoint.

The reference's only integration test is social: the README reproduction
table (hand/README.md:46-50 — MPJPE 20.55mm / AH 16.95px / PJD 3.30px /
11.93mm) from `./model/ent_ho3d.pth` with configs/ho3d.yaml. This script is
that procedure in this framework:

    python -m tools.eval_released_checkpoint \
        --pth ./model/ent_ho3d.pth \
        --data ./datasets \
        --mano ./mano

It converts the torch weights (tools/convert_torch), loads the real HO3D
eval split (the held-out ABF14/MC5/SB14/ShSu13 sequences), runs N=200
hypotheses at temp 0.8 through the TPU pipeline, and prints the same metric
names as the README table. Requires the HO3D_v3 download, the released .pth
and MANO_RIGHT.pkl — none of which ship with the repo (the reference's
.gitignore excludes them too).
"""

from __future__ import annotations

import argparse



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True, help="released ent_ho3d.pth")
    ap.add_argument("--data", required=True, help="datasets root (HO3D_v3)")
    ap.add_argument("--mano", default="./mano/", help="MANO pkl dir")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=200)
    args = ap.parse_args()

    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from mhentropy_tpu.data import common, ho3d
    from mhentropy_tpu.train import engine, metrics as metrics_lib
    from mhentropy_tpu.utils.config import update_cfg
    from mhentropy_tpu.utils.logging import AverageMeter
    from tools.convert_torch import load_torch_checkpoint

    cfg = update_cfg("configs/ho3d.yaml")
    model_cfg = engine.build_model_config(cfg)
    mano_model = engine.load_mano_model(args.mano)

    params = load_torch_checkpoint(args.pth, model_cfg)
    batch_stats = params.pop("_batch_stats", {})
    if not params:
        raise SystemExit(f"no modules found in {args.pth}")

    dataset = ho3d.load(args.data, mode="evaluation")
    print(f"evaluation split: {len(dataset)} samples")

    from mhentropy_tpu.models import mhent

    @jax.jit
    def eval_step(params, batch_stats, image, target, key):
        samples = mhent.sample_hypotheses(
            mano_model, params, batch_stats, model_cfg, image, key,
            n=args.n, n_quant=args.n, temp=0.8,
        )
        out = dict(samples)
        out["log_p"] = jax.numpy.zeros(image.shape[0])
        _, _, mets = metrics_lib.mhent_metrics(out, target)
        return {k: v.mean() for k, v in mets.items()}

    key = jax.random.key(0)
    meters: dict = {}
    batch_mets = []
    # pad_remainder keeps the tail samples — the reference's eval
    # DataLoader has no drop_last (CrossModalHand.py:176-179), so a
    # truncated split would skew the README-table comparison. Metric
    # fetches are deferred to ONE device_get (a per-scalar fetch costs
    # ~25 ms of relay round trip per batch — docs/PERF.md).
    for image, target in common.prefetch(
            common.batches(dataset, args.batch, pad_remainder=True)):
        key, k = jax.random.split(key)
        batch_mets.append(eval_step(params, batch_stats, image, target, k))
    for mets in jax.device_get(batch_mets):
        n_valid = float(mets.pop("n_valid", args.batch))
        for name, v in mets.items():
            meters.setdefault(name, AverageMeter()).update(float(v), n=n_valid)

    print("\n=== README-table metrics (hand/README.md:46-50) ===")
    print(f"MPJPE (BH, mm):   {meters['eucLoss_3d_rgb_sample'].avg * 1000:.2f}"
          "   (reference: 20.55)")
    print(f"AH 2D EPE (px):   {meters['eucLoss_2d_rgb_vis_mean'].avg:.2f}"
          "   (reference: 16.95)")
    print(f"2D Vis PJD (px):  {meters['eucLoss_2d_rgb_vis_std'].avg:.2f}"
          "   (reference: 3.30)")
    print(f"3D Occ PJD (mm):  {meters['eucLoss_3d_rgb_invis_std'].avg * 1000:.2f}"
          "   (reference: 11.93)")


if __name__ == "__main__":
    main()
