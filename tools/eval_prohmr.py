"""Human-body multi-hypothesis evaluation (BASELINE config 5): SMPL
conditional flow, 3DPW-style BH-MPJPE.

Runs on a synthetic SMPL fixture when no data/weights are given (so the whole
human pipeline is exercisable anywhere):

    python -m tools.eval_prohmr            # synthetic smoke
    python -m tools.eval_prohmr --smpl SMPL_NEUTRAL.pkl --pth smpl_flow.pt
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smpl", default=None, help="SMPL pkl (synthetic if absent)")
    ap.add_argument("--pth", default=None, help="converted SMPL-flow weights")
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mhentropy_tpu.core import smpl as smpl_lib
    from mhentropy_tpu.models import prohmr

    if args.smpl:
        model = smpl_lib.load_smpl_pkl(args.smpl)
    else:
        model = smpl_lib.synthetic_smpl_model(0)
        print("using the synthetic SMPL fixture (pass --smpl for the real model)")

    cfg = prohmr.ProHMRConfig()
    params, stats = prohmr.init(jax.random.key(0), cfg)
    if args.pth:
        from tools.convert_torch import load_prohmr_smpl_flow

        params["flow"] = load_prohmr_smpl_flow(args.pth, cfg.flow)

    b, n = args.batch, args.n
    # Synthetic "3DPW" batch: GT poses from the flow's own prior mode so the
    # metric machinery is exercised end to end.
    key = jax.random.key(1)
    image = jax.random.uniform(key, (b, cfg.image_size, cfg.image_size, 3))
    gt_rotmats = jnp.tile(jnp.eye(3), (b, 24, 1, 1))
    _, gt_joints = smpl_lib.smpl_forward(model, gt_rotmats, jnp.zeros((b, 10)))

    samples = prohmr.sample_hypotheses(
        model, params, stats, cfg, image, jax.random.key(2), n=n
    )
    mets = prohmr.multi_hypothesis_metrics(samples, {"joints3d": gt_joints})
    print(f"N={n} hypotheses over {b} images")
    print(f"BH-MPJPE:   {float(np.mean(np.asarray(mets['mpjpe_bh']))):.2f} mm")
    print(f"mean MPJPE: {float(np.mean(np.asarray(mets['mpjpe_mean']))):.2f} mm")
    print(f"3D PJD:     {float(np.mean(np.asarray(mets['pjd_3d']))):.2f} mm")


if __name__ == "__main__":
    main()
