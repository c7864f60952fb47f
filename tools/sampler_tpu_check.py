"""On-TPU numeric check of the int8 fused RealNVP sampler
(flows/pallas_sampler_int8.py) against the exact XLA emulation of its
quantized arithmetic, plus the distance to the float sampler.

Interpret-mode tests cannot see Mosaic lowering behavior (the stage-1
int8 kernel's pre-quantize MXU transpose truncated activations to bf16
and was exact in interpret mode yet 42% wrong on-chip — CLAUDE.md);
this is the on-chip gate for the sampler kernel. One JSON line.

Usage: python -m tools.sampler_tpu_check [B N]   (default 32 100)
Budget: kernel-vs-emulation rel < 1e-3 (both run the same integer
arithmetic; i32 accumulation is exact, the f32 epilogues associate
identically); quant-vs-float tracks PTQ error (reported, not gated).
"""

import json
import sys


def main():
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mhentropy_tpu.flows import pallas_sampler_int8 as q8
    from mhentropy_tpu.flows import pallas_sampler as ps
    from mhentropy_tpu.flows import realnvp
    from mhentropy_tpu.flows.realnvp import RealNVPConfig

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    cfg = RealNVPConfig(dim=45, cond_dim=512, h_dim=512, num_steps=6)
    params = realnvp.init_params(jax.random.key(0), cfg)
    # Scale the near-identity init up so the couplings do real work
    # (s/t excursions comparable to a trained flow's).
    params = jax.tree.map(
        lambda v: v * 25.0 if v is not None and v.ndim == 3 else v, params)
    params = params._replace(
        masks=jnp.asarray(realnvp.default_masks(cfg.dim, cfg.num_steps)))
    feat = jax.random.normal(jax.random.key(1), (b, cfg.cond_dim))
    ftree = q8.quantize_sampler(params, cfg, feat, jax.random.key(2), n=16)

    key = jax.random.key(3)
    x_k, lp_k = q8.sample_fused_q(params, cfg, ftree, key, feat, n,
                                  temp=0.8, return_log_prob=True,
                                  emulate=False)
    x_e, lp_e = q8.sample_fused_q(params, cfg, ftree, key, feat, n,
                                  temp=0.8, return_log_prob=True,
                                  emulate=True)
    x_f, lp_f = ps.sample_fused(params, cfg, key, feat, n, temp=0.8,
                                return_log_prob=True)

    x_k, x_e, x_f = map(np.asarray, (x_k, x_e, x_f))
    lp_k, lp_e, lp_f = map(np.asarray, (lp_k, lp_e, lp_f))

    def rel(a, bb):
        return float(np.abs(a - bb).mean() / (np.abs(bb).mean() + 1e-9))

    def cos(a, bb):
        return float((a * bb).sum()
                     / (np.linalg.norm(a) * np.linalg.norm(bb) + 1e-9))

    out = {
        "shape": [b, n],
        "kernel_vs_emulation_rel": rel(x_k, x_e),
        "kernel_vs_emulation_cos": cos(x_k, x_e),
        "kernel_vs_emulation_lp_maxabs": float(np.abs(lp_k - lp_e).max()),
        "quant_vs_float_rel": rel(x_k, x_f),
        "quant_vs_float_cos": cos(x_k, x_f),
        "quant_vs_float_lp_rel": rel(lp_k, lp_f),
        "ok": rel(x_k, x_e) < 1e-3 and cos(x_k, x_e) > 0.9999,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
