"""Honest full-pipeline A/B of the fused Pallas glow sampler at ProHMR
shapes (VERDICT r2 item 7): resnet50-224 context -> ConditionalGlow(144,
1024, 4, 2, ctx 2048) sample -> SMPL 6D decode -> weak-perspective
projection, N hypotheses per image, scanned steps with per-step-varied
images and full output reduction into the carry (the methodology rules of
docs/PERF.md — anything less reads impossibly fast through the relay).

Usage: python -m tools.bench_prohmr [xla|fused|quant|both]
Prints one JSON line per variant. "quant" = fused sampler + int8 W8A8
context encoder (models/quant.py, weights baked as jit constants — the
fixed-checkpoint deployment shape).
"""

import json
import sys
import time


def run(variant: str, n_hypo=100, batch=32, steps=50):
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from mhentropy_tpu.core import smpl as smpl_lib
    from mhentropy_tpu.models import prohmr

    import os

    cfg = prohmr.ProHMRConfig(use_pallas_sampler=(variant in ("fused", "quant")))
    # Stage-1 kernel A/B toggle (docs/PERF.md); default = EncoderConfig's.
    if os.environ.get("MHENT_PALLAS_STAGE1") in ("0", "1"):
        cfg = cfg._replace(encoder=cfg.encoder._replace(
            pallas_stage1=os.environ["MHENT_PALLAS_STAGE1"] == "1"))
    model = smpl_lib.synthetic_smpl_model(0)
    params, batch_stats = prohmr.init(jax.random.key(0), cfg)
    img = cfg.image_size

    quant_arg = None
    if variant == "quant":
        from mhentropy_tpu.models import quant

        image0 = jax.random.uniform(
            jax.random.key(2), (batch, img, img, 3)) * 2 - 1
        quant_arg = quant.quantize_encoder(
            params["encoder"], batch_stats, cfg.encoder, image0)

    def one_step(params, batch_stats, image, key):
        out = prohmr.sample_hypotheses(
            model, params, batch_stats, cfg, image, key, n=n_hypo, temp=1.0,
            quant=quant_arg,
        )
        return out["joints3d"], out["uv"], out["log_q"]

    @jax.jit
    def scan_steps(params, batch_stats, image, key):
        def body(carry, k):
            img_k = image + jax.random.uniform(k, (1,)) * 1e-6
            j3, uv, lq = one_step(params, batch_stats, img_k, k)
            return carry + (j3.sum() + uv.sum() + lq.sum()) * 1e-20, None

        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, steps))
        return acc

    key = jax.random.key(1)
    image = jax.random.uniform(jax.random.key(2), (batch, img, img, 3)) * 2 - 1
    jax.block_until_ready(scan_steps(params, batch_stats, image, key))
    rates = []
    for r in range(3):
        t0 = time.perf_counter()
        acc = scan_steps(params, batch_stats, image, jax.random.fold_in(key, r))
        jax.block_until_ready(acc)
        rates.append(n_hypo * batch * steps / (time.perf_counter() - t0))
    rate = max(rates)
    print(json.dumps({
        "metric": f"prohmr hypos/s/chip (N={n_hypo}, B={batch}, {variant})",
        "value": round(rate, 1),
        "unit": "hypos/s",
        "ms_per_step": round(n_hypo * batch / rate * 1000, 3),
        "rounds": [round(x, 1) for x in rates],
    }), flush=True)
    return rate


def main(argv):
    which = argv[0] if argv else "both"
    if which == "both":
        a = run("xla")
        b = run("fused")
        print(json.dumps({"fused_speedup": round(b / a, 3)}), flush=True)
    else:
        run(which)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
