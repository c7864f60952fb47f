"""Honest full-pipeline A/B: int8 W8A8 encoder (models/quant.py) vs the
shipped bf16 eval path, same methodology as bench.py (scanned steps,
per-step perturbed images, full-output carry reductions).

Both sides run in ONE process so relay conditions are identical.
Prints one JSON line per side + a summary line.

Usage: python tools/bench_quant.py [n_hypo] [batch] [steps] [q_from]
(q_from=0 also quantizes stage 1 — the Pallas stage-1 kernel only runs
on unquantized stages, so this A/Bs int8 XLA stage 1 vs the kernel.)
A 5th arg "sampler" adds a third side: int8 encoder + the int8 fused
RealNVP sampler (flows/pallas_sampler_int8.py).
"""
import json
import sys
import time

from mhentropy_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

from mhentropy_tpu.core import mano
from mhentropy_tpu.flows.realnvp import RealNVPConfig
from mhentropy_tpu.models import mhent, quant
from mhentropy_tpu.models.encoder import EncoderConfig
from mhentropy_tpu.models.mhent import MHEntConfig


def main():
    n_hypo = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 250
    q_from = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    img = 256
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet50", n_latent=(512, 512)),
        flow=RealNVPConfig(dim=45, cond_dim=512, h_dim=512, num_steps=6),
        feat_dim=512, image_size=img,
    )
    model = mano.synthetic_mano_model(0)
    params, batch_stats = mhent.init(jax.random.key(0), cfg)
    key = jax.random.key(1)
    image = jax.random.uniform(
        jax.random.key(2), (batch, img, img, 3)) * 2 - 1

    spec, qtree = quant.quantize_encoder(
        params["encoder"], batch_stats, cfg.encoder, image, q_from=q_from)
    if len(sys.argv) > 5 and sys.argv[5] in ("fused", "mid", "s8"):
        # "fused": stage-1 kernel emits channel-major s8 straight into
        # the CM-input stage-2 kernel; "mid": standalone NHWC stage-2/3
        # kernels; "s8": stage-1 emits pre-quantized NHWC s8 for XLA
        # stage 2. All three are measured-loss configs kept opt-in for
        # re-measurement (docs/PERF.md).
        spec = spec._replace(
            pallas_mid=True if sys.argv[5] == "mid" else sys.argv[5])

    def run_side(tag, qt):
        def one_step(params, batch_stats, image, k):
            out = mhent.sample_hypotheses(
                model, params, batch_stats, cfg, image, k, n=n_hypo,
                temp=0.8, mods=("xyz", "uv"),
                quant=(spec, qt) if qt is not None else None)
            return out["xyz"], out["uv"]

        @jax.jit
        def scan_steps(params, batch_stats, image, k):
            def body(carry, kk):
                img_k = image + jax.random.uniform(kk, (1,)) * 1e-6
                xyz, uv = one_step(params, batch_stats, img_k, kk)
                return carry + (xyz.sum() + uv.sum()) * 1e-20, None

            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(k, steps))
            return acc

        jax.block_until_ready(scan_steps(params, batch_stats, image, key))
        rates = []
        for r in range(3):
            t0 = time.perf_counter()
            acc = scan_steps(params, batch_stats, image,
                             jax.random.fold_in(key, r))
            jax.block_until_ready(acc)
            rates.append(n_hypo * batch * steps / (time.perf_counter() - t0))
        rate = max(rates)
        print(json.dumps({
            "metric": f"full pipeline, {tag} encoder (N={n_hypo}, B={batch})",
            "value": round(rate, 1), "unit": "hypos/s",
            "ms_per_step": round(n_hypo * batch / rate * 1000, 3),
            "rounds": [round(x, 1) for x in rates],
        }), flush=True)
        return rate

    base = run_side("bf16", None)
    q = run_side(f"int8 W8A8 (q_from={q_from})", qtree)
    print(json.dumps({"metric": "int8 speedup", "value": round(q / base, 4)}))
    if len(sys.argv) > 5 and sys.argv[5] == "sampler":
        from mhentropy_tpu.flows import pallas_sampler_int8 as q8

        feat = quant.encoder_feat(spec, qtree, params["encoder"], image)
        qtree["flow"] = q8.quantize_sampler(
            params["flow"], cfg.flow, feat, jax.random.key(3), n=16)
        spec = spec._replace(int8_sampler=True)
        qs = run_side(f"int8 W8A8 + int8 sampler (q_from={q_from})", qtree)
        print(json.dumps({"metric": "int8 sampler speedup vs int8 encoder",
                          "value": round(qs / q, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
