"""Benchmark: hypotheses/sec/chip at N=100 on the flagship MHEnt pipeline
(resnet50 conditioning + 12-layer conditional RealNVP + full MANO decode +
orthographic reprojection, i.e. everything network.py:846-883 does per
hypothesis).

Two measurements:
  - pipelined (headline): 250 steps inside one jitted lax.scan — sustained
    device throughput, the number an eval loop with pipelined dispatch sees.
  - per_call: one dispatch per step from Python. On this 1-core host the
    per-call number includes ~3 ms of host dispatch overhead per step, which
    understates chip throughput by ~45% (measured r2: 438k vs 789k).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.json target of 20k hypotheses/sec/chip.
"""

import json
import os
import sys
import time


def main():
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mhentropy_tpu.core import mano
    from mhentropy_tpu.flows.realnvp import RealNVPConfig
    from mhentropy_tpu.models import mhent
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    # Optional overrides (e.g. `python bench.py 200 64` for the shipped
    # README-table eval shape); bare invocation = the driver's headline.
    n_hypo = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    img = 256
    # The relay costs ~25 ms per dispatch round-trip (device-side timeline
    # is ~100% occupied — profiled r2/r3); scanned steps amortize it. 250
    # steps matches a sustained eval epoch (the shipped HO3D split is ~340
    # steps at B=32): at 100 steps the RTT was still 250 us/step = 7% of
    # the 3.2 ms device-busy step.
    steps = 250

    # A/B toggles for kernel-default studies (docs/PERF.md); the bare
    # invocation the driver uses takes the EncoderConfig defaults.
    enc_overrides = {}
    for var, field in (("MHENT_PALLAS_STAGE1", "pallas_stage1"),
                       ("MHENT_PALLAS_STEM", "pallas_stem")):
        if os.environ.get(var) in ("0", "1"):
            enc_overrides[field] = os.environ[var] == "1"
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet50", n_latent=(512, 512),
                              **enc_overrides),
        flow=RealNVPConfig(dim=45, cond_dim=512, h_dim=512, num_steps=6),
        feat_dim=512,
        image_size=img,
    )
    model = mano.synthetic_mano_model(0)
    params, batch_stats = mhent.init(jax.random.key(0), cfg)

    def one_step(params, batch_stats, image, key):
        out = mhent.sample_hypotheses(
            model, params, batch_stats, cfg, image, key, n=n_hypo, temp=0.8,
            mods=("xyz", "uv"),
        )
        return out["xyz"], out["uv"]

    step = jax.jit(one_step)

    @jax.jit
    def scan_steps(params, batch_stats, image, key):
        def body(carry, k):
            # Derive a per-step image from the key: without this, the image
            # is loop-invariant and XLA hoists the WHOLE ENCODER out of the
            # scan (verified in a profile — conv ops appeared x1, not
            # x STEPS), inflating the rate ~1.6x.
            img_k = image + jax.random.uniform(k, (1,)) * 1e-6
            xyz, uv = one_step(params, batch_stats, img_k, k)
            # Full reductions in the carry: a single-element dependency
            # (xyz[0,0,0]) lets XLA prune most of the decode out of the
            # loop (verified — a [0,0] carry made a scanned resnet50 report
            # an impossible 0.03 ms/step).
            return carry + (xyz.sum() + uv.sum()) * 1e-20, None

        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, steps))
        return acc

    # Per-run nonce in the key: the relay serves repeated identical
    # (program, args) executions from a cache (CLAUDE.md) — inputs vary
    # per step WITHIN a run via fold_in, and the nonce varies them ACROSS
    # bench invocations too, in case that cache outlives the process.
    key = jax.random.key(time.time_ns() % (2**31 - 1))
    image = jax.random.uniform(jax.random.key(2), (batch, img, img, 3)) * 2 - 1

    # Warm up / compile both programs.
    compiled = step.lower(params, batch_stats, image, key).compile()
    # XLA's own FLOP count for one step (all hypotheses, full decode) —
    # basis for the MFU field so rounds track efficiency, not just
    # throughput (VERDICT r2 item 9).
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        step_flops = None
    # XLA's count cannot see inside Pallas custom calls — add the fused
    # kernels' conv-semantics FLOPs when their runtime gates are active, so
    # MFU stays comparable as more of the model moves into kernels.
    if step_flops and jax.default_backend() == "tpu":
        from mhentropy_tpu.models import stage1_pallas, stem_pallas

        enc = cfg.encoder
        if getattr(enc, "pallas_stem", True) and img == 256:
            step_flops += stem_pallas.flops(batch, img)
        if getattr(enc, "pallas_stage1", True) and img == 256:
            step_flops += stage1_pallas.flops(batch, img // 4, img // 4)
    # Reuse the AOT executable for the per-call loop: a separate step(...)
    # dispatch would compile the identical program a second time (AOT
    # executables don't populate the jit dispatch cache) — minutes through
    # the remote-compile tunnel on a cold cache.
    xyz, uv = compiled(params, batch_stats, image, key)
    jax.block_until_ready(xyz)
    jax.block_until_ready(scan_steps(params, batch_stats, image, key))

    # Best-of-3 with a variance field: relay-latency noise on this box is
    # large; the recorded spread lets future rounds tell drift from noise.
    pipelined, per_call = [], []
    for r in range(3):
        t0 = time.perf_counter()
        acc = scan_steps(params, batch_stats, image, jax.random.fold_in(key, r))
        jax.block_until_ready(acc)
        pipelined.append(n_hypo * batch * steps / (time.perf_counter() - t0))

        t0 = time.perf_counter()
        for i in range(steps):
            xyz, uv = compiled(
                params, batch_stats, image, jax.random.fold_in(key, 100 + r * steps + i)
            )
        jax.block_until_ready(xyz)
        per_call.append(n_hypo * batch * steps / (time.perf_counter() - t0))

    rate = max(pipelined)

    # int8 W8A8 serving option (models/quant.py; opt-out MHENT_BENCH_INT8=0):
    # measured with the same scanned methodology, calibrated on the bench
    # image. Recorded as extra fields — "value" stays the exact bf16 path.
    int8_rate, int8_error = None, None
    if os.environ.get("MHENT_BENCH_INT8", "1") == "1":
        try:
            from mhentropy_tpu.models import quant

            spec, qtree = quant.quantize_encoder(
                params["encoder"], batch_stats, cfg.encoder, image)
            if quant.sampler_supported(cfg):
                # Default quantized path includes the int8 fused sampler
                # (engine/serve do the same; measured +5.1% over the
                # int8-encoder-only pipeline).
                spec, qtree = quant.quantize_sampler_into(
                    spec, qtree, params, cfg.flow, image, temp=0.8)

            @jax.jit
            def scan_q(params, batch_stats, qtree, image, key):
                def body(carry, k):
                    img_k = image + jax.random.uniform(k, (1,)) * 1e-6
                    out = mhent.sample_hypotheses(
                        model, params, batch_stats, cfg, img_k, k, n=n_hypo,
                        temp=0.8, mods=("xyz", "uv"), quant=(spec, qtree))
                    return carry + (out["xyz"].sum() + out["uv"].sum()) * 1e-20, None

                acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, steps))
                return acc

            jax.block_until_ready(scan_q(params, batch_stats, qtree, image, key))
            best = []
            for r in range(3):
                t0 = time.perf_counter()
                acc = scan_q(params, batch_stats, qtree, image,
                             jax.random.fold_in(key, 50 + r))
                jax.block_until_ready(acc)
                best.append(n_hypo * batch * steps / (time.perf_counter() - t0))
            int8_rate = max(best)
        except Exception as e:  # record, never mask as an opt-out
            int8_error = repr(e)[:200]
            print(f"int8 bench failed: {int8_error}", file=sys.stderr)
    # MFU vs the chip's bf16 matmul peak (v5e: 197 TFLOP/s; other chips
    # would need their own entry — the device kind is recorded alongside).
    peak_flops = 197e12
    mfu = None
    if step_flops:
        achieved = step_flops * rate / (n_hypo * batch)
        mfu = round(achieved / peak_flops, 4)
    print(
        json.dumps(
            {
                "metric": (
                    f"hypotheses/sec/chip (N={n_hypo}, B={batch}, full "
                    "pipeline, pipelined dispatch)"
                ),
                "value": round(rate, 1),
                "unit": "hypos/s",
                "vs_baseline": round(rate / 20000.0, 3),
                "rounds": [round(r, 1) for r in pipelined],
                "per_call": round(max(per_call), 1),
                "spread_pct": round(
                    100.0 * (max(pipelined) - min(pipelined)) / max(pipelined), 2
                ),
                "model_flops": step_flops,
                "mfu": mfu,
                "int8_serving": round(int8_rate, 1) if int8_rate else None,
                "int8_speedup": round(int8_rate / rate, 4) if int8_rate else None,
                **({"int8_error": int8_error} if int8_error else {}),
                "device_kind": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
