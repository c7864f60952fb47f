"""Benchmark: hypotheses/sec/chip at N=100 on the flagship MHEnt pipeline
(resnet50 conditioning + 12-layer conditional RealNVP + full MANO decode +
orthographic reprojection, i.e. everything network.py:846-883 does per
hypothesis).

Budgeted sections (r3 post-mortem: the driver's run timed out at rc=124
because three big remote-tunnel compiles ran before ANY output — 17 min
cold): the headline scan compiles and measures FIRST, then each further
section runs only if the wall-clock budget (MHENT_BENCH_BUDGET_S, default
480 s) can afford another compile of the measured cold-compile magnitude.
Skipped sections are recorded in the JSON as null + a "skipped" list —
the line always prints.

Sections, in value order after the headline:
  - int8: the quantized serving path (encoder + fused sampler PTQ).
  - eval_shape: N=200, B=64 — the README-table eval configuration.
  - train: ms/step for the scanned train step (tools/bench_train.py math).
  - per_call: one dispatch per step from Python; includes ~3 ms host
    dispatch overhead per step and understates chip throughput ~45%
    (measured r2: 438k vs 789k).
  - int8_eval_shape: the quantized eval-table shape (same calibration as
    the int8 section). Ranked after the r4-era fields so a tight budget
    preserves round-over-round comparability first.
  - serve_b1: B=1 N=200 device ms/frame (the serve.py per-frame cost).
A section that starts but raises records "<name>_failed" in the skipped
list (stderr carries the repr), so null fields are always attributable.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is against the BASELINE.json target of 20k hypotheses/sec/chip.
"""

import json
import os
import sys
import time


def main():
    budget_s = float(os.environ.get("MHENT_BENCH_BUDGET_S", "480"))
    t_start = time.monotonic()

    def remaining():
        return budget_s - (time.monotonic() - t_start)

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

    def make_scan(n, fn):
        @jax.jit
        def scan_steps(params, batch_stats, image, key):
            def body(carry, k):
                # Derive a per-step image from the key: without this, the
                # image is loop-invariant and XLA hoists the WHOLE ENCODER
                # out of the scan (verified in a profile — conv ops
                # appeared x1, not x STEPS), inflating the rate ~1.6x.
                img_k = image + jax.random.uniform(k, (1,)) * 1e-6
                xyz, uv = fn(params, batch_stats, img_k, k)
                # Full reductions in the carry: a single-element dependency
                # (xyz[0,0,0]) lets XLA prune most of the decode out of the
                # loop (verified — a [0,0] carry made a scanned resnet50
                # report an impossible 0.03 ms/step).
                return carry + (xyz.sum() + uv.sum()) * 1e-20, None

            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, n))
            return acc

        return scan_steps

    scan_steps = make_scan(steps, one_step)

    # Per-run nonce in the key: the relay serves repeated identical
    # (program, args) executions from a cache (CLAUDE.md) — inputs vary
    # per step WITHIN a run via fold_in, and the nonce varies them ACROSS
    # bench invocations too, in case that cache outlives the process.
    key = jax.random.key(time.time_ns() % (2**31 - 1))
    image = jax.random.uniform(jax.random.key(2), (batch, img, img, 3)) * 2 - 1

    # ---------------------------------------------------------- headline
    # Compile the HEADLINE program first and alone — everything else is
    # gated on what this compile costs on this machine today.
    t0 = time.monotonic()
    scan_c = scan_steps.lower(params, batch_stats, image, key).compile()
    compile_s = time.monotonic() - t0

    # XLA's own FLOP count (basis for the MFU field so rounds track
    # efficiency, not just throughput). cost_analysis counts a while/scan
    # BODY once, not trip_count times (verified on-chip r4: the scan
    # program reports the same ~270 GF as the single per-call step), so
    # the scan program's count IS the per-step count.
    try:
        ca = scan_c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        _flops = float(ca.get("flops", 0.0))
        # Strictly positive: cost_analysis can report a -1 "unknown"
        # sentinel, which would ride into model_flops/MFU as garbage.
        xla_step_flops = _flops if _flops > 0 else None
    except Exception:
        xla_step_flops = None
    # XLA's count cannot see inside Pallas custom calls — add the fused
    # kernels' conv-semantics FLOPs when their runtime gates are active, so
    # MFU stays comparable as more of the model moves into kernels. Kept
    # SEPARATE from the XLA count: the trip-count fallback below must
    # rescale only XLA's number, never the per-step kernel FLOPs.
    kernel_flops = 0.0
    if xla_step_flops and jax.default_backend() == "tpu":
        from mhentropy_tpu.models import stage1_pallas, stem_pallas

        enc = cfg.encoder
        if getattr(enc, "pallas_stem", True) and img == 256:
            kernel_flops += stem_pallas.flops(batch, img)
        if getattr(enc, "pallas_stage1", True) and img == 256:
            kernel_flops += stage1_pallas.flops(batch, img // 4, img // 4)

    jax.block_until_ready(scan_c(params, batch_stats, image, key))

    # Best-of-3 with a variance field: relay-latency noise on this box is
    # large; the recorded spread lets future rounds tell drift from noise.
    pipelined = []
    for r in range(3):
        t0 = time.perf_counter()
        acc = scan_c(params, batch_stats, image, jax.random.fold_in(key, r))
        jax.block_until_ready(acc)
        pipelined.append(n_hypo * batch * steps / (time.perf_counter() - t0))
    rate = max(pipelined)

    # ------------------------------------------------------ gated sections
    # A further section costs roughly one more compile of the headline's
    # magnitude (the programs are siblings); the train section about two
    # (fwd+bwd). Only start one if the budget affords it plus margin.
    skipped = []

    def afford(name, scale=1.0, margin=45.0):
        est = max(30.0, compile_s) * scale + margin
        if remaining() > est:
            return True
        skipped.append(name)
        return False

    # int8 W8A8 serving option (models/quant.py; opt-out MHENT_BENCH_INT8=0):
    # measured with the same scanned methodology, calibrated on the bench
    # image. Recorded as extra fields — "value" stays the exact bf16 path.
    int8_rate, int8_error = None, None
    int8_quant = None  # (spec, qtree) reused by int8_eval_shape (retraced)
    if os.environ.get("MHENT_BENCH_INT8", "1") != "1":
        skipped.append("int8 (disabled)")
    elif afford("int8"):
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

            def make_quant_scan(n, spec, qtree):
                # Same anti-hoisting/anti-DCE shape as make_scan — ONE
                # definition for the headline-int8 and eval-shape reruns.
                @jax.jit
                def scan_q(params, batch_stats, qtree, image, key):
                    def body(carry, k):
                        img_k = image + jax.random.uniform(k, (1,)) * 1e-6
                        out = mhent.sample_hypotheses(
                            model, params, batch_stats, cfg, img_k, k, n=n,
                            temp=0.8, mods=("xyz", "uv"),
                            quant=(spec, qtree))
                        return carry + (out["xyz"].sum()
                                        + out["uv"].sum()) * 1e-20, None

                    acc, _ = jax.lax.scan(
                        body, 0.0, jax.random.split(key, steps))
                    return acc

                return scan_q

            scan_q = make_quant_scan(n_hypo, spec, qtree)

            jax.block_until_ready(scan_q(params, batch_stats, qtree, image, key))
            best = []
            for r in range(3):
                t0 = time.perf_counter()
                acc = scan_q(params, batch_stats, qtree, image,
                             jax.random.fold_in(key, 50 + r))
                jax.block_until_ready(acc)
                best.append(n_hypo * batch * steps / (time.perf_counter() - t0))
            int8_rate = max(best)
            int8_quant = (spec, qtree, make_quant_scan)
        except Exception as e:  # record, never mask as an opt-out
            int8_error = repr(e)[:200]
            print(f"int8 bench failed: {int8_error}", file=sys.stderr)

    # Eval-table shape (N=200, B=64 — README/PERF numbers lived only in
    # builder notes until r4): same program at the bigger shape. Skip when
    # this IS the eval-shape invocation.
    # One N=200 step function shared by the eval-shape (B=64) and B=1
    # serving sections — batch comes from the argument shape.
    def n200_step(params, batch_stats, image, key):
        out = mhent.sample_hypotheses(
            model, params, batch_stats, cfg, image, key, n=200,
            temp=0.8, mods=("xyz", "uv"))
        return out["xyz"], out["uv"]

    eval_rate = None
    if (n_hypo, batch) != (200, 64) and afford("eval_shape"):
        try:
            ev_img = jax.random.uniform(
                jax.random.key(3), (64, img, img, 3)) * 2 - 1

            ev_scan = make_scan(steps, n200_step)
            jax.block_until_ready(ev_scan(params, batch_stats, ev_img, key))
            best = []
            for r in range(3):
                t0 = time.perf_counter()
                acc = ev_scan(params, batch_stats, ev_img,
                              jax.random.fold_in(key, 80 + r))
                jax.block_until_ready(acc)
                best.append(200 * 64 * steps / (time.perf_counter() - t0))
            eval_rate = max(best)
        except Exception as e:
            skipped.append("eval_shape_failed")
            print(f"eval_shape bench failed: {e!r:.200}", file=sys.stderr)

    # Train step (tools/bench_train.py methodology: state threaded through
    # the scan carry, per-step perturbed images). Roughly a double-size
    # compile (fwd+bwd).
    train_ms = None
    if afford("train", scale=2.0):
        try:
            import optax

            from mhentropy_tpu.data import synthetic
            from mhentropy_tpu.train import engine

            tr_cfg = cfg._replace(n_train_hypotheses=10)
            optimizer = optax.chain(
                optax.clip_by_global_norm(1.0), optax.adam(1e-4))
            state = engine.init_state(jax.random.key(0), tr_cfg, optimizer)
            data = synthetic.make_dataset(
                model, n=batch, image_size=img, seed=0)
            tr_image, target = next(synthetic.batches(data, batch))
            tr_image = jnp.asarray(tr_image)
            target = {k: jnp.asarray(v) for k, v in target.items()}
            TR_STEPS = 50

            def tr_one(state, image, target, key):
                def loss_fn(p):
                    out, new_stats = mhent.reverse_kld(
                        model, p, state.batch_stats, tr_cfg, target, image,
                        key, train=True)
                    return -out["log_p"].mean(), new_stats

                (_, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params)
                p = optax.apply_updates(state.params, updates)
                return engine.TrainState(
                    p, new_stats, opt_state, state.step + 1)

            @jax.jit
            def tr_scan(state, image, target, key):
                def body(st, k):
                    img_k = image + jax.random.uniform(k, (1,)) * 1e-6
                    return tr_one(st, img_k, target, k), 0.0

                st, _ = jax.lax.scan(
                    body, state, jax.random.split(key, TR_STEPS))
                return st

            jax.block_until_ready(
                tr_scan(state, tr_image, target, key).step)
            best = 1e9
            for r in range(2):
                t0 = time.perf_counter()
                st = tr_scan(state, tr_image, target,
                             jax.random.fold_in(key, 70 + r))
                jax.block_until_ready(st.step)
                best = min(best, (time.perf_counter() - t0) / TR_STEPS)
            train_ms = best * 1e3
        except Exception as e:
            skipped.append("train_failed")
            print(f"train bench failed: {e!r:.200}", file=sys.stderr)

    # Per-call dispatch (AOT executable reused across calls — a plain
    # step(...) dispatch would compile the identical program a second time;
    # AOT executables don't populate the jit dispatch cache).
    per_call = None
    single_step_flops = None
    if afford("per_call"):
        try:
            step_c = jax.jit(one_step).lower(
                params, batch_stats, image, key).compile()
            try:
                sca = step_c.cost_analysis()
                if isinstance(sca, (list, tuple)):
                    sca = sca[0]
                sf = float(sca.get("flops", 0.0))
                # Strictly positive only: a -1 "unknown" sentinel would
                # pass truthiness and poison the MFU rescale cross-check.
                single_step_flops = sf if sf > 0 else None
            except Exception:
                pass
            xyz, uv = step_c(params, batch_stats, image, key)
            jax.block_until_ready(xyz)
            best = []
            for r in range(2):
                t0 = time.perf_counter()
                for i in range(steps):
                    xyz, uv = step_c(
                        params, batch_stats, image,
                        jax.random.fold_in(key, 100 + r * steps + i))
                jax.block_until_ready(xyz)
                best.append(
                    n_hypo * batch * steps / (time.perf_counter() - t0))
            per_call = max(best)
        except Exception as e:
            skipped.append("per_call_failed")
            print(f"per_call bench failed: {e!r:.200}", file=sys.stderr)

    # int8 eval-table shape (the 1.93M claim lived only in builder notes
    # until r5): the quantized scan retraced at (N=200, B=64), reusing the
    # calibration from the int8 section above (activation scales are
    # shape-independent; engine/serve reuse calibrations the same way).
    int8_eval_rate = None
    if int8_quant is None:
        skipped.append("int8_eval_shape")
    elif (n_hypo, batch) != (200, 64) and afford("int8_eval_shape"):
        try:
            spec, qtree, make_quant_scan = int8_quant
            qev_img = jax.random.uniform(
                jax.random.key(4), (64, img, img, 3)) * 2 - 1
            scan_q_ev = make_quant_scan(200, spec, qtree)

            jax.block_until_ready(
                scan_q_ev(params, batch_stats, qtree, qev_img, key))
            best = []
            for r in range(3):
                t0 = time.perf_counter()
                acc = scan_q_ev(params, batch_stats, qtree, qev_img,
                                jax.random.fold_in(key, 90 + r))
                jax.block_until_ready(acc)
                best.append(200 * 64 * steps / (time.perf_counter() - t0))
            int8_eval_rate = max(best)
        except Exception as e:
            skipped.append("int8_eval_shape_failed")
            print(f"int8_eval_shape bench failed: {e!r:.200}", file=sys.stderr)

    # B=1 serving latency (bf16 — serve.py's quantize_min_batch=8 default
    # keeps B=1 unquantized), N=200: device ms/frame via the scanned
    # methodology (per-step varied input, full-output carry). This is the
    # device-side cost serve.py pays per frame; wall latency through the
    # relay adds transport (~64 ms measured, docs/PERF.md).
    serve_b1_ms = None
    if afford("serve_b1"):
        try:
            b1_img = jax.random.uniform(
                jax.random.key(5), (1, img, img, 3)) * 2 - 1

            b1_scan = make_scan(steps, n200_step)
            jax.block_until_ready(b1_scan(params, batch_stats, b1_img, key))
            best = 1e9
            for r in range(2):
                t0 = time.perf_counter()
                acc = b1_scan(params, batch_stats, b1_img,
                              jax.random.fold_in(key, 120 + r))
                jax.block_until_ready(acc)
                best = min(best, (time.perf_counter() - t0) / steps)
            serve_b1_ms = best * 1e3
        except Exception as e:
            skipped.append("serve_b1_failed")
            print(f"serve_b1 bench failed: {e!r:.200}", file=sys.stderr)

    # MFU vs the chip's bf16 matmul peak (v5e: 197 TFLOP/s; other chips
    # would need their own entry — the device kind is recorded alongside).
    peak_flops = 197e12
    mfu, step_flops = None, None
    flops_rescaled = False
    if xla_step_flops:
        # Guard against an XLA version that starts multiplying the scan
        # body by trip_count. Primary check: the single-step program's own
        # count (already compiled for per_call) — if the scan count is
        # ~trip_count times it, the semantics changed, regardless of how
        # slow the chip happens to be today (an MFU<=1 inflated count
        # would otherwise slip the impossibility check below).
        if (single_step_flops
                and xla_step_flops > 2.0 * single_step_flops):
            xla_step_flops = single_step_flops
            flops_rescaled = True
        # Backstop when per_call was skipped: an MFU > 1 is impossible,
        # so fall back to the per-step interpretation (XLA's count only —
        # the kernel FLOPs are per-step by construction).
        elif xla_step_flops * rate / (n_hypo * batch) > peak_flops:
            xla_step_flops /= steps
            flops_rescaled = True
        step_flops = xla_step_flops + kernel_flops
        achieved = step_flops * rate / (n_hypo * batch)
        mfu = round(achieved / peak_flops, 4)
    print(
        json.dumps(
            {
                "metric": (
                    f"hypotheses/sec/chip (N={n_hypo}, B={batch}, full "
                    f"pipeline, pipelined dispatch, {steps}-step scan)"
                ),
                "value": round(rate, 1),
                "unit": "hypos/s",
                "vs_baseline": round(rate / 20000.0, 3),
                "rounds": [round(r, 1) for r in pipelined],
                "spread_pct": round(
                    100.0 * (max(pipelined) - min(pipelined)) / max(pipelined), 2
                ),
                "model_flops": step_flops,
                "mfu": mfu,
                "int8_serving": round(int8_rate, 1) if int8_rate else None,
                "int8_speedup": round(int8_rate / rate, 4) if int8_rate else None,
                **({"int8_error": int8_error} if int8_error else {}),
                "eval_shape_n200_b64": round(eval_rate, 1) if eval_rate else None,
                "int8_eval_shape_n200_b64": (
                    round(int8_eval_rate, 1) if int8_eval_rate else None),
                "train_ms_per_step": round(train_ms, 3) if train_ms else None,
                "per_call": round(per_call, 1) if per_call else None,
                "serve_b1_ms": (
                    round(serve_b1_ms, 3) if serve_b1_ms else None),
                **({"flops_rescaled": True} if flops_rescaled else {}),
                "skipped": skipped,
                "compile_s": round(compile_s, 1),
                "budget_s": budget_s,
                "device_kind": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
