"""On-TPU numeric + timing check of the wired stage-1 Pallas kernel vs the
XLA bottleneck stage (real conv semantics, real BN folding — unlike the
shape-only stage1_probe). One JSON line per side.

Usage: python -m tools.stage1_tpu_check [H W]   (default 64 64)
       python -m tools.stage1_tpu_check int8 [H W]

The int8 mode checks models/stage1_int8.py against the jitted
quant._qconv XLA walk ON THE CHIP — interpret-mode tests cannot see
Mosaic lowering behavior (the pre-quantize MXU transpose bug truncated
activations to bf16 and shifted quantization boundaries: 42% rel error
on-chip while interpret mode was exact; this check is what caught it).
Budget: rel mean < 0.02 (requant ties + the bf16 final emit), cos >
0.999.
"""

import json
import sys
import time


def main_int8():
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mhentropy_tpu.models import quant, stage1_int8

    B = 4
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    def rand_site(key, kshape):
        ks = jax.random.split(key, 4)
        cout = kshape[-1]
        return {
            "w8": jax.random.randint(ks[0], kshape, -90, 90, jnp.int8),
            "scale": jax.random.uniform(ks[1], (cout,), jnp.float32,
                                        2e-4, 2e-3),
            "bias": jax.random.normal(ks[2], (cout,)) * 0.05,
            "inv_sa": jax.random.uniform(ks[3], (), jnp.float32,
                                         30.0, 80.0),
        }

    sites, key = {}, jax.random.key(0)
    for j in range(3):
        ks = jax.random.split(jax.random.fold_in(key, j), 4)
        cin = 64 if j == 0 else 256
        sites[f"layer1_{j}/conv1"] = rand_site(ks[0], (1, 1, cin, 64))
        sites[f"layer1_{j}/conv2"] = rand_site(ks[1], (3, 3, 64, 64))
        sites[f"layer1_{j}/conv3"] = rand_site(ks[2], (1, 1, 64, 256))
    sites["layer1_0/downsample_conv"] = rand_site(
        jax.random.fold_in(key, 9), (1, 1, 64, 256))
    sites["layer1_0/downsample_conv"]["inv_sa"] = \
        sites["layer1_0/conv1"]["inv_sa"]

    @jax.jit
    def walk(x, sites):
        y = jnp.maximum(quant._qconv(x, sites["layer1_0/conv1"], 1, 0), 0)
        y = jnp.maximum(quant._qconv(y, sites["layer1_0/conv2"], 1, 1), 0)
        y = quant._qconv(y, sites["layer1_0/conv3"], 1, 0)
        rds = quant._qconv(x, sites["layer1_0/downsample_conv"], 1, 0)
        out = jnp.maximum(y + rds, 0)
        for j in (1, 2):
            y = jnp.maximum(
                quant._qconv(out, sites[f"layer1_{j}/conv1"], 1, 0), 0)
            y = jnp.maximum(
                quant._qconv(y, sites[f"layer1_{j}/conv2"], 1, 1), 0)
            y = quant._qconv(y, sites[f"layer1_{j}/conv3"], 1, 0)
            out = jnp.maximum(y + out, 0)
        return out

    x = jax.random.normal(jax.random.key(3), (B, H, W, 64), jnp.float32)
    try:
        got = np.asarray(stage1_int8.stage1_forward_q(
            x, sites, out_dtype=jnp.float32))
    except Exception as e:
        print(json.dumps({"error": str(e)[:3000]}))
        return 1
    ref = np.asarray(walk(x, sites))
    rel = float(np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9))
    cos = float((got * ref).sum()
                / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9))
    ok = rel < 0.02 and cos > 0.999
    print(json.dumps({"check": "int8_numerics", "rel_mean": rel,
                      "cos": cos, "ok": ok}))
    return 0 if ok else 1


def main_stem8():
    """On-chip parity + timing of models/stem_int8.py vs (a) the jitted
    XLA quant walk (same integer arithmetic — near-exact up to the bf16
    selection-matmul emit) and (b) the bf16 stem kernel (timing only).
    The interpret-mode test cannot see Mosaic lowering (docstring above).
    """
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mhentropy_tpu.models import stem_int8, stem_pallas

    B = 8
    ks = jax.random.split(jax.random.key(0), 6)
    kernel = jax.random.normal(ks[0], (7, 7, 3, 64)) * 0.1
    bn_p = {"scale": 1.0 + jax.random.normal(ks[1], (64,)) * 0.2,
            "bias": jax.random.normal(ks[2], (64,)) * 0.1}
    bn_s = {"mean": jax.random.normal(ks[3], (64,)) * 0.1,
            "var": 1.0 + jax.random.uniform(ks[4], (64,)) * 0.5}
    x = jax.random.normal(ks[5], (B, 256, 256, 3), jnp.float32) * 1.3
    site = jax.tree.map(jnp.asarray, stem_int8.prepare_stem_site(
        kernel, bn_p, bn_s, jnp.max(jnp.abs(x), axis=(0, 1, 2))))

    walk = jax.jit(stem_int8.xla_reference)

    try:
        got = np.asarray(stem_int8.stem_forward_q(
            x, site, compute_dtype=jnp.float32, out_dtype=jnp.float32))
    except Exception as e:
        print(json.dumps({"error": str(e)[:3000]}))
        return 1
    ref = np.asarray(walk(x, site))
    rel = float(np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9))
    cos = float((got * ref).sum()
                / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9))
    # Budget: the integer GEMM is exact; rel covers the f32-dot operand
    # truncation to bf16 in the selection-matmul emit (~0.4%/element).
    ok = rel < 0.01 and cos > 0.999
    print(json.dumps({"check": "stem8_numerics", "rel_mean": rel,
                      "cos": cos, "ok": ok}), flush=True)

    # Standalone scan timings are relay-floor-dominated; the ratio at a
    # shared 50-step scan is still indicative (full A/B: bench_quant).
    import time as _t

    def timed(fn, xin):
        @jax.jit
        def scan(xv, key):
            def body(carry, k):
                v = xv + jax.random.uniform(k, (1,)).astype(xv.dtype) * 1e-3
                out = fn(v)
                return carry + jnp.sum(out.astype(jnp.float32)) * 1e-20, None
            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, 50))
            return acc

        jax.block_until_ready(scan(xin, jax.random.key(5)))
        best = np.inf
        for r in range(3):
            t0 = _t.perf_counter()
            jax.block_until_ready(
                scan(xin, jax.random.fold_in(jax.random.key(6), r)))
            best = min(best, (_t.perf_counter() - t0) / 50)
        return best * 1e6

    x32 = jax.random.normal(jax.random.key(9), (32, 256, 256, 3),
                            jnp.bfloat16) * 1.3
    t_i8 = timed(lambda v: stem_int8.stem_forward_q(v, site), x32)
    t_bf = timed(lambda v: stem_pallas.stem_forward(
        v, kernel, bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"]),
        x32)
    print(json.dumps({"check": "stem8_timing",
                      "int8_us_per_call": round(t_i8, 1),
                      "bf16_us_per_call": round(t_bf, 1),
                      "speedup": round(t_bf / t_i8, 3)}), flush=True)
    return 0 if ok else 1


def main():
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mhentropy_tpu.models import stage1_pallas

    B, C = 32, 64
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    key = jax.random.key(0)

    def rand_bn(k, n):
        ks = jax.random.split(k, 4)
        return {
            "scale": 1.0 + jax.random.normal(ks[0], (n,)) * 0.2,
            "bias": jax.random.normal(ks[1], (n,)) * 0.1,
            "mean": jax.random.normal(ks[2], (n,)) * 0.1,
            "var": 1.0 + jax.random.uniform(ks[3], (n,)) * 0.5,
        }

    blocks = []
    for j in range(3):
        kj = jax.random.fold_in(key, j)
        ks = jax.random.split(kj, 8)
        cin = 64 if j == 0 else 256
        blk = {
            "conv1": jax.random.normal(ks[0], (1, 1, cin, 64)) * 0.1,
            "bn1": rand_bn(ks[1], 64),
            "conv2": jax.random.normal(ks[2], (3, 3, 64, 64)) * 0.1,
            "bn2": rand_bn(ks[3], 64),
            "conv3": jax.random.normal(ks[4], (1, 1, 64, 256)) * 0.1,
            "bn3": rand_bn(ks[5], 256),
        }
        if j == 0:
            blk["ds_conv"] = jax.random.normal(ks[6], (1, 1, 64, 256)) * 0.1
            blk["ds_bn"] = rand_bn(ks[7], 256)
        blocks.append(blk)

    def xla_ref(x, eps=1e-5):
        x = x.astype(jnp.bfloat16)

        def bn(y, p):
            g = (p["scale"] * jax.lax.rsqrt(p["var"] + eps)).astype(jnp.bfloat16)
            b = (p["bias"] - p["mean"] * p["scale"]
                 * jax.lax.rsqrt(p["var"] + eps)).astype(jnp.bfloat16)
            return y * g + b

        def conv(y, k, pad):
            return jax.lax.conv_general_dilated(
                y, k.astype(jnp.bfloat16), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        for j, b in enumerate(blocks):
            y = nn.relu(bn(conv(x, b["conv1"], "VALID"), b["bn1"]))
            y = nn.relu(bn(conv(y, b["conv2"], [(1, 1), (1, 1)]), b["bn2"]))
            y = bn(conv(y, b["conv3"], "VALID"), b["bn3"])
            res = (bn(conv(x, b["ds_conv"], "VALID"), b["ds_bn"])
                   if j == 0 else x)
            x = nn.relu(y + res)
        return x

    x = jax.random.normal(jax.random.fold_in(key, 99), (B, H, W, C)) * 0.5

    # --- numerics ---
    try:
        ours = np.asarray(
            stage1_pallas.stage1_forward(x, blocks).astype(jnp.float32))
    except Exception as e:
        print(json.dumps({"error": str(e)[:3000]}))
        return 1
    ref = np.asarray(jax.jit(xla_ref)(x).astype(jnp.float32))
    err = np.abs(ours - ref)
    scale = np.abs(ref).mean()
    # bf16 dot accumulation vs the XLA path: observed rel_mean ~1e-3 when
    # healthy; the r3 int8 incident read 42% on-chip while interpret mode
    # was exact — gate the exit code so CI/scripts catch it.
    ok = float(err.mean() / scale) < 0.02
    print(json.dumps({
        "check": "numerics",
        "max_abs_err": float(err.max()),
        "mean_abs_err": float(err.mean()),
        "ref_mean_abs": float(scale),
        "rel_mean": float(err.mean() / scale),
        "ok": ok,
    }), flush=True)

    # --- timing (scanned, varied input, full carry) ---
    def timed(fn):
        @jax.jit
        def scan(x, key):
            def body(carry, k):
                xv = x + jax.random.uniform(k, (1,)).astype(x.dtype) * 1e-3
                out = fn(xv)
                return carry + jnp.sum(out.astype(jnp.float32)) * 1e-20, None
            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, 50))
            return acc

        jax.block_until_ready(scan(x, jax.random.key(5)))
        best = np.inf
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(scan(x, jax.random.fold_in(jax.random.key(6), r)))
            best = min(best, (time.perf_counter() - t0) / 50)
        return best * 1e6

    t_pal = timed(lambda xv: stage1_pallas.stage1_forward(xv, blocks))
    t_xla = timed(xla_ref)
    print(json.dumps({
        "check": "timing",
        "pallas_us_per_call": round(t_pal, 1),
        "xla_us_per_call": round(t_xla, 1),
        "speedup": round(t_xla / t_pal, 3),
    }), flush=True)
    return 0 if ok else 1


def main_stage23():
    """On-chip parity of models/stage2_int8.py vs the jitted XLA quant
    walk, at the real stage-2 and stage-3 geometries. Tie-flips cascade
    (see tests/test_stage2_int8.py), so bounds are robust-stat."""
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mhentropy_tpu.models import quant, stage2_int8

    def rand_site(key, kshape):
        ks = jax.random.split(key, 4)
        cout = kshape[-1]
        return {
            "w8": jax.random.randint(ks[0], kshape, -90, 90, jnp.int8),
            "scale": jax.random.uniform(ks[1], (cout,), jnp.float32,
                                        2e-4, 2e-3),
            "bias": jax.random.normal(ks[2], (cout,)) * 0.05,
            "inv_sa": jax.random.uniform(ks[3], (), jnp.float32,
                                         30.0, 80.0),
        }

    ok_all = True
    for stage in (2, 3):
        g = stage2_int8.GEOMS[stage]
        sites, key = {}, jax.random.key(stage)
        for j in range(g.n_blocks):
            ks = jax.random.split(jax.random.fold_in(key, j), 4)
            cin = g.cin if j == 0 else g.cout
            sites[f"layer{stage}_{j}/conv1"] = rand_site(
                ks[0], (1, 1, cin, g.width))
            sites[f"layer{stage}_{j}/conv2"] = rand_site(
                ks[1], (3, 3, g.width, g.width))
            sites[f"layer{stage}_{j}/conv3"] = rand_site(
                ks[2], (1, 1, g.width, g.cout))
        sites[f"layer{stage}_0/downsample_conv"] = rand_site(
            jax.random.fold_in(key, 9), (1, 1, g.cin, g.cout))
        sites[f"layer{stage}_0/downsample_conv"]["inv_sa"] = \
            sites[f"layer{stage}_0/conv1"]["inv_sa"]

        @jax.jit
        def walk(x, sites, stage=stage, g=g):
            out = x
            for j in range(g.n_blocks):
                stride = 2 if j == 0 else 1
                y = jnp.maximum(quant._qconv(
                    out, sites[f"layer{stage}_{j}/conv1"], 1, 0), 0)
                y = jnp.maximum(quant._qconv(
                    y, sites[f"layer{stage}_{j}/conv2"], stride, 1), 0)
                y = quant._qconv(y, sites[f"layer{stage}_{j}/conv3"], 1, 0)
                r = quant._qconv(
                    out, sites[f"layer{stage}_0/downsample_conv"], 2, 0) \
                    if j == 0 else out
                out = jnp.maximum(y + r, 0)
            return out

        x = jax.random.normal(jax.random.key(7),
                              (2, g.w_in, g.w_in, g.cin), jnp.float32)
        try:
            got = np.asarray(stage2_int8.stage_forward_q(
                x, sites, stage=stage, out_dtype=jnp.float32))
        except Exception as e:
            print(json.dumps({"stage": stage, "error": str(e)[:3000]}))
            ok_all = False
            continue
        ref = np.asarray(walk(x, sites)).reshape(got.shape)
        rel = np.abs(got - ref) / (np.abs(ref) + 1.0)
        cos = float((got * ref).sum()
                    / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9))
        ok = bool(np.median(rel) < 1e-3 and cos > 0.995)
        ok_all = ok_all and ok
        print(json.dumps({
            "check": f"stage{stage}_int8_numerics",
            "rel_median": float(np.median(rel)),
            "frac_rel_gt_5pct": float((rel > 0.05).mean()),
            "cos": cos, "ok": ok}), flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "int8":
        sys.exit(main_int8())
    if len(sys.argv) > 1 and sys.argv[1] == "stage23":
        sys.exit(main_stage23())
    if len(sys.argv) > 1 and sys.argv[1] == "stem8":
        sys.exit(main_stem8())
    sys.exit(main())
