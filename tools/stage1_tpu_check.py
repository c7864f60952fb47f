"""On-TPU numeric + timing check of the wired stage-1 Pallas kernel vs the
XLA bottleneck stage (real conv semantics, real BN folding — unlike the
shape-only stage1_probe). One JSON line per side.

Usage: python -m tools.stage1_tpu_check [H W]   (default 64 64)
"""

import json
import sys
import time


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
    print(json.dumps({
        "check": "numerics",
        "max_abs_err": float(err.max()),
        "mean_abs_err": float(err.mean()),
        "ref_mean_abs": float(scale),
        "rel_mean": float(err.mean() / scale),
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
