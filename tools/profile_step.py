"""Profile the flagship inference/training step and print a per-op time
table from the xplane trace.

The only trustworthy perf tooling on this relay-fronted TPU (see
docs/PERF.md "Measurement methodology"): scalar-output microbenches read
impossibly fast through the relay, so all optimisation A/Bs run on the full
scanned pipeline and are attributed with this tool.

Usage:
    python -m tools.profile_step [train|quant]    # profile + parse
    python -m tools.profile_step parse <logdir>   # re-parse an existing trace

("quant" profiles the int8 W8A8 eval pipeline — models/quant.py.)

Prints: total device-busy time, a top-op table (self time, occurrences,
category), and the device timeline gap analysis (idle stretches > 50 us).
"""

import collections
import glob
import os
import sys


def _find_xplanes(logdir: str):
    pats = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not pats:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    return sorted(pats, key=os.path.getmtime)


def parse_xplane(path: str):
    """Yield (plane_name, line_name, [(name, start_ns, dur_ns), ...]) per
    timeline line of each device plane (lines are separate sub-timelines —
    e.g. 'XLA Ops' vs 'XLA Modules' — summing across them double-counts)."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as fp:
        space.ParseFromString(fp.read())
    out = []
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            base = line.timestamp_ns
            events = []
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                start = base + ev.offset_ps // 1000
                events.append((name, start, ev.duration_ps // 1000))
            if events:
                out.append((plane.name, line.name, events))
    return out


def summarize(events, top=30):
    """Per-op-name self-time table + gap analysis over the busy envelope."""
    agg = collections.defaultdict(lambda: [0, 0])  # name -> [ns, count]
    for name, _, dur in events:
        agg[name][0] += dur
        agg[name][1] += 1
    total = sum(v[0] for v in agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]

    # Gap analysis: merge event intervals, report idle stretches.
    iv = sorted((s, s + d) for _, s, d in events if d > 0)
    merged = []
    for s, e in iv:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    gaps = []
    for (s0, e0), (s1, e1) in zip(merged, merged[1:]):
        if s1 - e0 > 50_000:  # > 50 us
            gaps.append((e0, s1 - e0))
    span = merged[-1][1] - merged[0][0] if merged else 0
    busy = sum(e - s for s, e in merged)
    return {
        "total_self_ns": total,
        "span_ns": span,
        "busy_ns": busy,
        "rows": [(n, v[0], v[1]) for n, v in rows],
        "gaps": gaps,
    }


def print_summary(plane_name, s):
    print(f"== {plane_name} ==")
    print(
        f"span {s['span_ns'] / 1e6:.3f} ms | busy {s['busy_ns'] / 1e6:.3f} ms "
        f"({100 * s['busy_ns'] / max(1, s['span_ns']):.1f}%) | "
        f"self-time sum {s['total_self_ns'] / 1e6:.3f} ms"
    )
    print(f"{'self ms':>10} {'n':>6}  op")
    for name, ns, cnt in s["rows"]:
        print(f"{ns / 1e6:>10.3f} {cnt:>6}  {name[:110]}")
    if s["gaps"]:
        print(f"idle gaps > 50us: {len(s['gaps'])}, "
              f"total {sum(g for _, g in s['gaps']) / 1e6:.3f} ms, "
              f"largest {max(g for _, g in s['gaps']) / 1e6:.3f} ms")


def run_and_profile(mode: str, logdir: str):
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from mhentropy_tpu.core import mano
    from mhentropy_tpu.flows.realnvp import RealNVPConfig
    from mhentropy_tpu.models import mhent
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    import os as _os

    n_hypo, batch, img, steps = 100, 32, 256, 20
    _v = _os.environ.get("MHENT_FUSED_BN", "0")  # r5 BN-kernel A/B knob
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet50", n_latent=(512, 512),
                              fused_train_bn={"0": False, "1": True}
                              .get(_v, _v)),
        flow=RealNVPConfig(dim=45, cond_dim=512, h_dim=512, num_steps=6),
        feat_dim=512,
        image_size=img,
    )
    model = mano.synthetic_mano_model(0)
    params, batch_stats = mhent.init(jax.random.key(0), cfg)

    if mode == "train":
        from mhentropy_tpu.data import synthetic
        from mhentropy_tpu.parallel import mesh as mesh_lib
        from mhentropy_tpu.train import engine

        mesh = mesh_lib.make_mesh(n_devices=1)
        optimizer = engine.make_optimizer(2e-4, [100], steps_per_epoch=10)
        state = engine.init_state(jax.random.key(0), cfg, optimizer)
        data = synthetic.make_dataset(model, n=batch, image_size=img, seed=0)
        image = jnp.asarray(data.images)
        target = {k: jnp.asarray(v) for k, v in data.targets.items()}
        step = engine.make_train_step(model, cfg, optimizer, mesh)
        state, aux = step(state, image, target, jax.random.key(1))
        jax.block_until_ready(aux["loss"])
        with jax.profiler.trace(logdir):
            for i in range(5):
                state, aux = step(state, image, target, jax.random.fold_in(jax.random.key(2), i))
            jax.block_until_ready(aux["loss"])
        return

    quant_arg = None
    if mode == "quant":
        from mhentropy_tpu.models import quant

        calib = jax.random.uniform(
            jax.random.key(2), (batch, img, img, 3)) * 2 - 1
        quant_arg = quant.quantize_encoder(
            params["encoder"], batch_stats, cfg.encoder, calib)

    def one_step(params, batch_stats, image, key):
        out = mhent.sample_hypotheses(
            model, params, batch_stats, cfg, image, key, n=n_hypo, temp=0.8,
            mods=("xyz", "uv"), quant=quant_arg,
        )
        return out["xyz"], out["uv"]

    @jax.jit
    def scan_steps(params, batch_stats, image, key):
        def body(carry, k):
            img_k = image + jax.random.uniform(k, (1,)) * 1e-6
            xyz, uv = one_step(params, batch_stats, img_k, k)
            return carry + (xyz.sum() + uv.sum()) * 1e-20, None

        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, steps))
        return acc

    key = jax.random.key(1)
    image = jax.random.uniform(jax.random.key(2), (batch, img, img, 3)) * 2 - 1
    jax.block_until_ready(scan_steps(params, batch_stats, image, key))
    with jax.profiler.trace(logdir):
        acc = scan_steps(params, batch_stats, image, jax.random.fold_in(key, 7))
        jax.block_until_ready(acc)
    print(f"profiled {steps} scanned steps (N={n_hypo}, B={batch})")


def main(argv):
    if argv and argv[0] == "parse":
        logdir = argv[1]
    else:
        mode = argv[0] if argv else "infer"
        logdir = f"/tmp/mhent_profile_{mode}"
        run_and_profile(mode, logdir)
    for path in _find_xplanes(logdir)[-1:]:
        print(f"# {path}")
        for plane_name, line_name, events in parse_xplane(path):
            print_summary(f"{plane_name} / {line_name}", summarize(events))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
