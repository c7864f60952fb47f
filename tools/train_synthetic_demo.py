"""Learning demo: train MHEnt on the synthetic fixture and report
best-hypothesis MPJPE before/after — evidence the entropy-augmented
reverse-KL objective optimises end to end on TPU.

Usage: python -m tools.train_synthetic_demo [epochs] [lr] [backbone] [img]
(e.g. `... 30 2e-4 resnet50 256` runs the PTQ accuracy check at the
shipped serving geometry — the int8-kernel q_from="auto"=0 path.)
"""

import sys
import time

import jax
import numpy as np


def main(epochs: int = 30, lr: float = 2e-4, backbone: str = "resnet18",
         img: int = 64):
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mhentropy_tpu.core import mano
    from mhentropy_tpu.data import synthetic
    from mhentropy_tpu.flows.realnvp import RealNVPConfig
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig
    from mhentropy_tpu.parallel import mesh as mesh_lib
    from mhentropy_tpu.train import engine

    bs, n_train = 32, 256
    # backbone/img args let the PTQ accuracy check run at the SHIPPED
    # serving geometry (resnet50 @ 256px bf16 — the q_from="auto"=0
    # int8-kernel path) instead of the CI-sized default.
    big = backbone == "resnet50"
    cfg = MHEntConfig(
        encoder=EncoderConfig(
            backbone=backbone,
            n_latent=(512, 512) if big else (128, 128),
            dtype="bfloat16" if big else "float32"),
        flow=RealNVPConfig(dim=45, cond_dim=512 if big else 128,
                           h_dim=512 if big else 256,
                           num_steps=6 if big else 4),
        feat_dim=512 if big else 128,
        image_size=img,
        n_train_hypotheses=10,
        b_2d=0.03,
    )
    model = mano.synthetic_mano_model(0)
    mesh = mesh_lib.make_mesh(hypo=1)
    steps_per_epoch = n_train // bs
    optimizer = engine.make_optimizer(lr, [int(epochs * 0.8)], steps_per_epoch)
    state = engine.init_state(jax.random.key(0), cfg, optimizer)

    train = synthetic.make_dataset(model, n=n_train, image_size=img, seed=0,
                                   occlusion_rate=0.3)
    evald = synthetic.make_dataset(model, n=64, image_size=img, seed=1,
                                   occlusion_rate=0.3)

    step = engine.make_train_step(model, cfg, optimizer, mesh)
    eval_step = engine.make_eval_step(model, cfg, mesh, n=100, temp=0.8)

    def evaluate(step_fn=None, qargs=()):
        step_fn = step_fn or eval_step
        batch_mets = []
        for i in range(0, 64, bs):
            im = jax.numpy.asarray(evald.images[i : i + bs])
            tg = {k: jax.numpy.asarray(v[i : i + bs]) for k, v in evald.targets.items()}
            batch_mets.append(step_fn(state.params, state.batch_stats, im, tg,
                                      jax.random.key(9), *qargs))
        # ONE device_get for the whole eval (a per-scalar fetch costs ~25 ms
        # of relay round trip — docs/PERF.md).
        mets = {}
        for m in jax.device_get(batch_mets):
            for k, v in m.items():
                mets.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in mets.items()}

    def report(tag, m):
        print(
            f"{tag}: BH-MPJPE {m['eucLoss_3d_rgb_sample'] * 1000:.2f} mm  "
            f"2D-vis WH {m['eucLoss_2d_rgb_vis']:.2f} px  "
            f"2D-vis mean {m['eucLoss_2d_rgb_vis_mean']:.2f} px  "
            f"3D-occ PJD {m['eucLoss_3d_rgb_invis_std'] * 1000:.2f} mm",
            flush=True,
        )

    before = evaluate()
    report("before", before)

    # Stage all batches on device once — per-step H2D through the relay
    # dominates otherwise.
    staged = []
    for i in range(0, n_train, bs):
        im = jax.numpy.asarray(train.images[i : i + bs])
        tg = {k: jax.numpy.asarray(v[i : i + bs]) for k, v in train.targets.items()}
        staged.append((im, tg))

    key = jax.random.key(42)
    t0 = time.time()
    for epoch in range(epochs):
        for im, tg in staged:
            key, k = jax.random.split(key)
            state, aux = step(state, im, tg, k)
        if epoch % 10 == 0 or epoch == epochs - 1:
            print(f"epoch {epoch}: loss {float(aux['loss']):.1f} "
                  f"h_q {float(aux['h_q']):.1f}", flush=True)
    print(f"trained {epochs} epochs in {time.time() - t0:.0f}s", flush=True)

    after = evaluate()
    report("after", after)

    # int8 W8A8 eval of the TRAINED model — the PTQ accuracy check:
    # quantized BH-MPJPE vs float on the same split and sampling keys.
    from mhentropy_tpu.models import quant

    spec, qtree = quant.quantize_encoder(
        state.params["encoder"], state.batch_stats, cfg.encoder,
        jax.numpy.asarray(evald.images[:bs]))
    qstep = engine.make_eval_step(model, cfg, mesh, n=100, temp=0.8,
                                  quant_spec=spec)
    after_q = evaluate(qstep, (qtree,))
    report("after-int8", after_q)
    delta = (after_q["eucLoss_3d_rgb_sample"]
             - after["eucLoss_3d_rgb_sample"]) * 1000
    print(f"int8 BH-MPJPE delta {delta:+.3f} mm", flush=True)

    # + int8 fused sampler (the full default quantized path): accuracy of
    # the quantized hypothesis draw on the trained model.
    if quant.sampler_supported(cfg):
        spec_s, qtree_s = quant.quantize_sampler_into(
            spec, qtree, state.params, cfg.flow,
            jax.numpy.asarray(evald.images[:bs]), temp=0.8)
        qsstep = engine.make_eval_step(model, cfg, mesh, n=100, temp=0.8,
                                       quant_spec=spec_s)
        after_qs = evaluate(qsstep, (qtree_s,))
        report("after-int8+sampler", after_qs)
        delta_s = (after_qs["eucLoss_3d_rgb_sample"]
                   - after["eucLoss_3d_rgb_sample"]) * 1000
        print(f"int8+sampler BH-MPJPE delta {delta_s:+.3f} mm", flush=True)

    drop = 1.0 - after["eucLoss_3d_rgb_sample"] / before["eucLoss_3d_rgb_sample"]
    improved = drop > 0
    print(f"BH-MPJPE drop {drop * 100:.1f}%  "
          + ("IMPROVED" if improved else "NOT IMPROVED"), flush=True)
    return 0 if improved else 1


if __name__ == "__main__":
    sys.exit(main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 30,
        float(sys.argv[2]) if len(sys.argv) > 2 else 2e-4,
        sys.argv[3] if len(sys.argv) > 3 else "resnet18",
        int(sys.argv[4]) if len(sys.argv) > 4 else 64,
    ))
