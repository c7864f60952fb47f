"""End-to-end learning proof (VERDICT r2 item 4): training the full MHEnt
reverse-KLD objective from scratch on the synthetic dataset must IMPROVE a
held-out eval metric — not merely reduce the loss on a fixed batch.

Deterministic seeds, tiny shapes, CPU. Calibration (r3, fixed 2D canvas):
200 steps at these shapes give a 73% drop in held-out mean visible-2D
reprojection error (the objective's actual supervision signal,
network.py:641) and a 10% drop in best-hypothesis 3D EPE, while the entropy
term keeps per-joint diversity on occluded joints well above collapse. The
asserted margins are ~half the observed effects. The full-scale record (84%
2D drop, 22.8% BH-3D drop on TPU) lives in docs/PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mhentropy_tpu.core import mano
from mhentropy_tpu.data import synthetic
from mhentropy_tpu.flows.realnvp import RealNVPConfig
from mhentropy_tpu.models.encoder import EncoderConfig
from mhentropy_tpu.models.mhent import MHEntConfig
from mhentropy_tpu.parallel import mesh as mesh_lib
from mhentropy_tpu.train import engine

# 200 steps is LOAD-BEARING: an r5 trim to 160 dropped the unsupervised
# BH-3D improvement to 3.1% (vs 10% at 200) under the 4% floor — the 3D
# metric improves late. ~66 s on the 1-core box; documented straggler.
IMG, BS, N_TRAIN, STEPS = 32, 8, 32, 200


def test_reverse_kld_training_improves_heldout_metrics():
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(64, 64),
                              dtype="float32"),
        flow=RealNVPConfig(dim=45, cond_dim=64, h_dim=64, num_steps=2),
        feat_dim=64,
        image_size=IMG,
        n_train_hypotheses=4,
    )
    model = mano.synthetic_mano_model(0)
    mesh = mesh_lib.make_mesh(n_devices=1)
    optimizer = engine.make_optimizer(1e-3, [10**6], steps_per_epoch=10)
    state = engine.init_state(jax.random.key(0), cfg, optimizer)
    train = synthetic.make_dataset(model, n=N_TRAIN, image_size=IMG, seed=0,
                                   occlusion_rate=0.3)
    evald = synthetic.make_dataset(model, n=16, image_size=IMG, seed=1,
                                   occlusion_rate=0.3)

    step = engine.make_train_step(model, cfg, optimizer, mesh)
    eval_step = engine.make_eval_step(model, cfg, mesh, n=20, temp=0.8)

    def evaluate(state):
        im = jnp.asarray(evald.images)
        tg = {k: jnp.asarray(v) for k, v in evald.targets.items()}
        m = eval_step(state.params, state.batch_stats, im, tg, jax.random.key(9))
        return {k: float(v) for k, v in m.items()}

    before = evaluate(state)

    staged = []
    for i in range(0, N_TRAIN, BS):
        im = jnp.asarray(train.images[i:i + BS])
        tg = {k: jnp.asarray(v[i:i + BS]) for k, v in train.targets.items()}
        staged.append((im, tg))
    key = jax.random.key(42)
    for s in range(STEPS):
        im, tg = staged[s % len(staged)]
        key, k = jax.random.split(key)
        state, _ = step(state, im, tg, k)

    after = evaluate(state)

    # The supervision signal (visible-2D reprojection) must fit on HELD-OUT
    # data: observed 73% drop; assert >= 40%.
    drop_2d = 1.0 - after["eucLoss_2d_rgb_vis_mean"] / before["eucLoss_2d_rgb_vis_mean"]
    assert drop_2d >= 0.40, (before["eucLoss_2d_rgb_vis_mean"],
                             after["eucLoss_2d_rgb_vis_mean"])

    # Best-hypothesis 3D EPE must improve even though 3D is never
    # supervised (priors + reprojection + entropy only): observed 10%;
    # assert >= 4%.
    drop_bh = 1.0 - after["eucLoss_3d_rgb_sample"] / before["eucLoss_3d_rgb_sample"]
    assert drop_bh >= 0.04, (before["eucLoss_3d_rgb_sample"],
                             after["eucLoss_3d_rgb_sample"])

    # The entropy term must keep per-joint diversity on occluded joints
    # from collapsing while the visible fit tightens: observed 12.2 mm
    # post-training; assert a 5 mm floor.
    assert after["eucLoss_3d_rgb_invis_std"] * 1000 >= 5.0, after
    assert np.isfinite(after["loss_total"])
