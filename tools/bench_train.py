"""Train-step throughput bench (honest methodology — see CLAUDE.md):
50 optimisation steps inside one jitted lax.scan, per-step perturbed
images, state threaded through the carry so no step can be elided.
(At 10 steps the ~25 ms relay dispatch RTT was still 2.5 ms/step = 11%
of the report; a real epoch is hundreds of steps.)

Prints ONE JSON line. Run on the TPU: `python tools/bench_train.py`.
r2 measured: 23.4 ms/step at 10 scanned steps; late-r3: 19.9 ms at 50
(1,611 imgs/s — same device math as the earlier 22.6 ms/10-step number,
minus the amortised dispatch RTT).
"""
import time, json
from mhentropy_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from mhentropy_tpu.core import mano
from mhentropy_tpu.flows.realnvp import RealNVPConfig
from mhentropy_tpu.models import mhent
from mhentropy_tpu.models.encoder import EncoderConfig
from mhentropy_tpu.models.mhent import MHEntConfig
from mhentropy_tpu.train import engine
import optax

import os

batch, img, STEPS = 32, 256, 50
# A/B switch for the r5 fused train-mode BN kernels (models/bn_pallas.py):
# MHENT_FUSED_BN=1 -> "stats" mode (fwd stats reduction only);
# MHENT_FUSED_BN=full -> the full custom_vjp (measured loss, kept for the
# record); 0/unset -> flax BatchNorm.
_v = os.environ.get("MHENT_FUSED_BN", "0")
FUSED_BN = {"0": False, "1": True}.get(_v, _v)
cfg = MHEntConfig(
    encoder=EncoderConfig(backbone="resnet50", n_latent=(512, 512),
                          fused_train_bn=FUSED_BN),
    flow=RealNVPConfig(dim=45, cond_dim=512, h_dim=512, num_steps=6),
    feat_dim=512, image_size=img, n_train_hypotheses=10,
)
model = mano.synthetic_mano_model(0)
optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
state = engine.init_state(jax.random.key(0), cfg, optimizer)
key = jax.random.key(1)
from mhentropy_tpu.data import synthetic
data = synthetic.make_dataset(model, n=batch, image_size=img, seed=0)
image, target = next(synthetic.batches(data, batch))
image = jnp.asarray(image)
target = {k: jnp.asarray(v) for k, v in target.items()}


def one_step(state, image, target, key):
    def loss_fn(params):
        out, new_stats = mhent.reverse_kld(
            model, params, state.batch_stats, cfg, target, image, key,
            train=True)
        return -out["log_p"].mean(), (out, new_stats)

    (loss, (out, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return engine.TrainState(params, new_stats, opt_state, state.step + 1), loss


@jax.jit
def scan_steps(state, image, target, key):
    def body(st, k):
        img_k = image + jax.random.uniform(k, (1,)) * 1e-6
        st, loss = one_step(st, img_k, target, k)
        return st, loss

    st, losses = jax.lax.scan(body, state, jax.random.split(key, STEPS))
    return st, losses


st, losses = scan_steps(state, image, target, key)
jax.block_until_ready(losses)
best = 1e9
for r in range(3):
    t0 = time.perf_counter()
    st2, losses = scan_steps(state, image, target, jax.random.fold_in(key, r))
    jax.block_until_ready(losses)
    best = min(best, (time.perf_counter() - t0) / STEPS)
print(json.dumps({"train_step_ms": round(best * 1e3, 3),
                  "imgs_per_sec": round(batch / best, 1),
                  "fused_bn": FUSED_BN,
                  "loss_last": float(losses[-1])}))
