"""Serving export round-trip: StableHLO artifact == live pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from mhentropy_tpu.core import mano
from mhentropy_tpu.flows.realnvp import RealNVPConfig
from mhentropy_tpu.models import mhent
from mhentropy_tpu.models.encoder import EncoderConfig
from mhentropy_tpu.models.mhent import MHEntConfig
from tools import export as export_lib

BATCH, IMG, N = 2, 64, 4


def _tiny_setup():
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(32, 32)),
        flow=RealNVPConfig(dim=45, cond_dim=32, h_dim=32, num_steps=2),
        feat_dim=32,
        image_size=IMG,
    )
    model = mano.synthetic_mano_model(0)
    params, batch_stats = mhent.init(jax.random.key(0), cfg)
    return cfg, model, params, batch_stats


def test_export_roundtrip_matches_live():
    cfg, model, params, batch_stats = _tiny_setup()
    blob = export_lib.export_sampler(
        model, cfg, params, batch_stats, BATCH, n=N, temp=0.8
    )
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    image = jax.random.uniform(jax.random.key(1), (BATCH, IMG, IMG, 3)) * 2 - 1
    key = jax.random.key(2)
    raw_key = jax.random.key_data(key).astype(jnp.uint32)

    live = export_lib.make_sample_fn(model, cfg, N, 0.8)(
        params, batch_stats, image, raw_key
    )
    restored = export_lib.load_sampler(blob)
    served = restored.call(params, batch_stats, image, raw_key)

    assert set(served.keys()) == {"xyz", "uv"}
    # The AOT-compiled artifact and the live jit differ at bf16-matmul
    # level (different compile flags); mm-scale agreement is the serving
    # contract.
    np.testing.assert_allclose(
        np.asarray(served["xyz"]), np.asarray(live["xyz"]), rtol=1e-2, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(served["uv"]), np.asarray(live["uv"]), rtol=1e-2, atol=0.2
    )


def test_quantized_export_roundtrip_matches_live():
    """int8 W8A8 export: the qtree bakes into the artifact as constants;
    the served outputs match the live quantized pipeline."""
    from mhentropy_tpu.models import quant

    cfg, model, params, batch_stats = _tiny_setup()
    image = jax.random.uniform(jax.random.key(1), (BATCH, IMG, IMG, 3)) * 2 - 1
    qarg = quant.quantize_encoder(params["encoder"], batch_stats,
                                  cfg.encoder, image)
    blob = export_lib.export_sampler(
        model, cfg, params, batch_stats, BATCH, n=N, temp=0.8, quant=qarg
    )
    raw_key = jax.random.key_data(jax.random.key(2)).astype(jnp.uint32)
    live = export_lib.make_sample_fn(model, cfg, N, 0.8, quant=qarg)(
        params, batch_stats, image, raw_key
    )
    served = export_lib.load_sampler(blob).call(
        params, batch_stats, image, raw_key)
    np.testing.assert_allclose(
        np.asarray(served["xyz"]), np.asarray(live["xyz"]), rtol=1e-2,
        atol=0.05)


def test_sharded_export_roundtrip():
    """A data-sharded serving artifact exports and serves on the 8-device
    virtual mesh (the multi-chip serving path of tools/export.py)."""
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mhentropy_tpu.parallel import mesh as mesh_lib

    cfg, model, params, batch_stats = _tiny_setup()
    mesh = mesh_lib.make_mesh(n_devices=8, hypo=2)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    fn = export_lib.make_sample_fn(model, cfg, N, 0.8)
    jf = jax.jit(fn, in_shardings=(repl, repl, data, repl), out_shardings=repl)
    img = jax.ShapeDtypeStruct((8, IMG, IMG, 3), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    export_lib._register_param_types()
    exported = jexport.export(jf)(params, batch_stats, img, key)
    assert exported.nr_devices == 8

    restored = export_lib.load_sampler(exported.serialize())
    image = jax.device_put(
        jax.random.uniform(jax.random.key(1), (8, IMG, IMG, 3)) * 2 - 1, data
    )
    raw_key = jax.random.key_data(jax.random.key(2)).astype(jnp.uint32)
    served = jax.jit(restored.call)(params, batch_stats, image, raw_key)
    live = jf(params, batch_stats, image, raw_key)
    np.testing.assert_allclose(
        np.asarray(served["xyz"]), np.asarray(live["xyz"]), rtol=1e-2, atol=0.05
    )
