"""Serving export: serialize the flagship inference pipeline to StableHLO.

Production-deployment story the reference lacks entirely: the jitted
multi-hypothesis sampler (encoder + flow + MANO decode, i.e. everything
`hand/network.py:846-883` does) is exported with `jax.export` into a
self-contained StableHLO artifact that a serving system (or a later jax
process, possibly without the framework installed) can deserialize and call.

Notes:
  - Export is platform-specific: exporting under a TPU backend bakes the
    TPU lowering (including the fused Pallas sampler custom-call); under
    CPU it bakes the XLA path. Artifacts record their lowering platform
    and refuse to run elsewhere.
  - Shapes are static (batch, n fixed at export time) — the serving-side
    contract a batcher pads to, exactly like any XLA serving deployment.
"""

from __future__ import annotations

import argparse
import json


def make_sample_fn(model, cfg, n: int, temp: float, mods=("xyz", "uv"),
                   quant=None):
    """The jittable serving entry: (params, batch_stats, image, raw_key).

    raw_key is the uint32 key data (`jax.random.key_data(key)`) — typed PRNG
    keys don't cross the serialization boundary, raw arrays do.

    quant: optional (QuantSpec, qtree) — the int8 W8A8 encoder
    (models/quant.py). The qtree is closed over, so the int8 weights and
    scales bake into the artifact as constants — the fixed-checkpoint
    deployment shape (also the faster one: XLA constant-folds the int8
    weight relayouts, docs/PERF.md). CAVEAT that follows: the artifact
    still takes `params` per call, but with quant set the encoder
    BACKBONE comes from the baked qtree — call-time params feed only the
    mu head, flow, and decode. Build the qtree from the same checkpoint
    you deploy.
    """
    import jax

    from mhentropy_tpu.models import mhent

    def sample(params, batch_stats, image, raw_key):
        key = jax.random.wrap_key_data(raw_key)
        out = mhent.sample_hypotheses(
            model, params, batch_stats, cfg, image, key, n=n, temp=temp,
            mods=mods, quant=quant,
        )
        return {m: out[m] for m in mods}

    return sample


_REGISTERED = False


def _register_param_types():
    """NamedTuple containers in the params pytree need named serializers."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from mhentropy_tpu.flows.realnvp import RealNVPParams

    jexport.register_namedtuple_serialization(
        RealNVPParams, serialized_name="mhentropy_tpu.RealNVPParams"
    )
    _REGISTERED = True


def export_sampler(
    model, cfg, params, batch_stats, batch: int, n: int = 100,
    temp: float = 0.8, mods=("xyz", "uv"), quant=None,
) -> bytes:
    """Serialize the sampler for `batch` images to a StableHLO artifact."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    _register_param_types()

    fn = make_sample_fn(model, cfg, n, temp, mods, quant=quant)
    img = jax.ShapeDtypeStruct((batch, cfg.image_size, cfg.image_size, 3),
                               jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    exported = jexport.export(jax.jit(fn))(params, batch_stats, img, key)
    return exported.serialize()


def load_sampler(blob: bytes):
    """Deserialize an exported sampler; returns an object with .call(...)."""
    from jax import export as jexport

    _register_param_types()
    return jexport.deserialize(blob)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out", help="artifact path (.stablehlo)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=100)
    p.add_argument("--temp", type=float, default=0.8)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--quantize", action="store_true",
                   help="bake the int8 W8A8 encoder into the artifact "
                        "(calibrates on random images here; pass real "
                        "calibration data via the library API). The "
                        "baked backbone ignores call-time params — "
                        "combine with --pth for a deployable artifact.")
    p.add_argument("--pth", default=None,
                   help="torch .pth checkpoint (the reference's release "
                        "format, via tools/convert_torch) to export "
                        "instead of fresh-init params")
    p.add_argument("--mano", default="./mano/",
                   help="MANO asset dir; a deployable export needs the "
                        "real MANO_RIGHT.pkl (falls back to the synthetic "
                        "fixture model with a warning)")
    args = p.parse_args()

    import sys

    import jax

    from mhentropy_tpu.core import mano
    from mhentropy_tpu.flows.realnvp import RealNVPConfig
    from mhentropy_tpu.models import mhent
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig
    from mhentropy_tpu.train import engine

    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone=args.backbone, n_latent=(512, 512)),
        flow=RealNVPConfig(dim=45, cond_dim=512, h_dim=512, num_steps=6),
        feat_dim=512,
        image_size=args.image_size,
    )
    # The MANO model bakes into the artifact as constants — a deployable
    # export must use the real assets, not the synthetic fixture.
    model = engine.load_mano_model(args.mano)
    if not mano.find_mano_assets(args.mano):
        print(f"WARNING: no MANO assets under {args.mano} — baking the "
              "SYNTHETIC fixture model; decoded xyz/uv/verts are only "
              "meaningful against the same fixture (pass --mano)",
              file=sys.stderr)
    params, batch_stats = mhent.init(jax.random.key(0), cfg)
    if args.pth:
        from tools.convert_torch import load_torch_checkpoint

        params = load_torch_checkpoint(args.pth, cfg)
        batch_stats = params.pop("_batch_stats", batch_stats)
    quant_arg = None
    if args.quantize:
        if not args.pth:
            print("WARNING: --quantize without --pth bakes a FRESH-INIT "
                  "int8 backbone into the artifact; call-time params "
                  "cannot replace it (make_sample_fn docstring)",
                  file=sys.stderr)
        print("WARNING: --quantize calibrates activation scales on random "
              "uniform images; for a deployable artifact calibrate on real "
              "batches via quant.quantize_encoder and the library API",
              file=sys.stderr)
        from mhentropy_tpu.models import quant

        calib = jax.random.uniform(
            jax.random.key(3),
            (args.batch, args.image_size, args.image_size, 3)) * 2 - 1
        spec, qtree = quant.quantize_encoder(
            params["encoder"], batch_stats, cfg.encoder, calib)
        if quant.sampler_supported(cfg):
            # Match the serve/engine quantized defaults: the int8 fused
            # sampler rides the same qtree (+5.1% measured) — exporting
            # encoder-only silently left an unexplained gap vs the
            # serving path.
            spec, qtree = quant.quantize_sampler_into(
                spec, qtree, params, cfg.flow, calib,
                temp=max(1.0, args.temp))
        quant_arg = (spec, qtree)
    blob = export_sampler(model, cfg, params, batch_stats, args.batch,
                          n=args.n, temp=args.temp, quant=quant_arg)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(json.dumps({
        "path": args.out,
        "bytes": len(blob),
        "platform": jax.default_backend(),
        "batch": args.batch,
        "n": args.n,
    }))


if __name__ == "__main__":
    main()
