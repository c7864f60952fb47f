"""Production serving for the MHEnt inference pipeline.

The reference has no serving story (its eval loop is the only inference
path, hand/CrossModalHand.py:469-610); this module is the TPU-native
deployment component: a bucketed-batch inference server around the
flagship pipeline (encoder -> conditional flow -> MANO decode ->
projection), usable as a library (`InferenceServer.predict`) or as a
stdlib-only HTTP service (`python -m mhentropy_tpu.serve`).

TPU-shaped design decisions:

* **Static shape buckets.** XLA compiles one program per (batch, n) shape;
  arbitrary request sizes would recompile per request. Requests pad up to
  the nearest power-of-two bucket (1, 2, 4, ..., max_batch) and the padded
  rows' outputs are dropped. Every bucket is compiled once, up front
  (`warmup()`), so the serving path never hits the compiler.
* **One dispatch per request.** `predict` enqueues the whole pipeline as
  one pre-compiled program and blocks only on the device-to-host fetch
  of the (B, N, K, ·) results — there is no per-stage host round-trip.
  (The fetch itself is synchronous; through this box's relay it is the
  dominant share of per-call latency — docs/PERF.md "serving latency".)
* **Checkpoints.** Orbax pytrees (this framework's format) and converted
  torch `.pth` (the reference's format, via tools/convert_torch) both
  restore into the same param schema; absent checkpoint = fresh init
  (useful for smoke/load tests).
"""

from __future__ import annotations

import json
import time
from typing import Any

import numpy as np


def _buckets(max_batch: int) -> list[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    return out + [max_batch]


class InferenceServer:
    """Bucketed-batch multi-hypothesis inference.

    Args:
        cfg: full experiment config (utils/config.py schema).
        checkpoint: optional path (orbax dir or torch .pth).
        max_batch: largest request batch served in one dispatch.
        n_hypo: hypotheses per image (the config's test_samples if None).
        temp: sampling temperature (reference eval uses 0.8).
        quantize: run the encoder int8 W8A8 (models/quant.py, +21%
            measured at B=32). Activation scales calibrate on the FIRST
            real predict() batch (warmup's zero images carry no signal),
            then stay fixed — params are static after restore.
        quantize_min_batch: smallest bucket served int8. At tiny batches
            the convs are latency-bound and the requant passes make int8
            a LOSS (B=1: 0.80x measured) — small buckets stay bf16.
        transports: which input dtypes warmup() pre-compiles. uint8
            requests carry RAW pixels (4x smaller wire payload + H2D —
            one f32 256px frame is ~786 KB, ~several ms through the
            relay vs a 0.43 ms device step) and are normalised on
            device with the dataset affine; float32 requests are
            already dataset-normalised, as before.
    """

    def __init__(self, cfg, checkpoint: str | None = None,
                 max_batch: int = 8, n_hypo: int | None = None,
                 temp: float = 0.8, quantize: bool = False,
                 quantize_min_batch: int = 8,
                 transports: tuple = ("f32", "u8"),
                 mano_dir: str = "./mano/"):
        import sys as _sys

        import jax

        from mhentropy_tpu.train import engine

        self.cfg = cfg
        self.model_cfg = engine.build_model_config(cfg)
        self.model = engine.load_mano_model(mano_dir)
        if engine._mano_fingerprint(mano_dir) is None:
            # Loud: with a real checkpoint restored, decoding through the
            # synthetic stand-in returns plausible-looking garbage with
            # HTTP 200 (tools/export.py warns the same way).
            print(f"WARNING: no MANO assets under {mano_dir!r} — serving "
                  f"with the SYNTHETIC stand-in model; real-checkpoint "
                  f"outputs will be garbage (pass --mano)",
                  file=_sys.stderr, flush=True)
        self.n_hypo = int(n_hypo or cfg.training.test_samples)
        self.temp = float(temp)
        self.max_batch = int(max_batch)
        self.image_size = self.model_cfg.image_size

        optimizer = engine.make_optimizer(1e-4, [1], steps_per_epoch=1)
        state = engine.init_state(jax.random.key(0), self.model_cfg, optimizer)
        self.params, self.batch_stats = state.params, state.batch_stats
        # Kept only as the orbax restore template (checkpoints written by
        # Experiment.save_model carry the full train state).
        self._state_template = state
        if checkpoint:
            self._restore(checkpoint)

        self._fns: dict[tuple, Any] = {}
        self.transports = tuple(transports)
        # Raw-u8 inputs get the dataset's normalisation on device — the
        # same per-dataset affine the loaders ship per sample (HO3D:
        # x*2/255-1, ho3d.py _img_scale/_img_bias ~ ho3d_dataloader.py:
        # 404-405; RHD/FreiHAND: x/255). f32 inputs are pre-normalised
        # by contract. mixed_ho3d_rhd trains with per-member affines, so
        # no single u8 affine exists — u8 transport is disabled for it.
        name = cfg.dataset.dataset_name if "dataset" in cfg else "rhd"
        if name.startswith("ho3d"):
            self.image_norm = (2.0 / 255.0, -1.0)
        elif name.startswith("rhd") or name.startswith("freihand"):
            self.image_norm = (1.0 / 255.0, 0.0)
        else:
            # mixed (per-member affines) or an unknown dataset: no single
            # u8 affine exists — serve f32 pre-normalised frames only.
            self.image_norm = None
            self.transports = tuple(t for t in self.transports if t != "u8")
        self.quantize = bool(quantize)
        self.quantize_min_batch = int(quantize_min_batch)
        if self.quantize and self.max_batch < self.quantize_min_batch:
            print(f"WARNING: --quantize requested but max_batch "
                  f"{self.max_batch} < quantize_min_batch "
                  f"{self.quantize_min_batch}: every bucket will serve "
                  f"bf16 (int8 LOSES below ~B=8 — raise max_batch or "
                  f"lower --quantize-min-batch to engage int8)",
                  file=_sys.stderr, flush=True)
        self._quant = None  # (spec, qtree)
        self._quant_ready = False  # calibrated on real data yet?
        self._key = jax.random.key(int(time.time()) & 0x7FFFFFFF)

    def _restore(self, path: str) -> None:
        import os

        if path.endswith(".pth"):
            from tools.convert_torch import load_torch_checkpoint

            params = load_torch_checkpoint(path, self.model_cfg)
            self.batch_stats = params.pop("_batch_stats", self.batch_stats)
            self.params = params
            return
        import orbax.checkpoint as ocp

        template = {
            "params": self._state_template.params,
            "batch_stats": self._state_template.batch_stats,
            "opt_state": self._state_template.opt_state,
            "step": self._state_template.step,
        }
        with ocp.StandardCheckpointer() as loader:
            ckpt = loader.restore(os.path.abspath(path), template)
        self.params, self.batch_stats = ckpt["params"], ckpt["batch_stats"]

    def _fn(self, batch: int, quantized: bool = False):
        import jax

        from mhentropy_tpu.models import mhent

        key = (batch, quantized)
        if key not in self._fns:
            cfg, model = self.model_cfg, self.model
            n = self.n_hypo
            spec = self._quant[0] if quantized else None
            scale, bias = self.image_norm or (1.0, 0.0)

            @jax.jit
            def run(params, batch_stats, image, k, temp, *qtree):
                if image.dtype == np.uint8:
                    # Raw-u8 transport: dataset normalisation on device
                    # (trace-time branch; XLA fuses it into the stem).
                    image = image.astype("float32") * scale + bias
                out = mhent.sample_hypotheses(
                    model, params, batch_stats, cfg, image, k, n=n,
                    temp=temp, mods=("xyz", "uv"),
                    quant=(spec, qtree[0]) if quantized else None,
                )
                return out["xyz"], out["uv"]

            self._fns[key] = run
        return self._fns[key]

    def _calibrate(self, images, ready: bool) -> None:
        """Build the int8 qtree. ready=False marks a shape-only
        calibration (warmup zeros) to be redone on the first real batch.
        The calibration input is always tiled/truncated to ONE fixed
        batch shape (the smallest quantized bucket), so the redo reuses
        both the compiled calibration forward and the sampling programs —
        serving never hits the compiler after warmup."""
        import numpy as np

        from mhentropy_tpu.models import quant

        cb = next(b for b in _buckets(self.max_batch)
                  if b >= self.quantize_min_batch)
        images = np.asarray(images)
        if images.dtype == np.uint8:  # calibration runs on normalised f32
            scale, bias = self.image_norm
            images = images.astype(np.float32) * scale + bias
        else:
            images = images.astype(np.float32, copy=False)
        reps = -(-cb // images.shape[0])  # ceil
        calib = np.tile(images, (reps, 1, 1, 1))[:cb]
        q_from = self.cfg.tpu.get("quantize_q_from", "auto") \
            if "tpu" in self.cfg else "auto"
        spec, qtree = quant.quantize_encoder(
            self.params["encoder"], self.batch_stats,
            self.model_cfg.encoder, calib, q_from=q_from)
        if (bool(self.cfg.tpu.get("quantize_sampler", True))
                if "tpu" in self.cfg else True) \
                and quant.sampler_supported(self.model_cfg):
            # int8 fused hypothesis sampler (+5.1% measured on top of the
            # int8 encoder). Calibrated with temperature headroom:
            # max(1, self.temp) covers per-request temp overrides up to
            # 1.0 — a request hotter than calibrated would saturate the
            # flow's first-layer int8 clip.
            spec, qtree = quant.quantize_sampler_into(
                spec, qtree, self.params, self.model_cfg.flow, calib,
                temp=max(1.0, self.temp))
        self._quant = (spec, qtree)
        self._quant_ready = ready

    def warmup(self) -> None:
        """Compile every (bucket, transport) up front (serving never hits
        the compiler)."""
        import jax

        dtypes = [
            {"f32": np.float32, "u8": np.uint8}[t] for t in self.transports
        ]
        for b in _buckets(self.max_batch):
            for dt in dtypes:
                img = np.zeros(
                    (b, self.image_size, self.image_size, 3), dt
                )
                if self._quantized_bucket(b):
                    if self._quant is None:
                        self._calibrate(img, ready=False)
                    xyz, uv = self._fn(b, True)(
                        self.params, self.batch_stats, img, self._key,
                        np.float32(self.temp), self._quant[1],
                    )
                else:
                    xyz, uv = self._fn(b)(
                        self.params, self.batch_stats, img, self._key,
                        np.float32(self.temp),
                    )
                jax.block_until_ready(xyz)

    def _quantized_bucket(self, bucket: int) -> bool:
        return self.quantize and bucket >= self.quantize_min_batch

    def predict(self, images: np.ndarray, temp: float | None = None) -> dict:
        """(B, H, W, 3) images -> hypotheses. float32 inputs are
        dataset-normalised by the caller (as before); uint8 inputs are RAW
        pixels, normalised on device (4x less wire + H2D per frame).

        Returns {"xyz": (B, N, K, 3), "uv": (B, N, K, 2)} numpy arrays.
        B may be anything <= max_batch; it pads to the nearest bucket.
        """
        import jax

        images = np.asarray(images)
        if images.dtype == np.uint8 and self.image_norm is None:
            raise ValueError(
                "raw-u8 transport is unavailable for this dataset config "
                "(no single normalisation affine) — send float32 "
                "pre-normalised frames"
            )
        if images.dtype != np.uint8:
            images = images.astype(np.float32)
        if images.ndim == 3:
            images = images[None]
        b = images.shape[0]
        if b > self.max_batch:
            parts = [
                self.predict(images[i : i + self.max_batch], temp)
                for i in range(0, b, self.max_batch)
            ]
            return {
                k: np.concatenate([p[k] for p in parts]) for k in parts[0]
            }
        bucket = next(x for x in _buckets(self.max_batch) if x >= b)
        if bucket != b:
            pad = np.zeros((bucket - b, *images.shape[1:]), images.dtype)
            images = np.concatenate([images, pad])
        self._key, sub = jax.random.split(self._key)
        t_req = float(self.temp if temp is None else temp)
        use_quant = self._quantized_bucket(bucket)
        if use_quant and t_req > max(1.0, self.temp):
            # The FlowQTree is calibrated at max(1, self.temp)
            # (quantize_sampler_into); beyond that the int8 first-layer
            # clip saturates and quality degrades SILENTLY — serve this
            # request bf16 instead.
            import sys as _sys

            print(f"serve: temp {t_req} exceeds the int8 calibration "
                  f"ceiling {max(1.0, self.temp)}; serving this request "
                  f"bf16", file=_sys.stderr, flush=True)
            use_quant = False
        if use_quant:
            if not self._quant_ready:
                self._calibrate(images, ready=True)
            xyz, uv = self._fn(bucket, True)(
                self.params, self.batch_stats, images, sub,
                np.float32(self.temp if temp is None else temp),
                self._quant[1],
            )
        else:
            xyz, uv = self._fn(bucket)(
                self.params, self.batch_stats, images, sub,
                np.float32(self.temp if temp is None else temp),
            )
        # (N, B', K*d) flat -> (B, N, K, d) request-major, padding dropped.
        n = xyz.shape[0]
        xyz = np.asarray(xyz).reshape(n, bucket, -1, 3).transpose(1, 0, 2, 3)[:b]
        uv = np.asarray(uv).reshape(n, bucket, -1, 2).transpose(1, 0, 2, 3)[:b]
        return {"xyz": xyz, "uv": uv}


def _http_serve(server: InferenceServer, host: str, port: int):
    """Stdlib HTTP front end: POST /predict with a raw image body of
    shape (B, S, S, 3) (header X-Batch: B; X-Dtype: float32 for
    pre-normalised frames (default) or uint8 for raw pixels — 4x
    smaller payload, normalised on device), JSON hypotheses back.
    GET /healthz for liveness."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    size = server.image_size

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps(
                    {"ok": True, "image_size": size, "n_hypo": server.n_hypo}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/predict":
                self.send_response(404)
                self.end_headers()
                return
            def bad(msg):
                # Drain the request body first: responding with unread
                # data in the socket RSTs the connection on many stacks
                # and the client sees ECONNRESET instead of this JSON.
                try:
                    left = int(self.headers.get("Content-Length", 0))
                    while left > 0:
                        chunk = self.rfile.read(min(left, 1 << 20))
                        if not chunk:
                            break
                        left -= len(chunk)
                except (ValueError, OSError):
                    pass
                body = json.dumps({"error": msg}).encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            try:
                n = int(self.headers.get("Content-Length", 0))
                b = int(self.headers.get("X-Batch", 1))
            except ValueError:
                return bad("non-integer Content-Length/X-Batch")
            dt_name = self.headers.get("X-Dtype", "float32")
            if dt_name not in ("float32", "uint8"):
                return bad(f"unsupported X-Dtype {dt_name!r}")
            want = b * size * size * 3 * np.dtype(dt_name).itemsize
            if b < 1 or n != want:
                return bad(
                    f"body is {n} bytes; X-Batch={b} {dt_name} frames "
                    f"at {size}px need {want}"
                )
            raw = self.rfile.read(n)
            images = np.frombuffer(raw, np.dtype(dt_name)).reshape(
                b, size, size, 3
            )
            t0 = time.perf_counter()
            try:
                out = server.predict(images)
            except ValueError as e:  # e.g. u8 frames to an f32-only server
                return bad(str(e))
            ms = (time.perf_counter() - t0) * 1e3
            body = json.dumps(
                {
                    "xyz": out["xyz"].tolist(),
                    "uv": out["uv"].tolist(),
                    "ms": round(ms, 2),
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = HTTPServer((host, port), Handler)
    print(f"serving on {host}:{port} (image_size={size}, "
          f"n_hypo={server.n_hypo})", flush=True)
    httpd.serve_forever()


def main(argv=None):
    import argparse

    from mhentropy_tpu.utils.cache import enable_compilation_cache
    from mhentropy_tpu.utils.config import update_cfg

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8711)
    ap.add_argument("--quantize", action="store_true",
                    help="int8 W8A8 encoder (calibrates on first batch)")
    ap.add_argument("--mano", default="./mano/",
                    help="MANO asset dir (MANO_RIGHT.pkl); absent -> "
                         "synthetic stand-in with a loud warning")
    ap.add_argument("--quantize-min-batch", type=int, default=8,
                    help="smallest bucket served int8 (smaller stay bf16; "
                         "int8 loses at B=1 — docs/PERF.md)")
    ap.add_argument("--transport", choices=("both", "f32", "u8"),
                    default="both",
                    help="input dtypes warmed up for serving (u8 = raw "
                         "pixels normalised on device, 4x smaller payload)")
    args = ap.parse_args(argv)

    enable_compilation_cache()
    cfg = update_cfg(args.cfg)
    server = InferenceServer(
        cfg, checkpoint=args.ckpt, max_batch=args.max_batch, n_hypo=args.n,
        quantize=args.quantize, quantize_min_batch=args.quantize_min_batch,
        transports=("f32", "u8") if args.transport == "both"
        else (args.transport,),
        mano_dir=args.mano,
    )
    print("warming buckets:", _buckets(server.max_batch), flush=True)
    server.warmup()
    _http_serve(server, args.host, args.port)


if __name__ == "__main__":
    main()
