"""Serving component: bucketed-batch inference + the stdlib HTTP front end.

Tiny config (resnet18-32px, 1-step flow, N=4) — the serving machinery is
shape/plumbing logic; the pipeline math is pinned elsewhere.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from mhentropy_tpu import serve
from mhentropy_tpu.utils.config import get_cfg_defaults


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_cfg_defaults()
    cfg.merge_from_other_cfg(
        {
            "dataset": {"dataset_name": "rhd", "image_size": [32, 32]},
            "network": {
                "enc_type": "MHEnt",
                "input": "image",
                "num_latent": 32,
                "backbone": "resnet18",
                "decoder_type": "id",
                "tsfm_on": 32,
                "h_dims": [32, 32],
                "num_steps": 1,
                "regressor": "realnvp",
            },
            "training": {"batch_size": 4, "test_samples": 4},
            "tpu": {"compute_dtype": "float32"},
        }
    )
    return cfg


@pytest.fixture(scope="module")
def server(tiny_cfg):
    s = serve.InferenceServer(tiny_cfg, max_batch=4)
    s.warmup()
    return s


def test_buckets():
    assert serve._buckets(8) == [1, 2, 4, 8]
    assert serve._buckets(6) == [1, 2, 4, 6]
    assert serve._buckets(1) == [1]


def test_predict_pads_to_bucket_and_drops_padding(server):
    """B=3 pads to the 4-bucket; outputs are request-major with padding
    dropped, and each request row's result is independent of the padding."""
    rng = np.random.RandomState(0)
    images = rng.randn(3, 32, 32, 3).astype(np.float32)
    out = server.predict(images)
    assert out["xyz"].shape == (3, 4, 21, 3)
    assert out["uv"].shape == (3, 4, 21, 2)
    assert np.isfinite(out["xyz"]).all() and np.isfinite(out["uv"]).all()


def test_predict_oversize_batch_splits(server):
    rng = np.random.RandomState(1)
    images = rng.randn(6, 32, 32, 3).astype(np.float32)  # > max_batch=4
    out = server.predict(images)
    assert out["xyz"].shape == (6, 4, 21, 3)


def test_predict_single_image_3d_input(server):
    out = server.predict(np.zeros((32, 32, 3), np.float32))
    assert out["xyz"].shape == (1, 4, 21, 3)


def test_no_recompile_after_warmup(server):
    """Every bucket is compiled by warmup; predict must reuse them."""
    compiled = set(server._fns)
    assert compiled == {(b, False) for b in serve._buckets(server.max_batch)}
    server.predict(np.zeros((2, 32, 32, 3), np.float32))
    server.predict(np.zeros((4, 32, 32, 3), np.float32))
    assert set(server._fns) == compiled


def test_quantized_server_calibrates_once_no_recompile(tiny_cfg):
    """quantize=True: warmup precompiles int8 buckets with a shape-only
    zero calibration; the first real batch recalibrates VALUES only (no
    new programs), and subsequent predicts reuse the qtree."""
    s = serve.InferenceServer(tiny_cfg, max_batch=2, quantize=True,
                              quantize_min_batch=1)
    s.warmup()
    compiled = set(s._fns)
    assert compiled == {(b, True) for b in serve._buckets(2)}
    assert not s._quant_ready
    rng = np.random.RandomState(2)
    out = s.predict(rng.randn(2, 32, 32, 3).astype(np.float32))
    assert s._quant_ready
    assert np.isfinite(out["xyz"]).all()
    qtree_id = id(s._quant)
    out = s.predict(rng.randn(2, 32, 32, 3).astype(np.float32))
    assert id(s._quant) == qtree_id  # no re-calibration
    assert set(s._fns) == compiled  # no recompiles
    assert np.isfinite(out["uv"]).all()


def test_quantize_min_batch_gate(tiny_cfg):
    """int8 loses at tiny batches (B=1: 0.80x measured) — buckets below
    quantize_min_batch stay bf16, larger ones go int8."""
    s = serve.InferenceServer(tiny_cfg, max_batch=4, quantize=True,
                              quantize_min_batch=2)
    s.warmup()
    assert set(s._fns) == {(1, False), (2, True), (4, True)}
    out = s.predict(np.zeros((1, 32, 32, 3), np.float32))  # float bucket
    assert not s._quant_ready  # no calibration needed for float buckets
    out = s.predict(np.zeros((3, 32, 32, 3), np.float32))  # pads to 4: int8
    assert s._quant_ready
    assert np.isfinite(out["xyz"]).all()


def test_checkpoint_restore_roundtrip(tiny_cfg, tmp_path):
    """A checkpoint written by the training engine restores into the
    server and changes its outputs (fresh init != trained params)."""
    import jax

    from mhentropy_tpu.train import engine

    optimizer = engine.make_optimizer(1e-3, [10], steps_per_epoch=1)
    state = engine.init_state(jax.random.key(7), engine.build_model_config(tiny_cfg), optimizer)

    import orbax.checkpoint as ocp

    path = str(tmp_path / "ckpt")
    with ocp.StandardCheckpointer() as saver:
        saver.save(
            path,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": state.step,
            },
            force=True,
        )
    s = serve.InferenceServer(tiny_cfg, checkpoint=path, max_batch=1)
    leaf = jax.tree_util.tree_leaves(s.params)[0]
    want = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(want))


def test_http_roundtrip(server):
    """POST a raw float32 frame to /predict on a live HTTPServer thread."""
    from http.server import HTTPServer

    # Reuse the handler wiring by serving on an ephemeral port in a thread.
    import mhentropy_tpu.serve as serve_mod

    holder = {}

    def run():
        from http.server import BaseHTTPRequestHandler

        # _http_serve blocks; grab the server object via monkey wiring.
        orig = HTTPServer.serve_forever

        def capture(self, *a, **k):
            holder["httpd"] = self
            orig(self)

        HTTPServer.serve_forever = capture
        try:
            serve_mod._http_serve(server, "127.0.0.1", 0)
        except Exception:
            pass
        finally:
            HTTPServer.serve_forever = orig

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        if "httpd" in holder:
            break
        import time

        time.sleep(0.05)
    httpd = holder["httpd"]
    port = httpd.server_address[1]

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/healthz", method="GET"
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["ok"] and health["image_size"] == 32

    frame = np.zeros((1, 32, 32, 3), np.float32)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=frame.tobytes(),
        headers={"X-Batch": "1"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        body = json.loads(resp.read())
    assert np.asarray(body["xyz"]).shape == (1, 4, 21, 3)
    assert body["ms"] >= 0

    # Malformed requests get a 400 with a JSON error, not a dropped
    # connection: body shorter than X-Batch promises / bad X-Batch.
    for headers, data in [
        ({"X-Batch": "2"}, frame.tobytes()),        # size mismatch
        ({"X-Batch": "zebra"}, frame.tobytes()),    # non-integer
        ({"X-Batch": "1", "X-Dtype": "int16"}, frame.tobytes()),
    ]:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=data,
            headers=headers, method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    httpd.shutdown()


def test_u8_transport_matches_f32(server):
    """uint8 raw-pixel requests must produce the same hypotheses as the
    pre-normalised f32 contract (same PRNG key), within the 1-ulp
    device-affine rounding."""
    import jax

    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0  # rhd dataset normalisation
    key = jax.random.key(42)
    server._key = key
    out_u8 = server.predict(u8)
    server._key = key
    out_f32 = server.predict(f32)
    np.testing.assert_allclose(out_u8["xyz"], out_f32["xyz"], atol=1e-4)
    np.testing.assert_allclose(out_u8["uv"], out_f32["uv"], atol=1e-4)


def test_warmup_precompiles_u8_traces(tiny_cfg):
    """With the default transports, predict(u8) after warmup must not
    add jit cache entries (the u8 trace was warmed)."""
    s = serve.InferenceServer(tiny_cfg, max_batch=2)
    s.warmup()
    sizes = {k: f._cache_size() for k, f in s._fns.items()}
    assert all(v == 2 for v in sizes.values())  # f32 + u8 per bucket
    s.predict(np.zeros((2, 32, 32, 3), np.uint8))
    s.predict(np.zeros((2, 32, 32, 3), np.float32))
    assert {k: f._cache_size() for k, f in s._fns.items()} == sizes


def test_http_u8_roundtrip(server):
    """POST raw uint8 pixels with X-Dtype: uint8."""
    import time
    from http.server import HTTPServer

    import mhentropy_tpu.serve as serve_mod

    holder = {}

    def run():
        orig = HTTPServer.serve_forever

        def capture(self, *a, **k):
            holder["httpd"] = self
            orig(self)

        HTTPServer.serve_forever = capture
        try:
            serve_mod._http_serve(server, "127.0.0.1", 0)
        except Exception:
            pass
        finally:
            HTTPServer.serve_forever = orig

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        if "httpd" in holder:
            break
        time.sleep(0.05)
    httpd = holder["httpd"]
    port = httpd.server_address[1]
    frame = np.full((1, 32, 32, 3), 127, np.uint8)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=frame.tobytes(),
        headers={"X-Batch": "1", "X-Dtype": "uint8"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        body = json.loads(resp.read())
    assert np.asarray(body["xyz"]).shape == (1, 4, 21, 3)
    httpd.shutdown()
