"""HTTP model server (dlsc_tpu/server.py): micro-batched serving over an
exported artifact must return exactly what the loaded artifact returns,
coalesce concurrent requests, and standardize inputs like training prep."""

import http.client
import io
import json
import threading
import wave as wavlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsc_tpu.data.pipeline import DevicePipeline, PipelineConfig
from dlsc_tpu.models.vit import ASTViT
from dlsc_tpu.serving import export_model, make_infer

CLIP = 44_100


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model = ASTViT(num_classes=7, emb_dim=32, depth=2, num_heads=2,
                   patch_size=16, patch_stride=16, overlap=0,
                   dropout=0.0, dtype=jnp.float32, use_flash=False)
    pipe = DevicePipeline(PipelineConfig(mode="ast", num_classes=7))
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, CLIP)).astype(np.float32))
    feats, _ = jax.jit(pipe.eval_batch)(wave, jnp.zeros((4,), jnp.int32))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, train=False)
    art = export_model(model, pipe, variables,
                       tmp_path_factory.mktemp("srv") / "art",
                       batch=4, clip_samples=CLIP, platforms=("cpu",))
    direct = jax.jit(make_infer(model, pipe))
    return art, lambda w: np.asarray(direct(variables, jnp.asarray(w)))


@pytest.fixture(scope="module")
def server(artifact):
    from dlsc_tpu.server import ModelServer

    art, direct = artifact
    srv = ModelServer(art, window_ms=20.0)
    httpd = srv.make_http_server("127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield srv, httpd.server_address[1], direct
    httpd.shutdown()


def _post(port, path, body, ctype="application/json"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body, headers={"Content-Type": ctype})
    r = conn.getresponse()
    out = (r.status, json.loads(r.read()))
    conn.close()
    return out


def _clip(seed):
    x = np.random.default_rng(seed).standard_normal(CLIP).astype(np.float32)
    return x / np.abs(x).max()  # pre-normalized: prep is then the identity


def test_healthz(server):
    srv, port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    payload = json.loads(r.read())
    conn.close()
    assert r.status == 200
    assert payload["manifest"]["batch"] == 4
    assert payload["manifest"]["clip_samples"] == CLIP


def test_predict_raw_matches_direct_and_batches(server):
    """Concurrent requests coalesce into one padded device call and each
    caller gets exactly its own row of the direct model output."""
    srv, port, direct = server
    clips = [_clip(i) for i in range(3)]
    want = direct(np.stack(clips + [np.zeros(CLIP, np.float32)]))[:3]

    results = [None] * 3

    def hit(i):
        status, payload = _post(
            port, "/predict_raw",
            json.dumps({"pcm": clips[i].tolist(), "sample_rate": CLIP}))
        assert status == 200, payload
        results[i] = np.asarray(payload["probs"])

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(3):
        np.testing.assert_allclose(results[i], want[i], rtol=1e-5, atol=1e-6)
        # top list is sorted desc and consistent with probs
        status_top = sorted(results[i])[::-1][0]
        assert abs(status_top - max(results[i])) < 1e-12


def test_predict_wav_bytes(server):
    """WAV-bytes endpoint: PCM16 roundtrip through the decoder + prep."""
    srv, port, direct = server
    clip = _clip(7)
    buf = io.BytesIO()
    with wavlib.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(CLIP)
        w.writeframes((clip * 32767.0).astype("<i2").tobytes())
    status, payload = _post(port, "/predict", buf.getvalue(),
                            ctype="audio/wav")
    assert status == 200, payload
    # PCM16 quantization + peak renorm: compare against direct on the
    # decoded-and-prepped clip, loosely against the float clip
    q = (clip * 32767.0).astype("<i2").astype(np.float32) / 32767.0
    q = q / np.abs(q).max()
    want = direct(np.stack([q] + [np.zeros(CLIP, np.float32)] * 3))[0]
    np.testing.assert_allclose(np.asarray(payload["probs"]), want,
                               rtol=1e-4, atol=1e-5)


def test_bad_request_is_400(server):
    srv, port, _ = server
    status, payload = _post(port, "/predict_raw", b"{not json")
    assert status == 400 and "error" in payload
    status, _ = _post(port, "/nope", b"{}")
    assert status == 404
