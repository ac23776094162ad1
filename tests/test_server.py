"""HTTP streaming server: end-to-end over a real socket (tiny config)."""

import io
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
import wave
from http.server import ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.text import FallbackWordTokenizer
from pocket_tts_tpu.models.tts_model import TTSModel
from pocket_tts_tpu.serving.engine import TTSEngine
from pocket_tts_tpu.serving.server import make_handler

RNG = np.random.default_rng(61)


@pytest.fixture(scope="module")
def server():
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    model = TTSModel(
        flow_lm=flow_lm,
        mimi=mimi,
        params=params,
        tokenizer=FallbackWordTokenizer(4000),
        temp=0.7,
        lsd_decode_steps=1,
        noise_clamp=None,
        eos_threshold=1e9,
        config=cfg,
        seed=0,
    )
    model.random_init = True  # offline: allow the synthetic-voice fallback

    engine = TTSEngine(model, slots=2, segment_frames=4, capacity=512, text_pad=32,
                       emit_pcm16=True)
    engine.serve_forever_in_thread()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(model, engine))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    time.sleep(0.2)
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_tts_endpoint_streams_wav(server):
    text = urllib.parse.quote("Server test sentence with words.")
    with urllib.request.urlopen(f"{server}/tts?text={text}&voice=marius", timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    w = wave.open(io.BytesIO(data))
    assert w.getframerate() == 24000
    # payload exists beyond the header
    assert len(data) > 44 + 1920 * 2


def test_concurrent_requests(server):
    results = {}

    def fetch(name):
        text = urllib.parse.quote(f"Concurrent request number {name} goes here.")
        with urllib.request.urlopen(f"{server}/tts?text={text}&voice=marius", timeout=300) as r:
            results[name] = r.read()

    threads = [threading.Thread(target=fetch, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 3
    assert all(len(v) > 44 for v in results.values())


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{server}/nope", timeout=30)
    assert exc.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{server}/tts?text=", timeout=30)
    assert exc.value.code == 400


def test_saturated_engine_returns_503():
    """Backpressure surfaces as HTTP 503 + Retry-After, not a hung request:
    a dedicated server whose engine bound is 0 sheds every submit, so the
    handler's EngineOverloaded path is deterministic."""
    url = _bounded_server()
    text = urllib.parse.quote("Shed me please.")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{url}/tts?text={text}", timeout=60)
    assert exc.value.code == 503
    assert int(exc.value.headers["Retry-After"]) >= 1


_BOUNDED = {}


def _bounded_server():
    """A second server whose engine rejects everything (max_pending=0)."""
    if "url" in _BOUNDED:
        return _BOUNDED["url"]
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    model = TTSModel(
        flow_lm=flow_lm, mimi=mimi, params=params,
        tokenizer=FallbackWordTokenizer(4000), temp=0.7, lsd_decode_steps=1,
        noise_clamp=None, eos_threshold=1e9, config=cfg, seed=0,
    )
    model.random_init = True
    engine = TTSEngine(
        model, slots=1, segment_frames=2, capacity=256, text_pad=32,
        emit_pcm16=True, max_pending=0,
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(model, engine))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    _BOUNDED["url"] = f"http://127.0.0.1:{httpd.server_port}"
    return _BOUNDED["url"]
