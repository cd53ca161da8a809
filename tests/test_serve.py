"""HTTP serving surface (cli/serve.py): request/response contract,
wav encoding, warmup precompilation, concurrency lock.

No reference counterpart (the reference is batch scripts only) — this
is the framework's deployment surface, so the tests drive a real
ThreadingHTTPServer over a tiny model end-to-end.
"""

import json
import os
import sys
import threading
import urllib.request
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cli"))

from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def service():
    from serve import TTSService

    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from cmtts_tpu.pipeline import Synthesizer

    cfg = tiny_config()
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)
    texts = jnp.ones((1, 8), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 16, cfg.stft.n_mel_channels)), jnp.zeros(1),
        speakers=jnp.zeros(1, jnp.int32), texts=texts,
        src_lens=jnp.asarray([8]), deterministic=True)
    n_mels = cfg.stft.n_mel_channels
    voc = HiFiGANGenerator(HiFiGANConfig(upsample_initial_channel=32,
                                         num_mels=n_mels))
    voc_params = voc.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, n_mels)))["params"]
    synth = Synthesizer(cfg, variables["params"], voc_params, T=1,
                        text_buckets=(8, 16), mel_buckets=(32,))
    return TTSService(synth, cfg)


@pytest.fixture(scope="module")
def server_url(service):
    from serve import serve

    httpd = serve(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_wav_bytes_roundtrip():
    from serve import wav_bytes

    sig = 0.5 * np.sin(np.linspace(0, 40, 2205)).astype(np.float32)
    data = wav_bytes(sig, 22050)
    import io

    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getnframes() == 2205
        pcm = np.frombuffer(w.readframes(2205), "<i2")
    np.testing.assert_allclose(pcm / 32767.0, sig, atol=1e-4)


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=60) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["T"] == 1
    assert body["text_buckets"] == [8, 16]


def test_tts_post_returns_wav(server_url, service):
    req = urllib.request.Request(
        server_url + "/tts",
        data=json.dumps({"text": "hello world", "seed": 3}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        assert float(r.headers["X-RTF"]) > 0
        data = r.read()
    import io

    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == service.cfg.stft.sampling_rate
        # tiny random model may predict ~0 durations; the container must
        # still be a valid wav
        assert w.getnframes() >= 0
    assert service.requests >= 1


def test_tts_get_form(server_url):
    with urllib.request.urlopen(
            server_url + "/tts?text=ok&seed=1", timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"


def test_tts_missing_text_is_400(server_url):
    req = urllib.request.Request(server_url + "/tts", data=b"{}",
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400


def test_unknown_path_404(server_url):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server_url + "/nope", timeout=60)
    assert ei.value.code == 404


def test_warmup_counts_graphs(service):
    before = len(service.synth._jitted)
    n = service.warmup(all_buckets=True, log=lambda *a: None)
    assert n == len(service.synth.text_buckets) * len(service.synth.mel_buckets)
    assert len(service.synth._jitted) >= max(before, 1)


@pytest.fixture(scope="module")
def batch_service(service):
    """Same Synthesizer, micro-batching dispatcher enabled."""
    from serve import TTSService

    return TTSService(service.synth, service.cfg, max_batch=4,
                      batch_window_ms=200.0)


def test_microbatching_coalesces_concurrent_requests(batch_service):
    svc = batch_service
    results = [None] * 4
    errors = []

    def one(i):
        try:
            results[i] = svc.synthesize("hello world", seed=7, speaker=0)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors
    assert all(r is not None for r in results)
    # the 200 ms window must have coalesced at least one multi-request
    # batch (4 near-simultaneous requests, max_batch=4)
    assert max(int(k) for k in svc.batch_hist) >= 2
    sr = svc.cfg.stft.sampling_rate
    for out, rate, latency, rtf in results:
        assert rate == sr and latency > 0 and rtf > 0


def test_microbatching_matches_direct_path(service, batch_service):
    """A lone batched request (window expires, B=1) must produce the
    same audio as the direct unbatched path (same seed, same graph)."""
    direct = service.synthesize("ok then", seed=11)
    via_queue = batch_service.synthesize("ok then", seed=11)
    np.testing.assert_allclose(direct[0], via_queue[0], atol=1e-5)


def test_long_text_routes_to_chunked_synthesis(service, monkeypatch):
    """Text whose phoneme count exceeds max_seq_len/10 must go through
    the chunked long-form path (splice), not truncate."""
    import dataclasses

    # shrink the budget so a two-sentence text trips the long path
    small = dataclasses.replace(service.cfg, model=dataclasses.replace(
        service.cfg.model, max_seq_len=100))  # budget = 10 tokens
    monkeypatch.setattr(service, "cfg", small)
    out, sr, latency, rtf = service.synthesize(
        "the quick brown fox jumps. pack my box with jugs.", seed=5)
    assert sr == service.cfg.stft.sampling_rate
    assert latency > 0 and rtf > 0
    assert isinstance(out, np.ndarray)


def test_tts_stream_chunked_wav(server_url, service):
    """stream=1 returns a chunked-transfer WAV whose PCM payload is
    decodable; bytes arrive per synthesis chunk."""
    req = urllib.request.Request(
        server_url + "/tts",
        data=json.dumps({"text": "hello world. goodbye world.",
                         "seed": 4, "stream": 1}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()  # urllib de-chunks transparently
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert b"data" in body[:44]
    pcm = np.frombuffer(body[44:], "<i2")
    assert pcm.ndim == 1  # valid 16-bit payload (possibly empty-dur model)


def test_stream_bad_text_is_json_400(server_url):
    req = urllib.request.Request(
        server_url + "/tts",
        data=json.dumps({"text": "   ", "stream": 1}).encode(),
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400


def test_microbatching_delivers_errors(service):
    """A device-call failure must surface in the REQUESTING thread, not
    kill the dispatcher."""
    from serve import TTSService

    svc = TTSService(service.synth, service.cfg, max_batch=4,
                     batch_window_ms=1.0)

    def boom(*a, **k):
        raise RuntimeError("device on fire")

    svc.synth = type("S", (), {"__call__": staticmethod(boom)})()
    with pytest.raises(RuntimeError, match="device on fire"):
        svc.synthesize("hello")
    # dispatcher survives: a later request on a working synth succeeds
    svc.synth = service.synth
    out, sr, latency, rtf = svc.synthesize("hello again", seed=2)
    assert sr == service.cfg.stft.sampling_rate
