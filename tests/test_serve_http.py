"""HTTP serving frontend tests: concurrent batching, stats, failure paths."""

import json
import os
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from stutter_tpu.audio.synthetic import make_synthetic_corpus
from stutter_tpu.extract import BucketBatcher, WavLMExtractor
from stutter_tpu.models import WavLMConfig, init_wavlm_params
from stutter_tpu.serve import EmbeddingServer, HttpEmbeddingFrontend


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("http_corpus")
    make_synthetic_corpus(str(root), n_per_split={"train": 6})
    import glob

    return sorted(glob.glob(os.path.join(str(root), "wav", "*.wav")))


@pytest.fixture(scope="module")
def frontend(corpus):
    cfg = WavLMConfig.tiny()
    extractor = WavLMExtractor(cfg, init_wavlm_params(jax.random.key(0), cfg),
                               preset="fast")
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0, max_batch=4),
        max_wait_s=0.05, max_clips=4,
    )
    fe = HttpEmbeddingFrontend(server, port=0, request_timeout_s=60.0)
    fe.start()
    yield fe
    fe.shutdown()


def _url(frontend, path):
    return f"http://{frontend.host}:{frontend.port}{path}"


def _post(frontend, body: bytes, ctype: str):
    req = urllib.request.Request(
        _url(frontend, "/embed"), data=body, headers={"Content-Type": ctype},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_embed_json_path(frontend, corpus):
    status, obj = _post(frontend, json.dumps({"path": corpus[0]}).encode(),
                        "application/json")
    assert status == 200 and obj["ok"]
    for col, vec in obj["embeddings"].items():
        arr = np.asarray(vec, np.float32)
        assert arr.ndim == 1 and np.isfinite(arr).all(), col


def test_http_embed_raw_wav_bytes(frontend, corpus):
    with open(corpus[1], "rb") as f:
        wav_bytes = f.read()
    status, obj = _post(frontend, wav_bytes, "audio/wav")
    assert status == 200 and obj["ok"]
    assert obj["embeddings"]


def test_http_embed_raw_flac_bytes(frontend, corpus, tmp_path):
    """Compressed raw bytes decode by content sniffing (suffix is irrelevant)."""
    from stutter_tpu.audio.build import get_ff_lib
    from stutter_tpu.audio.wavio import encode_audio, read_wav

    if get_ff_lib() is None:
        pytest.skip("libav extension unavailable on this host")
    x, sr = read_wav(corpus[2])
    flac = str(tmp_path / "clip.flac")
    encode_audio(flac, x, sr)
    with open(flac, "rb") as f:
        status, obj = _post(frontend, f.read(), "audio/flac")
    assert status == 200 and obj["ok"]
    assert obj["embeddings"]


def test_http_concurrent_requests_all_answered(frontend, corpus):
    results = {}

    def worker(i, path):
        results[i] = _post(frontend, json.dumps({"path": path}).encode(),
                           "application/json")

    threads = [threading.Thread(target=worker, args=(i, p))
               for i, p in enumerate(corpus[:4])]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert len(results) == 4
    assert all(status == 200 and obj["ok"] for status, obj in results.values())


def test_http_decode_failure_is_422(frontend, tmp_path):
    bad = tmp_path / "junk.wav"
    bad.write_bytes(b"not audio")
    status, obj = _post(frontend, json.dumps({"path": str(bad)}).encode(),
                        "application/json")
    assert status == 422 and not obj["ok"] and obj["error"]


def test_http_bad_request_is_400(frontend):
    status, obj = _post(frontend, b'{"nope": 1}', "application/json")
    assert status == 400 and not obj["ok"]


def test_http_stats_and_healthz(frontend, corpus):
    _post(frontend, json.dumps({"path": corpus[2]}).encode(), "application/json")
    with urllib.request.urlopen(_url(frontend, "/healthz"), timeout=10) as r:
        assert r.status == 200 and json.loads(r.read())["ok"]
    with urllib.request.urlopen(_url(frontend, "/stats"), timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["served"] >= 1 and "p50_s" in stats


def test_http_unknown_path_is_404(frontend):
    try:
        with urllib.request.urlopen(_url(frontend, "/nope"), timeout=10) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


def test_http_oversized_body_closes_connection(frontend):
    """A 400 on an oversized body must CLOSE the keep-alive connection —
    replying without consuming the body leaves it in the stream, and the
    next request on the same socket would parse mid-body garbage."""
    import http.client

    conn = http.client.HTTPConnection(frontend.host, frontend.port, timeout=30)
    try:
        conn.putrequest("POST", "/embed")
        conn.putheader("Content-Type", "application/octet-stream")
        conn.putheader("Content-Length", str(200 * 1024 * 1024))  # > 64 MB cap
        conn.endheaders()
        conn.send(b"RIFFgarbage")  # only a fragment of the declared body
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        # server must have dropped the connection: reusing it fails instead
        # of parsing the unread body bytes as a request line
        with pytest.raises((http.client.HTTPException, ConnectionError, OSError)):
            conn.putrequest("GET", "/healthz")
            conn.endheaders()
            r2 = conn.getresponse()
            if r2.status:  # a parsed response here means desync, not reuse
                raise AssertionError("connection was not closed after the 400")
    finally:
        conn.close()


def test_serve_cli_rejects_bad_http_address():
    """--http without a numeric port fails fast (rc 2) BEFORE any model
    build — a traceback after minutes of TPU compiles is not an error
    message."""
    from stutter_tpu.cli import serve as serve_cli

    assert serve_cli.main(["--model_type", "wavlm", "--random_init",
                           "--http", "localhost"]) == 2
