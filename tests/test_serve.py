"""Online serving tests: batching server semantics + the serve CLI."""

import io
import json
import os

import jax
import numpy as np
import pytest

from stutter_tpu.audio.synthetic import make_synthetic_corpus
from stutter_tpu.extract import BucketBatcher, WavLMExtractor
from stutter_tpu.models import WavLMConfig, init_wavlm_params
from stutter_tpu.serve import EmbeddingServer, Request, jsonl_requests


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_corpus")
    make_synthetic_corpus(str(root), n_per_split={"train": 6},
                          duration_range=(0.3, 0.9))  # frames-sized for the tiny 20x stem
    import glob

    return sorted(glob.glob(os.path.join(str(root), "wav", "*.wav")))


@pytest.fixture(scope="module")
def extractor():
    cfg = WavLMConfig.tiny()
    return WavLMExtractor(cfg, init_wavlm_params(jax.random.key(0), cfg), preset="fast")


def test_server_serves_all_requests(corpus, extractor):
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0, max_batch=4),
        max_wait_s=0.05, max_clips=4,
    )
    reqs = [Request(f"r{i}", p) for i, p in enumerate(corpus)]
    responses = []
    server.serve(iter(reqs), responses.append)
    assert len(responses) == len(reqs)
    by_id = {r.req_id: r for r in responses}
    assert set(by_id) == {f"r{i}" for i in range(len(corpus))}
    for r in responses:
        assert r.ok, r.error
        for col, vec in r.embeddings.items():
            assert vec.shape == (extractor.embedding_dim,)
            assert np.isfinite(vec).all()
    # device-side accounting (the transport-independent regression signal)
    s = server.stats()
    assert s["audio_s_served"] > 0 and s["device_collect_s"] > 0
    assert s["device_s_per_audio_s"] > 0


def test_server_reports_decode_failures(corpus, extractor, tmp_path):
    bad = tmp_path / "not_a_wav.wav"
    bad.write_bytes(b"garbage")
    # small buckets: an unprobeable file is assigned the TOP bucket, and the
    # default 30 s bucket means a 1500-frame attention compile on CPU
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0, max_batch=4),
        max_wait_s=0.01, max_clips=4,
    )
    responses = []
    server.serve(iter([Request("good", corpus[0]), Request("bad", str(bad))]),
                 responses.append)
    by_id = {r.req_id: r for r in responses}
    assert by_id["good"].ok
    assert not by_id["bad"].ok and by_id["bad"].embeddings is None


def test_server_results_match_pipeline(corpus, extractor):
    """Served embeddings == batch-extracted embeddings for the same clips."""
    from stutter_tpu.extract.batcher import BucketBatcher as BB

    server = EmbeddingServer(
        extractor, batcher=BB(buckets_s=(2.0, 4.0), audio_budget_s=8.0),
        max_wait_s=0.01, max_clips=8,
    )
    responses = []
    server.serve(iter([Request("x", corpus[0])]), responses.append)
    served = responses[0].embeddings

    batcher = BB(buckets_s=(2.0, 4.0), audio_budget_s=8.0)
    batch = next(batcher.batches([corpus[0]], prefetch=False))
    direct = extractor(batch)
    for col in served:
        np.testing.assert_allclose(served[col], direct[col][0], rtol=1e-5, atol=1e-6)


def test_jsonl_requests_parsing():
    lines = io.StringIO(
        '{"id": "a", "path": "/x.wav"}\n'
        "\n"
        "/bare/path.wav\n"
    )
    reqs = list(jsonl_requests(lines))
    assert (reqs[0].req_id, reqs[0].path) == ("a", "/x.wav")
    assert reqs[1].path == "/bare/path.wav"


def test_serve_cli_end_to_end(corpus, tmp_path, monkeypatch, capsys):
    from stutter_tpu.cli import serve as serve_cli
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    req_file = tmp_path / "reqs.jsonl"
    req_file.write_text(
        "\n".join(json.dumps({"id": f"q{i}", "path": p})
                  for i, p in enumerate(corpus[:3])) + "\n"
    )
    monkeypatch.chdir(tmp_path)
    rc = serve_cli.main([
        "--model_type", "wavlm", "--model_name", "microsoft/wavlm-base",
        "--random_init", "--input", str(req_file),
        "--output_dir", str(tmp_path / "emb"), "--max_wait_ms", "10",
    ])
    assert rc == 0
    out_lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(out_lines) == 3 and all(o["ok"] for o in out_lines)
    for o in out_lines:
        arr = np.load(o["file"])
        assert arr.ndim == 2 and np.isfinite(arr).all()
        assert len(o["columns"]) == arr.shape[0]


def test_server_partial_round_failure_no_double_answers(corpus, extractor):
    """One bucket batch failing must fail only its own requests — requests
    already answered in the same round must not get a second response."""

    class FlakyExtractor:
        def __init__(self, inner):
            self.inner = inner
            self.embedding_dim = inner.embedding_dim
            self.calls = 0

        def submit(self, batch):
            self.calls += 1
            if self.calls == 2:  # second bucket batch of the round blows up
                raise RuntimeError("boom")
            return self.inner.submit(batch)

        def collect(self, handle):
            return self.inner.collect(handle)

    flaky = FlakyExtractor(extractor)
    server = EmbeddingServer(
        flaky,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=4.0, max_batch=2),
        max_wait_s=0.05, max_clips=8,
    )
    reqs = [Request(f"r{i}", p) for i, p in enumerate(corpus[:4])]
    responses = []
    server.serve(iter(reqs), responses.append)
    ids = [r.req_id for r in responses]
    assert sorted(ids) == sorted({f"r{i}" for i in range(4)}), ids  # exactly once each
    assert any(not r.ok and "batch failed" in (r.error or "") for r in responses)
    assert any(r.ok for r in responses)


def test_server_chunks_long_clips(corpus, extractor, tmp_path):
    """A clip longer than the top bucket is embedded via the chunked path and
    matches the pipeline's chunked combination; 'trim' keeps old behavior."""
    from stutter_tpu.audio.wavio import load_audio, write_wav
    from stutter_tpu.extract.pipeline import chunked_embeddings

    wave = load_audio(corpus[0], target_sr=16000)
    long_wave = np.tile(wave, int(np.ceil(10.0 * 16000 / len(wave))))[: 10 * 16000]
    long_path = str(tmp_path / "long_10s.wav")
    write_wav(long_path, long_wave, 16000)

    batcher = BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=16.0, max_batch=4)
    server = EmbeddingServer(
        extractor, batcher=batcher, max_wait_s=0.01, max_clips=4,
        long_clip_policy="chunk",
    )
    responses = []
    server.serve(iter([Request("long", long_path), Request("short", corpus[1])]),
                 responses.append)
    by_id = {r.req_id: r for r in responses}
    assert by_id["short"].ok and by_id["long"].ok, [r.error for r in responses]

    expected, n_chunks, audio_s = chunked_embeddings(
        extractor, BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=16.0,
                                 max_batch=4), long_path)
    assert n_chunks == 3 and abs(audio_s - 10.0) < 1e-6
    for col in expected:
        np.testing.assert_allclose(by_id["long"].embeddings[col], expected[col],
                                   rtol=1e-5, atol=1e-6)

    # trim policy: still answered, but through the normal top-bucket batch
    server_trim = EmbeddingServer(
        extractor, batcher=batcher, max_wait_s=0.01, max_clips=4,
        long_clip_policy="trim",
    )
    responses_trim = []
    server_trim.serve(iter([Request("long", long_path)]), responses_trim.append)
    assert responses_trim[0].ok
    assert not np.allclose(
        responses_trim[0].embeddings[next(iter(expected))], expected[next(iter(expected))]
    )


def test_server_latency_stats(corpus, extractor):
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0, max_batch=4),
        max_wait_s=0.01, max_clips=4,
    )
    responses = []
    server.serve(iter([Request(f"r{i}", p) for i, p in enumerate(corpus[:4])]),
                 responses.append)
    s = server.stats()
    assert s["served"] == 4 and s["failed"] == 0 and s["rounds"] >= 1
    assert 0 < s["p50_s"] <= s["p95_s"] <= s["max_s"]


def test_pipelined_round_drains_on_idle_queue(corpus, extractor):
    """The one-round-in-flight pipeline must answer an in-flight round as
    soon as the request queue idles — a lone request's response must never
    wait for FUTURE traffic to arrive."""
    import threading

    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0, max_batch=4),
        max_wait_s=0.01, max_clips=2,
    )
    responses = []
    first_answered = threading.Event()

    def emit(r):
        responses.append(r)
        first_answered.set()

    def reqs():
        yield Request("a", corpus[0])
        # hold the stream open until 'a' is answered; if the serve loop kept
        # round a hostage to the next gather, this wait would time out and
        # the missing second request below fails the test loudly
        if not first_answered.wait(timeout=120):
            return
        yield Request("b", corpus[1])

    th = threading.Thread(target=lambda: server.serve(reqs(), emit), daemon=True)
    th.start()
    th.join(timeout=240)
    assert not th.is_alive(), "serve loop did not terminate"
    assert [r.req_id for r in responses] == ["a", "b"]
    assert all(r.ok for r in responses)
