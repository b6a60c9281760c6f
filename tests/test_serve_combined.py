"""Combined (WavLM + Whisper) serving: the fusion store's columns, live.

Training's 'combined' model type reads the fusion store
(extract/store.py:load_embeddings_combined); serve/combined.py gives those
classifiers a serving path. These tests pin the column-naming contract
against the store itself (same clips through the batch pipelines vs the
server), the combined_top hstack, and the classifier + CLI plumbing.
"""

import glob
import json
import os

import jax
import numpy as np
import pytest

from stutter_tpu.audio.synthetic import make_synthetic_corpus
from stutter_tpu.extract import BucketBatcher, WavLMExtractor, WhisperExtractor
from stutter_tpu.models import (
    WavLMConfig,
    WhisperConfig,
    init_wavlm_params,
    init_whisper_params,
)
from stutter_tpu.serve import CombinedExtractor, EmbeddingServer, Request


# WavLMConfig.tiny's stem downsamples 20x, not 320x (CLAUDE.md): serving at
# whisper's preferred 30 s bucket would give the tiny wavlm L=24000 frames
# and a multi-GB einsum attention. Sub-second clips + sub-second buckets keep
# L under ~800; whisper is unaffected (whisper_features zero-pads every
# input to 30 s internally, so its numerics are bucket-independent — the
# property these tests also rely on for store-vs-server equality).
SERVE_BUCKETS = (0.5, 1.0)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("combined_corpus")
    make_synthetic_corpus(str(root), n_per_split={"devel": 3}, seed=5,
                          duration_range=(0.4, 0.9))
    return str(root)


@pytest.fixture(scope="module")
def extractors():
    wl_cfg = WavLMConfig.tiny()
    wh_cfg = WhisperConfig.tiny(d_model=32, layers=2, heads=4)
    return (
        WavLMExtractor(wl_cfg, init_wavlm_params(jax.random.key(0), wl_cfg)),
        WhisperExtractor(wh_cfg, init_whisper_params(jax.random.key(1), wh_cfg)),
    )


def _serve(extractor, paths, **kw):
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=SERVE_BUCKETS,
                              audio_budget_s=120.0, max_batch=4),
        max_wait_s=0.01, max_clips=4, **kw,
    )
    responses = []
    server.serve(iter([Request(os.path.basename(p), p) for p in paths]),
                 responses.append)
    return responses


def test_combined_columns_match_fusion_store(corpus, extractors, tmp_path):
    """Server columns == load_embeddings_combined columns, values aligned."""
    from stutter_tpu.extract import ExtractionPipeline, create_metadata_from_files
    from stutter_tpu.extract.store import load_embeddings_combined

    wavlm, whisper = extractors
    meta = create_metadata_from_files(corpus, split="devel")
    emb_root = str(tmp_path / "emb")
    # DIFFERENT bucket sets than the server on purpose: wavlm equality holds
    # by padding invariance, whisper by its internal 30 s pad
    for name, part, buckets in (("wavlm", wavlm, (1.0,)),
                                ("whisper", whisper, (30.0,))):
        ExtractionPipeline(
            part, batcher=BucketBatcher(buckets_s=buckets, audio_budget_s=120.0),
        ).run_split(meta, "devel", os.path.join(emb_root, name))

    store_meta, store_layers = load_embeddings_combined(
        emb_root, splits=("devel",))
    assert store_meta is not None

    combined = CombinedExtractor(wavlm, whisper)
    responses = _serve(combined, list(meta["path"]))
    assert all(r.ok for r in responses)

    # exact column-name contract: everything the store exposes, the server
    # serves (the store adds metadata-only columns like filename elsewhere)
    assert set(store_layers) == set(combined.column_names)

    # per-clip values match the batch pipelines (wavlm pooled over its own
    # buckets vs the server's 30 s bucket — equal by padding invariance)
    by_name = {os.path.splitext(r.req_id)[0]: r for r in responses}
    for row_idx in range(len(store_meta)):
        fname = os.path.splitext(str(store_meta.iloc[row_idx]["filename"]))[0]
        resp = by_name[fname]
        for col, arr in store_layers.items():
            u = np.asarray(arr[row_idx], np.float64)
            v = np.asarray(resp.embeddings[col], np.float64)
            cos = 1 - u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
            assert cos < 1e-5, (col, fname, cos)


def test_combined_top_is_hstack_of_parts(corpus, extractors):
    wavlm, whisper = extractors
    combined = CombinedExtractor(wavlm, whisper)
    paths = sorted(glob.glob(os.path.join(corpus, "wav", "*.wav")))
    r = _serve(combined, paths[:1])[0]
    assert r.ok
    wl_top = f"wavlm_layer_{wavlm.cfg.num_hidden_layers}"
    wh_top = f"whisper_encoder_layer_{whisper.cfg.encoder_layers}"
    np.testing.assert_array_equal(
        r.embeddings["combined_top"],
        np.hstack([r.embeddings[wl_top], r.embeddings[wh_top]]),
    )


def test_combined_classifier_serves(corpus, extractors, tmp_path):
    """A combined_top-trained artifact classifies through the server."""
    from sklearn.linear_model import LogisticRegression

    from stutter_tpu.serve import ServingClassifier
    from stutter_tpu.train.persistence import save_model

    wavlm, whisper = extractors
    combined = CombinedExtractor(wavlm, whisper)
    dim = wavlm.embedding_dim + whisper.embedding_dim
    rs = np.random.RandomState(0)
    model = LogisticRegression(max_iter=200).fit(
        rs.randn(20, dim).astype(np.float32), rs.randint(0, 2, 20))
    path = save_model(model, str(tmp_path), "combined", "combined_top", "svm",
                      class_names=["Fluent", "Stutter"])
    clf = ServingClassifier.load(path)

    paths = sorted(glob.glob(os.path.join(corpus, "wav", "*.wav")))
    responses = _serve(combined, paths, classifier=clf)
    for r in responses:
        assert r.ok and r.prediction in ("Fluent", "Stutter")
        assert abs(sum(r.probs.values()) - 1.0) < 1e-6


def test_serve_cli_combined(corpus, tmp_path, monkeypatch, capsys):
    from stutter_tpu.cli import serve as serve_cli

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny())
    )
    monkeypatch.setattr(
        WhisperConfig, "large",
        staticmethod(lambda: WhisperConfig.tiny(d_model=32, layers=2, heads=4)),
    )
    paths = sorted(glob.glob(os.path.join(corpus, "wav", "*.wav")))
    req_file = tmp_path / "reqs.jsonl"
    req_file.write_text(json.dumps({"id": "c0", "path": paths[0]}) + "\n")
    out_dir = tmp_path / "emb_out"
    rc = serve_cli.main([
        "--model_type", "combined", "--model_name", "microsoft/wavlm-base",
        "--random_init", "--input", str(req_file),
        "--output_dir", str(out_dir), "--max_wait_ms", "10",
        "--buckets", "1.0",  # tiny-stem frame-count guard (see SERVE_BUCKETS)
    ])
    assert rc == 0
    out_lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(out_lines) == 1 and out_lines[0]["ok"]
    assert "combined_top" in out_lines[0]["columns"]
    # ragged column widths -> npz keyed by column (serve CLI emit)
    with np.load(out_lines[0]["file"]) as z:
        assert "combined_top" in z.files
        assert np.isfinite(z["combined_top"]).all()
