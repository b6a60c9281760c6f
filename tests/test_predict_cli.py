"""Batch prediction CLI: corpus -> embeddings -> trained classifier -> CSV.

No reference equivalent (the reference never applies its trained classifiers
to new audio); cli/predict.py closes that loop corpus-wide. These tests pin
both input modes: classify-an-existing-store and extract-then-classify.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from stutter_tpu.audio.synthetic import make_synthetic_corpus
from stutter_tpu.train.persistence import save_model

CLASS_NAMES = ["Block", "Fluent", "Prolongation"]


def _make_artifact(out_dir: str, layer: str, dim: int, seed: int = 0) -> str:
    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    rs = np.random.RandomState(seed)
    X = rs.randn(30, dim).astype(np.float32)
    y = rs.randint(0, len(CLASS_NAMES), size=30)
    model = Pipeline([("scaler", StandardScaler()),
                      ("clf", LogisticRegression(max_iter=200))]).fit(X, y)
    return save_model(model, out_dir, "wavlm", layer, "svm",
                      class_names=CLASS_NAMES)


def test_predict_from_existing_store(tmp_path):
    """--embeddings_dir mode: no backbone forward, labels scored."""
    from stutter_tpu.cli.predict import main
    from stutter_tpu.extract.store import save_embeddings

    dim, n = 16, 12
    rs = np.random.RandomState(3)
    df = pd.DataFrame({
        "filename": [f"clip_{i}" for i in range(n)],
        "path": [f"/x/clip_{i}.wav" for i in range(n)],
        "label": [CLASS_NAMES[i % 3] for i in range(n)],
        "layer_1": list(rs.randn(n, dim).astype(np.float32)),
    })
    store = str(tmp_path / "emb" / "wavlm")
    save_embeddings(df, store, split="train")

    model_path = _make_artifact(str(tmp_path / "clf"), "layer_1", dim)
    out_csv = str(tmp_path / "pred.csv")
    rc = main([
        "--embeddings_dir", str(tmp_path / "emb"),
        "--classifier_model", model_path,
        "--model_type", "wavlm",
        "--output", out_csv,
    ])
    assert rc == 0
    out = pd.read_csv(out_csv)
    assert len(out) == n
    assert set(out["predicted_label"]) <= set(CLASS_NAMES)
    assert set(out["label"]) <= set(CLASS_NAMES)  # true labels ride along
    prob_cols = [c for c in out.columns if c.startswith("prob_")]
    assert sorted(prob_cols) == [f"prob_{c}" for c in sorted(CLASS_NAMES)]
    np.testing.assert_allclose(out[prob_cols].sum(axis=1), 1.0, atol=1e-6)


def test_predict_from_audio_dir(tmp_path, monkeypatch):
    """--audio_dir mode: tiny backbone extraction -> classifier -> CSV."""
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    from stutter_tpu.cli.predict import main

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(root, n_per_split={"train": 5}, seed=11)
    clips = sorted(glob.glob(os.path.join(root, "wav", "*.wav")))

    # tiny(32, 2, 4): hidden 32; layer indices (2,1,0,1) -> layer_2 exists
    model_path = _make_artifact(str(tmp_path / "clf"), "layer_2", 32)
    out_csv = str(tmp_path / "pred.csv")
    store = str(tmp_path / "store")
    rc = main([
        "--audio_dir", os.path.join(root, "wav"),
        "--classifier_model", model_path,
        "--model_type", "wavlm", "--model_name", "microsoft/wavlm-base",
        "--random_init", "--output", out_csv,
        "--keep_embeddings_dir", store,
        "--audio_budget", "16",
    ])
    assert rc == 0
    out = pd.read_csv(out_csv)
    assert len(out) == len(clips)
    assert set(out["predicted_label"]) <= set(CLASS_NAMES)
    assert (out["split"] == "predict").all()
    # intermediate store persisted in the standard contract layout
    assert os.path.exists(os.path.join(
        store, "wavlm", "predict", "embedding_metadata.csv"))
    assert os.path.exists(os.path.join(
        store, "wavlm", "predict", "layer_2_embeddings.npy"))


def test_predict_layer_mismatch_is_clear(tmp_path):
    from stutter_tpu.cli.predict import main
    from stutter_tpu.extract.store import save_embeddings

    df = pd.DataFrame({
        "filename": ["a"], "path": ["/x/a.wav"],
        "layer_1": [np.zeros(8, np.float32)],
    })
    save_embeddings(df, str(tmp_path / "emb" / "wavlm"), split="train")
    model_path = _make_artifact(str(tmp_path / "clf"), "layer_9", 8)
    rc = main([
        "--embeddings_dir", str(tmp_path / "emb"),
        "--classifier_model", model_path,
        "--model_type", "wavlm",
        "--output", str(tmp_path / "pred.csv"),
    ])
    assert rc == 1


def test_predict_combined_from_audio(tmp_path, monkeypatch):
    """'combined' extracts both backbones into the fusion layout and
    classifies fusion-store columns (combined_top)."""
    from stutter_tpu.models import WavLMConfig, WhisperConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    monkeypatch.setattr(
        WhisperConfig, "base",
        staticmethod(lambda: WhisperConfig.tiny(d_model=32, layers=2, heads=4)),
    )
    from stutter_tpu.cli.predict import main

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(root, n_per_split={"train": 3}, seed=7)

    # combined_top = wavlm top (32) ++ whisper encoder top (32)
    model_path = _make_artifact(str(tmp_path / "clf"), "combined_top", 64)
    out_csv = str(tmp_path / "pred.csv")
    rc = main([
        "--audio_dir", os.path.join(root, "wav"),
        "--classifier_model", model_path,
        "--model_type", "combined",
        "--model_name", "microsoft/wavlm-base",
        "--whisper_model_name", "openai/whisper-base",
        "--random_init", "--output", out_csv,
        "--audio_budget", "16",
    ])
    assert rc == 0
    out = pd.read_csv(out_csv)
    assert len(out) == 3
    assert set(out["predicted_label"]) <= set(CLASS_NAMES)


def test_predict_combined_max_length_is_per_part(tmp_path, monkeypatch):
    """--max_length trims only the WavLM part of 'combined'; the whisper part
    keeps its native 30 s window so predict-time whisper features match the
    training-time extraction (extract_whisper has no --max_length flag)."""
    from stutter_tpu.models import WavLMConfig, WhisperConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    monkeypatch.setattr(
        WhisperConfig, "base",
        staticmethod(lambda: WhisperConfig.tiny(d_model=32, layers=2, heads=4)),
    )
    import stutter_tpu.cli.common as cli_common
    from stutter_tpu.cli.predict import main

    seen = []  # (extractor_kind, max_length_s) per part
    real = cli_common.make_bucket_batcher

    def spy(extractor, mesh, **kw):
        seen.append((type(extractor).__name__, kw.get("max_length_s")))
        return real(extractor, mesh, **kw)

    monkeypatch.setattr(cli_common, "make_bucket_batcher", spy)

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(root, n_per_split={"train": 2}, seed=5)
    model_path = _make_artifact(str(tmp_path / "clf"), "combined_top", 64)
    rc = main([
        "--audio_dir", os.path.join(root, "wav"),
        "--classifier_model", model_path,
        "--model_type", "combined",
        "--model_name", "microsoft/wavlm-base",
        "--whisper_model_name", "openai/whisper-base",
        "--random_init", "--output", str(tmp_path / "pred.csv"),
        "--audio_budget", "16", "--max_length", "2",
    ])
    assert rc == 0
    by_kind = dict(seen)
    assert by_kind["WavLMExtractor"] == 2.0
    assert by_kind["WhisperExtractor"] is None


def test_predict_reused_store_ignores_stale_splits(tmp_path, monkeypatch):
    """A reused --keep_embeddings_dir holding an earlier corpus's split dirs
    must not leak those rows into this run's predictions: only the splits the
    current corpus produced are loaded (cli/predict.py _present_splits
    restrict)."""
    from stutter_tpu.extract.store import save_embeddings
    from stutter_tpu.models import WavLMConfig

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny(32, 2, 4))
    )
    from stutter_tpu.cli.predict import main

    store = str(tmp_path / "store")
    # stale leftovers: a 'train' split from some previous corpus, same layer
    stale = pd.DataFrame({
        "filename": [f"stale_{i}" for i in range(4)],
        "path": [f"/old/stale_{i}.wav" for i in range(4)],
        "layer_2": list(np.zeros((4, 32), np.float32)),
    })
    save_embeddings(stale, os.path.join(store, "wavlm"), split="train")

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(root, n_per_split={"train": 4}, seed=13)
    clips = sorted(glob.glob(os.path.join(root, "wav", "*.wav")))

    model_path = _make_artifact(str(tmp_path / "clf"), "layer_2", 32)
    out_csv = str(tmp_path / "pred.csv")
    rc = main([
        "--audio_dir", os.path.join(root, "wav"),
        "--classifier_model", model_path,
        "--model_type", "wavlm", "--model_name", "microsoft/wavlm-base",
        "--random_init", "--output", out_csv,
        "--keep_embeddings_dir", store,
        "--audio_budget", "16",
    ])
    assert rc == 0
    out = pd.read_csv(out_csv)
    assert len(out) == len(clips)
    assert not any(str(f).startswith("stale_") for f in out["filename"])
    assert (out["split"] == "predict").all()
