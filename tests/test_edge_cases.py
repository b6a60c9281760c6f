"""Failure-path and edge-case behavior (SURVEY.md §5 failure detection)."""

import numpy as np
import pandas as pd
import pytest


def test_pipeline_all_files_bad(tmp_path):
    import jax

    from stutter_tpu.extract import BucketBatcher, ExtractionPipeline, WavLMExtractor
    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    meta = pd.DataFrame({
        "filename": ["a", "b"],
        "path": [str(tmp_path / "a.wav"), str(tmp_path / "b.wav")],
        "split": "train", "label": "x",
    })
    pipe = ExtractionPipeline(
        WavLMExtractor(cfg, params),
        batcher=BucketBatcher(buckets_s=(1.0,), audio_budget_s=8.0),
    )
    df = pipe.run_split(meta, "train", str(tmp_path / "out"))
    assert len(df) == 0  # all skipped, no crash, nothing persisted


def test_trainer_single_class(rng, tmp_path):
    from stutter_tpu.train import train_balanced_model

    X = rng.randn(30, 8).astype(np.float32)
    y = np.zeros(30, np.int64)  # one class only
    Xte = rng.randn(10, 8).astype(np.float32)
    yte = np.zeros(10, np.int64)
    # SMOTE skips (k < 1), classifier degenerates but must not crash
    model, results = train_balanced_model(
        X, y, Xte, yte, classifier_type="rf", class_names=["only"], use_smote=True
    )
    assert results["balanced_accuracy"] == 1.0


def test_scanner_without_labels(tmp_path, rng):
    from stutter_tpu.audio.wavio import write_wav
    from stutter_tpu.extract import create_metadata_from_files

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    write_wav(str(wav_dir / "train_0001.wav"), rng.randn(8000).astype(np.float32) * 0.1, 16000)
    write_wav(str(wav_dir / "mystery.wav"), rng.randn(8000).astype(np.float32) * 0.1, 16000)
    meta = create_metadata_from_files(str(tmp_path), split="all")
    # split inferred from filename; unlabeled rows carry no label column value
    assert set(meta["split"]) == {"train", "unknown"}
    assert "label" not in meta.columns or meta["label"].isna().all()


def test_prepare_data_drops_unlabeled(rng):
    from stutter_tpu.train.data import prepare_data

    meta = pd.DataFrame({"label": ["a", None, "b", "a"]})
    emb = rng.randn(4, 8).astype(np.float32)
    X, y, l2i, i2l = prepare_data(meta, emb)
    assert len(X) == 3
    assert set(l2i) == {"a", "b"}


def test_metrics_empty_class():
    from stutter_tpu.train.metrics import classification_metrics

    # class 2 never appears in y_true
    m = classification_metrics([0, 1, 0], [0, 1, 2], n_classes=3)
    assert 0.0 <= m["balanced_accuracy"] <= 1.0
    assert m["per_class"]["2"]["support"] == 0


def test_resample_very_short_input():
    from stutter_tpu.ops.resample import resample

    x = np.ones(5, np.float32)
    y = np.asarray(resample(x, 8000, 16000))
    assert y.shape[-1] == 10
    assert np.isfinite(y).all()
