"""Full training-driver tests: extraction store -> balanced + grid pipelines."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_wavlm():
    import jax

    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def store(tmp_path_factory, tiny_wavlm):
    """A real extraction store built from a synthetic corpus."""
    from stutter_tpu.audio.synthetic import make_synthetic_corpus
    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WavLMExtractor,
        create_metadata_from_files,
    )

    cfg, params = tiny_wavlm
    root = str(tmp_path_factory.mktemp("corpus"))
    emb = str(tmp_path_factory.mktemp("emb"))
    # clip lengths are chosen in FRAMES: the tiny stem downsamples 20x (not
    # 320x), so a 4 s bucket means L=3200 einsum attention on the 1-core CPU
    # host — this fixture alone cost 67 s of the suite at (0.5, 3.0)/4.0
    make_synthetic_corpus(
        root, n_per_split={"train": 16, "test": 6, "devel": 6}, label_skew=0.55,
        seed=3, duration_range=(0.3, 0.8),
    )
    meta = create_metadata_from_files(root, split="all")
    extractor = WavLMExtractor(cfg, params)
    ExtractionPipeline(
        extractor, batcher=BucketBatcher(buckets_s=(0.8,), audio_budget_s=64.0)
    ).run(meta, os.path.join(emb, "wavlm"))
    return emb, extractor


def test_run_balanced_training(store, tmp_path):
    from stutter_tpu.train.trainer import TrainConfig, run_balanced_training

    emb, extractor = store
    results_dir = str(tmp_path / "results")
    cfg = TrainConfig(
        embeddings_dir=emb, results_dir=results_dir, model_type="wavlm",
        classifiers=("linear", "rf"), smote_k_neighbors=2,
        augmentation_factor=1, minority_threshold=10,
        head_overrides={"epochs": 30},
    )
    best = run_balanced_training(cfg, extractor=extractor)
    # tiny 2-layer model -> hidden-state indices (2,1,0,1) dedupe to 3 columns
    assert len(best) == 3
    for r in best.values():
        assert 0.0 <= r["balanced_accuracy"] <= 1.0

    # artifact contract
    assert os.path.exists(os.path.join(results_dir, "all_results_comparison.csv"))
    assert os.path.exists(os.path.join(results_dir, "layer_comparison_summary.csv"))
    assert os.path.exists(os.path.join(results_dir, "final_summary.txt"))
    assert os.path.exists(os.path.join(results_dir, "best_per_layer.json"))
    layer_dir = os.path.join(results_dir, "layer_2")
    files = os.listdir(layer_dir)
    assert any(f.endswith("_model.joblib") for f in files)
    assert any(f.endswith("_info.json") for f in files)
    assert any(f.endswith("_classification_report.txt") for f in files)
    assert any(f.endswith("_confusion_matrix.png") for f in files)
    info = json.load(open(os.path.join(
        layer_dir, [f for f in files if f.endswith("_info.json")][0])))
    assert info["model_type"] == "wavlm"
    assert "metrics" in info


def test_run_grid_training(store, tmp_path):
    from stutter_tpu.train.trainer import TrainConfig, run_grid_training

    emb, _ = store
    results_dir = str(tmp_path / "grid_results")
    cfg = TrainConfig(
        embeddings_dir=emb, results_dir=results_dir, model_type="wavlm",
        smote_k_neighbors=2,
    )
    best = run_grid_training(cfg)
    assert len(best) == 3
    for r in best.values():
        assert "configuration" in r
    assert os.path.exists(os.path.join(results_dir, "final_summary.txt"))


def test_saved_model_roundtrip(store, tmp_path):
    from stutter_tpu.train.heads import HeadConfig, JaxClassifier
    from stutter_tpu.train.persistence import load_model, save_model

    rng = np.random.RandomState(0)
    X = rng.randn(40, 8).astype(np.float32)
    y = rng.randint(0, 2, 40)
    clf = JaxClassifier(HeadConfig(in_dim=8, n_classes=2, epochs=20))
    clf.fit(X, y)
    path = save_model(clf, str(tmp_path), "wavlm", "layer_3", "mlp", {"accuracy": 1.0})
    loaded = load_model(path)
    np.testing.assert_array_equal(loaded.predict(X), clf.predict(X))
