"""Classification serving: trained heads applied to served embeddings.

The reference trains and persists per-layer classifiers
(``model_training_01.py:454-563,656-687``) but never applies them to new
audio; serve/classify.py closes that loop. These tests pin the artifact
contract (joblib + sidecar ``layer``/``class_names``), the batch-classify
round semantics, and the CLI plumbing.
"""

import glob
import json
import os

import jax
import numpy as np
import pytest

from stutter_tpu.audio.synthetic import make_synthetic_corpus
from stutter_tpu.extract import BucketBatcher, WavLMExtractor
from stutter_tpu.models import WavLMConfig, init_wavlm_params
from stutter_tpu.serve import EmbeddingServer, Request, ServingClassifier
from stutter_tpu.train.persistence import save_model

CLASS_NAMES = ["Block", "Fluent", "Prolongation"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("classify_corpus")
    make_synthetic_corpus(str(root), n_per_split={"train": 4},
                          duration_range=(0.3, 0.9))  # frames-sized for the tiny 20x stem
    return sorted(glob.glob(os.path.join(str(root), "wav", "*.wav")))


@pytest.fixture(scope="module")
def extractor():
    cfg = WavLMConfig.tiny()
    return WavLMExtractor(cfg, init_wavlm_params(jax.random.key(0), cfg), preset="fast")


@pytest.fixture(scope="module")
def model_path(tmp_path_factory, extractor):
    """A trained sklearn pipeline persisted through the C20 artifact pair."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    layer = extractor.column_names[0]
    rs = np.random.RandomState(0)
    X = rs.randn(30, extractor.embedding_dim).astype(np.float32)
    y = rs.randint(0, len(CLASS_NAMES), size=30)
    model = Pipeline([("scaler", StandardScaler()),
                      ("clf", LogisticRegression(max_iter=200))]).fit(X, y)
    out = str(tmp_path_factory.mktemp("clf_artifacts"))
    return save_model(model, out, "wavlm", layer, "svm", {"accuracy": 1.0},
                      class_names=CLASS_NAMES)


def test_sidecar_contract_and_load(model_path, extractor):
    info_path = model_path.replace("_model.joblib", "_info.json")
    with open(info_path) as f:
        info = json.load(f)
    assert info["class_names"] == CLASS_NAMES
    assert info["layer"] == extractor.column_names[0]

    clf = ServingClassifier.load(model_path)
    assert clf.layer == extractor.column_names[0]
    assert clf.class_names == CLASS_NAMES


def test_predict_rows_labels_and_probs(model_path):
    clf = ServingClassifier.load(model_path)
    rs = np.random.RandomState(1)
    X = rs.randn(5, clf.estimator.named_steps["scaler"].n_features_in_)
    labels, probs = clf.predict_rows(X)
    raw = clf.estimator.predict(X)
    assert labels == [CLASS_NAMES[int(i)] for i in raw]
    assert probs is not None and len(probs) == 5
    for p in probs:
        assert set(p) <= set(CLASS_NAMES)
        assert abs(sum(p.values()) - 1.0) < 1e-6


def test_server_classifies_responses(corpus, extractor, model_path):
    clf = ServingClassifier.load(model_path)
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0, max_batch=4),
        max_wait_s=0.05, max_clips=4, classifier=clf,
    )
    responses = []
    server.serve(iter([Request(f"r{i}", p) for i, p in enumerate(corpus)]),
                 responses.append)
    assert len(responses) == len(corpus)
    for r in responses:
        assert r.ok, r.error
        assert r.prediction in CLASS_NAMES
        assert abs(sum(r.probs.values()) - 1.0) < 1e-6
        # prediction must equal a direct estimator call on the served vector
        direct = clf.predict_rows(r.embeddings[clf.layer][None, :])[0][0]
        assert r.prediction == direct


def test_server_rejects_mismatched_layer(extractor, model_path):
    clf = ServingClassifier.load(model_path)
    clf.layer = "layer_does_not_exist"
    with pytest.raises(ValueError, match="trained on column"):
        EmbeddingServer(extractor, classifier=clf)


def test_classification_failure_still_ships_embeddings(corpus, extractor, model_path):
    """A broken estimator degrades to embeddings-only ok responses."""
    clf = ServingClassifier.load(model_path)
    clf.estimator = None  # predict will raise AttributeError
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0, max_batch=4),
        max_wait_s=0.01, max_clips=4, classifier=clf,
    )
    responses = []
    server.serve(iter([Request("a", corpus[0])]), responses.append)
    r = responses[0]
    assert r.ok and r.prediction is None
    assert "classification failed" in r.error
    assert r.embeddings and np.isfinite(r.embeddings[clf.layer]).all()


def test_server_classifies_chunked_long_clips(corpus, extractor, model_path, tmp_path):
    from stutter_tpu.audio.wavio import load_audio, write_wav

    wave = load_audio(corpus[0], target_sr=16000)
    long_wave = np.tile(wave, int(np.ceil(10.0 * 16000 / len(wave))))[: 10 * 16000]
    long_path = str(tmp_path / "long_10s.wav")
    write_wav(long_path, long_wave, 16000)

    clf = ServingClassifier.load(model_path)
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=16.0, max_batch=4),
        max_wait_s=0.01, max_clips=4, long_clip_policy="chunk", classifier=clf,
    )
    responses = []
    server.serve(iter([Request("long", long_path)]), responses.append)
    r = responses[0]
    assert r.ok and r.prediction in CLASS_NAMES
    direct = clf.predict_rows(r.embeddings[clf.layer][None, :])[0][0]
    assert r.prediction == direct


def test_serve_cli_with_classifier(corpus, model_path, tmp_path, monkeypatch, capsys):
    from stutter_tpu.cli import serve as serve_cli

    monkeypatch.setattr(
        WavLMConfig, "base", staticmethod(lambda: WavLMConfig.tiny())
    )
    req_file = tmp_path / "reqs.jsonl"
    req_file.write_text(json.dumps({"id": "q0", "path": corpus[0]}) + "\n")
    monkeypatch.chdir(tmp_path)
    rc = serve_cli.main([
        "--model_type", "wavlm", "--model_name", "microsoft/wavlm-base",
        "--random_init", "--input", str(req_file),
        "--output_dir", str(tmp_path / "emb"), "--max_wait_ms", "10",
        "--classifier_model", model_path,
    ])
    assert rc == 0
    out_lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(out_lines) == 1 and out_lines[0]["ok"]
    assert out_lines[0]["prediction"] in CLASS_NAMES
    assert abs(sum(out_lines[0]["probs"].values()) - 1.0) < 1e-6


def test_label_encoded_backend_probs_align(tmp_path):
    """The xgb stand-in's LabelEncoder round trip must expose classes_ so
    probability columns map to ORIGINAL labels — non-contiguous label sets
    (a class present only in eval) otherwise key probs by raw column index
    and contradict the served prediction."""
    from stutter_tpu.train.classifiers import make_classifier
    from stutter_tpu.train.persistence import save_model

    names = ["A", "B", "C", "D"]
    rs = np.random.RandomState(3)
    X = rs.randn(40, 8).astype(np.float32)
    y = rs.choice([0, 1, 3], size=40)  # class 2 never trained
    model = make_classifier("xgb", 8, 4).fit(X, y)
    np.testing.assert_array_equal(np.asarray(model.classes_), [0, 1, 3])

    path = save_model(model, str(tmp_path), "wavlm", "layer_2", "xgb",
                      class_names=names)
    clf = ServingClassifier.load(path)
    labels, probs = clf.predict_rows(rs.randn(6, 8).astype(np.float32))
    assert probs is not None
    for lab, p in zip(labels, probs):
        assert set(p) == {"A", "B", "D"}  # original labels, never 'C'
        assert lab in p
        # the served prediction is the argmax of its own probs dict
        assert lab == max(p, key=p.get)


def test_jax_head_served_predictions(corpus, extractor, tmp_path):
    """The JAX-native head (train/heads.py) serves through the same path."""
    from stutter_tpu.train.heads import HeadConfig, JaxClassifier

    layer = extractor.column_names[-1]
    rs = np.random.RandomState(2)
    X = rs.randn(24, extractor.embedding_dim).astype(np.float32)
    y = rs.randint(0, 2, size=24)
    head = JaxClassifier(
        HeadConfig(in_dim=extractor.embedding_dim, n_classes=2, hidden_dims=(),
                   epochs=3, batch_size=8)
    ).fit(X, y)
    path = save_model(head, str(tmp_path), "wavlm", layer, "mlp",
                      class_names=["NoStutter", "Stutter"])
    clf = ServingClassifier.load(path)
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0, max_batch=4),
        max_wait_s=0.01, max_clips=4, classifier=clf,
    )
    responses = []
    server.serve(iter([Request("a", corpus[0])]), responses.append)
    r = responses[0]
    assert r.ok and r.prediction in ("NoStutter", "Stutter")
    assert set(r.probs) == {"NoStutter", "Stutter"}
