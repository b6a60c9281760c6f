"""Pipeline + contract tests on a synthetic corpus (SURVEY.md §4 items 2-3)."""

import os

import numpy as np
import pandas as pd
import pytest

from stutter_tpu.audio.synthetic import make_synthetic_corpus
from stutter_tpu.extract import (
    BucketBatcher,
    ExtractionPipeline,
    WavLMExtractor,
    create_metadata_from_files,
    find_latest_checkpoint,
    load_checkpoint,
    load_embeddings,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    # clip lengths sized in FRAMES for the tiny 20x stem (0.3-1.8 s -> L<=1440
    # on a 2 s bucket) while still spanning two rungs of the (1, 2, 4) ladder
    truth = make_synthetic_corpus(root, n_per_split={"train": 8, "test": 4, "devel": 4},
                                  duration_range=(0.3, 1.8))
    return root, truth


@pytest.fixture(scope="module")
def tiny_wavlm():
    import jax

    from stutter_tpu.models import WavLMConfig, init_wavlm_params

    cfg = WavLMConfig.tiny(hidden_size=32, layers=2, heads=4)
    params = init_wavlm_params(jax.random.key(0), cfg)
    return cfg, params


def test_scanner_reads_ksf_layout(corpus):
    root, truth = corpus
    meta = create_metadata_from_files(root, split="all")
    assert len(meta) == len(truth)
    assert set(meta.columns) >= {"filename", "path", "label", "split"}
    assert set(meta["split"]) == {"train", "test", "devel"}
    # labels joined from lab CSVs
    merged = meta.merge(truth, on="filename", suffixes=("", "_truth"))
    assert (merged["label"] == merged["label_truth"]).all()


def test_scanner_split_filter(corpus):
    root, truth = corpus
    meta = create_metadata_from_files(root, split="train")
    assert set(meta["split"]) == {"train"}
    assert len(meta) == (truth["split"] == "train").sum()


def test_bucket_batcher_shapes(corpus):
    root, _ = corpus
    meta = create_metadata_from_files(root, split="train")
    batcher = BucketBatcher(buckets_s=(1.0, 2.0, 4.0), audio_budget_s=8.0, batch_multiple=4)
    seen = set()
    for batch in batcher.batches(list(meta["path"])):
        assert batch.waves.shape[0] % 4 == 0
        assert batch.waves.shape[1] == int(batch.bucket_s * 16000)
        assert np.all(batch.lengths[batch.ok] > 0)
        seen.update(batch.paths)
    assert seen == set(meta["path"])


def test_pipeline_end_to_end(corpus, tiny_wavlm, tmp_path):
    root, _ = corpus
    cfg, params = tiny_wavlm
    out_dir = str(tmp_path / "emb" / "wavlm")

    meta = create_metadata_from_files(root, split="all")
    extractor = WavLMExtractor(cfg, params)
    pipe = ExtractionPipeline(
        extractor,
        batcher=BucketBatcher(buckets_s=(2.0, 4.0), audio_budget_s=8.0),
        checkpoint_interval=3,
    )
    dfs = pipe.run(meta, out_dir)

    for split in ("train", "test", "devel"):
        split_dir = os.path.join(out_dir, split)
        assert os.path.exists(os.path.join(split_dir, "embedding_metadata.csv"))
        n_states = cfg.num_hidden_layers + 1
        for idx in (n_states - 1, n_states - 2, n_states - 3, n_states // 2):
            f = os.path.join(split_dir, f"layer_{idx}_embeddings.npy")
            assert os.path.exists(f), f
            arr = np.load(f)
            assert arr.shape == (len(dfs[split]), cfg.hidden_size)
            assert np.all(np.isfinite(arr))

    # read-side contract: combined loader
    metadata, layers = load_embeddings(str(tmp_path / "emb"), "wavlm")
    assert metadata is not None
    n_total = sum(len(d) for d in dfs.values())
    assert len(metadata) == n_total
    for arr in layers.values():
        assert arr.shape == (n_total, cfg.hidden_size)
    # vstack order: train -> test -> devel
    assert list(metadata["split"].unique()) == ["train", "test", "devel"]


def test_pipeline_batched_equals_reference_loop(corpus, tiny_wavlm, tmp_path):
    """Bucketed batched extraction must equal a per-file batch=1 loop."""
    import jax.numpy as jnp

    from stutter_tpu.audio.wavio import load_audio
    from stutter_tpu.frontend import wavlm_prepare_batch
    from stutter_tpu.models import wavlm_encode

    root, _ = corpus
    cfg, params = tiny_wavlm
    out_dir = str(tmp_path / "emb2" / "wavlm")
    meta = create_metadata_from_files(root, split="devel")

    pipe = ExtractionPipeline(
        WavLMExtractor(cfg, params),
        batcher=BucketBatcher(buckets_s=(1.0, 2.0), audio_budget_s=16.0),
    )
    df = pipe.run_split(meta, "devel", out_dir)

    n_states = cfg.num_hidden_layers + 1
    col = f"layer_{n_states - 1}"
    for _, row in df.iterrows():
        wave = load_audio(row["path"], target_sr=16000)
        w = wavlm_prepare_batch(wave[None], np.array([len(wave)]), cfg.do_normalize)
        single = np.asarray(
            wavlm_encode(params, w, cfg, (n_states - 1,), sample_lengths=jnp.array([len(wave)]))
        )[0, 0]
        got = np.asarray(row[col])
        cos = 1 - np.dot(single, got) / (np.linalg.norm(single) * np.linalg.norm(got))
        assert cos < 1e-5, (row["path"], cos)


def test_checkpoint_resume(corpus, tiny_wavlm, tmp_path):
    root, _ = corpus
    cfg, params = tiny_wavlm
    out_dir = str(tmp_path / "emb3" / "wavlm")
    meta = create_metadata_from_files(root, split="train")

    # simulate a prior partial run: checkpoint with first 3 files "done"
    n_states = cfg.num_hidden_layers + 1
    layer_cols = [f"layer_{i}" for i in (n_states - 1, n_states - 2, n_states - 3, n_states // 2)]
    fake_results = []
    for _, row in meta.iloc[:3].iterrows():
        entry = {
            "filename": row["filename"], "path": row["path"], "split": "train",
            "label": row["label"], "marker": True,
        }
        for c in layer_cols:
            entry[c] = np.full((cfg.hidden_size,), 7.0, np.float32)
        fake_results.append(entry)
    save_checkpoint(fake_results, out_dir, "train", 1)
    assert find_latest_checkpoint(out_dir, "train") == 1
    assert len(load_checkpoint(out_dir, "train", 1)) == 3

    pipe = ExtractionPipeline(
        WavLMExtractor(cfg, params),
        batcher=BucketBatcher(buckets_s=(2.0,), audio_budget_s=64.0),
        checkpoint_interval=100,
    )
    df = pipe.run_split(meta, "train", out_dir, resume=True)
    # the 3 checkpointed rows survive untouched; remaining rows got extracted
    assert len(df) == len(meta)
    assert df["path"].is_unique
    markers = df.get("marker")
    assert markers.notna().sum() == 3


def test_pipeline_skips_bad_files(corpus, tiny_wavlm, tmp_path):
    root, _ = corpus
    cfg, params = tiny_wavlm
    meta = create_metadata_from_files(root, split="devel").copy()
    bad = meta.iloc[0:1].copy()
    bad["path"] = str(tmp_path / "nope.wav")
    bad["filename"] = "nope"
    meta = pd.concat([meta, bad], ignore_index=True)

    pipe = ExtractionPipeline(
        WavLMExtractor(cfg, params),
        batcher=BucketBatcher(buckets_s=(2.0,), audio_budget_s=64.0),
    )
    df = pipe.run_split(meta, "devel", str(tmp_path / "emb4"))
    assert len(df) == len(meta) - 1
    assert "nope" not in set(df["filename"])


def test_i16_transfer_relative_error_bounded(rng):
    """Per-clip peak-scaled int16 transfer (encode_waves_i16): quantization
    error is bounded RELATIVE to each clip's peak — including very quiet
    clips, where a fixed 1/32768 grid would be percent-level error that
    per-clip normalization then amplifies into the encoder."""
    from stutter_tpu.extract.pipeline import encode_waves_i16

    for amplitude in (0.6, 1e-3, 1e-5):  # loud, quiet, near-silent
        waves = (rng.randn(3, 4000) * amplitude).astype(np.float32)
        q, scale = encode_waves_i16(waves)
        assert q.dtype == np.int16 and scale.shape == (3,)
        recon = q.astype(np.float32) * scale[:, None]
        peak = np.abs(waves).max(axis=1, keepdims=True)
        assert np.abs(recon - waves).max() <= peak.max() / 32767.0 + 1e-12
        # relative to the clip's own scale: ~3e-5, ~100x below bf16 rounding
        assert (np.abs(recon - waves) / peak).max() < 3.1e-5

    # all-zero (pad) rows round-trip to exactly zero
    q, scale = encode_waves_i16(np.zeros((2, 100), np.float32))
    assert (q == 0).all()


def test_i16_transfer_matches_f32_program(tiny_wavlm, rng):
    """The int16 transfer path must produce (near-)identical embeddings to
    the f32 transfer through the same program."""
    from stutter_tpu.extract.batcher import Batch
    from stutter_tpu.extract.pipeline import WavLMExtractor

    cfg, params = tiny_wavlm
    waves = (rng.randint(-20000, 20000, size=(4, 8000)).astype(np.float32)) / 32768.0
    lengths = np.array([8000, 6000, 8000, 4000], np.int64)
    for i, n in enumerate(lengths):
        waves[i, n:] = 0.0
    batch = Batch(paths=[f"p{i}" for i in range(4)], rows=list(range(4)),
                  waves=waves, lengths=lengths, ok=np.ones(4, bool), bucket_s=0.5)

    ex = WavLMExtractor(cfg, params, preset="fast")
    assert ex._transfer_i16
    out_i16 = ex(batch)
    ex._transfer_i16 = False  # force the f32 transfer path, same program
    out_f32 = ex(batch)
    for k in out_i16:
        # ~3e-5 relative input quantization through a bf16 network: the
        # pooled embeddings agree far inside the 1e-3 fidelity bar
        a, b = out_i16[k].astype(np.float64), out_f32[k].astype(np.float64)
        denom = np.maximum(np.abs(b).max(), 1e-9)
        assert np.abs(a - b).max() / denom < 2e-3, k


def _tiny_clip(path, n=8000, seed=0):
    from stutter_tpu.audio.wavio import write_wav

    rs = np.random.RandomState(seed)
    write_wav(path, (rs.randn(n) * 0.05).astype(np.float32), 16000)


def test_scanner_split_prefix_fallback(tmp_path):
    """Reference alt-filename join (whisper_embeddings_large.py:144-150):
    a CSV id 'c1' labels the clip 'devel_c1.wav'. Reused bare ids across
    splits must each join their own CSV's row, never cross splits."""
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "wav"))
    os.makedirs(os.path.join(root, "lab"))
    for name in ("train_c1.wav", "devel_c1.wav"):
        _tiny_clip(os.path.join(root, "wav", name))
    pd.DataFrame({"id": ["c1"], "label": ["block"]}).to_csv(
        os.path.join(root, "lab", "train.csv"), index=False)
    pd.DataFrame({"id": ["c1"], "label": ["prolongation"]}).to_csv(
        os.path.join(root, "lab", "devel.csv"), index=False)

    meta = create_metadata_from_files(root, split="all").set_index("filename")
    assert meta.loc["train_c1", "label"] == "block"
    assert meta.loc["train_c1", "split"] == "train"
    assert meta.loc["devel_c1", "label"] == "prolongation"
    assert meta.loc["devel_c1", "split"] == "devel"


def test_scanner_extra_csv_columns_ride_along(tmp_path):
    """All label-CSV columns reach the metadata (the whisper reference keeps
    row.to_dict(), whisper_embeddings_large.py:155-157), with computed
    filename/path winning over same-named CSV columns."""
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "wav"))
    os.makedirs(os.path.join(root, "lab"))
    _tiny_clip(os.path.join(root, "wav", "clip_a.wav"))
    pd.DataFrame({
        "filename": ["clip_a.wav"],
        "label": ["repetition"],
        "severity": [3],
        "annotator": ["x9"],
    }).to_csv(os.path.join(root, "lab", "train.csv"), index=False)

    meta = create_metadata_from_files(root, split="all")
    row = meta.iloc[0]
    assert row["label"] == "repetition"
    assert row["severity"] == 3 and row["annotator"] == "x9"
    # computed values, not the CSV's literal filename string
    assert row["filename"] == "clip_a"
    assert row["path"].endswith(os.path.join("wav", "clip_a.wav"))
