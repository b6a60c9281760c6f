"""Whisper extraction pipeline e2e on a synthetic corpus."""

import os

import numpy as np
import pytest


def test_whisper_extraction_end_to_end(tmp_path, rng):
    import jax

    from stutter_tpu.audio.synthetic import make_synthetic_corpus
    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WhisperExtractor,
        create_metadata_from_files,
    )
    from stutter_tpu.models import WhisperConfig, init_whisper_params

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(root, n_per_split={"devel": 5}, seed=11)
    cfg = WhisperConfig.tiny(d_model=32, layers=2, heads=4)
    params = init_whisper_params(jax.random.key(0), cfg)

    meta = create_metadata_from_files(root, split="devel")
    extractor = WhisperExtractor(cfg, params)
    out = str(tmp_path / "emb" / "whisper")
    pipe = ExtractionPipeline(
        extractor,
        batcher=BucketBatcher(buckets_s=(30.0,), audio_budget_s=150.0),
    )
    df = pipe.run_split(meta, "devel", out)
    assert len(df) == 5

    files = os.listdir(os.path.join(out, "devel"))
    enc = sorted(f for f in files if f.startswith("encoder_layer_"))
    dec = sorted(f for f in files if f.startswith("decoder_layer_"))
    assert len(enc) == 3 and len(dec) == 3
    for f in enc + dec:
        arr = np.load(os.path.join(out, "devel", f))
        assert arr.shape == (5, cfg.d_model)
        assert np.isfinite(arr).all()

    # parity with a direct per-clip forward (encoder mean over all 1500
    # positions including mel padding — the reference's exact behavior)
    from stutter_tpu.audio.wavio import load_audio
    from stutter_tpu.frontend import whisper_features
    from stutter_tpu.models.whisper import whisper_encoder_forward

    row = df.iloc[0]
    wave = load_audio(row["path"], target_sr=16000)
    mel = whisper_features(np.asarray(wave)[None])
    _, states = whisper_encoder_forward(params, mel, cfg)
    golden = np.asarray(states[cfg.encoder_layers].mean(axis=1))[0]
    got = np.asarray(row[f"encoder_layer_{cfg.encoder_layers}"])
    cos = 1 - np.dot(golden, got) / (np.linalg.norm(golden) * np.linalg.norm(got))
    assert cos < 1e-5, cos
