"""Golden tests: frontends vs HF feature extractors (SURVEY.md §4 item 1)."""

import numpy as np
import pytest

from tests.conftest import cosine_distance


def test_mel_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_mel

    from stutter_tpu.ops.mel import mel_filter_bank

    ours = mel_filter_bank(201, 80, 0.0, 8000.0, 16000, norm="slaney")
    theirs = hf_mel(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("seconds", [1.0, 17.3, 30.0, 42.0])
def test_whisper_log_mel_matches_hf(rng, seconds):
    from transformers import WhisperFeatureExtractor

    from stutter_tpu.frontend import whisper_features

    n = int(16000 * seconds)
    wave = (rng.randn(n) * 0.1).astype(np.float32)
    # add tonal content so the mel image is not pure noise
    t = np.arange(n) / 16000.0
    wave += 0.3 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    fe = WhisperFeatureExtractor()
    golden = fe(wave, sampling_rate=16000, return_tensors="np").input_features[0]

    ours = np.asarray(whisper_features(wave[None]))[0]
    assert ours.shape == golden.shape == (80, 3000)
    assert cosine_distance(ours, golden) < 1e-6
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_whisper_log_mel_batched_equals_single(rng):
    from stutter_tpu.frontend import whisper_features

    waves = (rng.randn(3, 48000) * 0.1).astype(np.float32)
    batched = np.asarray(whisper_features(waves))
    for i in range(3):
        single = np.asarray(whisper_features(waves[i : i + 1]))[0]
        # per-clip max floor must make batching exactly clip-independent
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


def test_wavlm_normalize_matches_hf(rng):
    from transformers import Wav2Vec2FeatureExtractor

    from stutter_tpu.frontend import wavlm_prepare_batch

    fe = Wav2Vec2FeatureExtractor(do_normalize=True)
    lengths = [16000, 9137]
    waves = [(rng.randn(n) * 0.3).astype(np.float32) for n in lengths]
    golden = [fe(w, sampling_rate=16000, return_tensors="np").input_values[0] for w in waves]

    padded = np.zeros((2, 16000), np.float32)
    for i, w in enumerate(waves):
        padded[i, : len(w)] = w
    ours = np.asarray(wavlm_prepare_batch(padded, np.array(lengths), do_normalize=True))
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(ours[i, :n], golden[i], rtol=1e-4, atol=1e-5)
        assert np.all(ours[i, n:] == 0.0)


def test_wavlm_no_normalize_passthrough(rng):
    from stutter_tpu.frontend import wavlm_prepare_batch

    wave = (rng.randn(1, 8000) * 0.5).astype(np.float32)
    out = np.asarray(wavlm_prepare_batch(wave, np.array([8000]), do_normalize=False))
    np.testing.assert_allclose(out, wave, atol=0)
