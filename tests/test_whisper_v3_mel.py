"""128-mel (whisper large-v3) frontend parity."""

import numpy as np


def test_128_mel_matches_hf(rng):
    from transformers import WhisperFeatureExtractor

    from stutter_tpu.frontend import whisper_features

    wave = (rng.randn(32000) * 0.2).astype(np.float32)
    fe = WhisperFeatureExtractor(feature_size=128)
    golden = fe(wave, sampling_rate=16000, return_tensors="np").input_features[0]
    ours = np.asarray(whisper_features(wave[None], n_mels=128))[0]
    assert ours.shape == golden.shape == (128, 3000)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_pallas_128_mel_matches_xla(rng):
    import jax.numpy as jnp

    from stutter_tpu.ops.logmel import log_mel_spectrogram, pad_or_trim
    from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas

    w = pad_or_trim(jnp.asarray((rng.randn(1, 16000) * 0.2).astype(np.float32)), 480000)
    ref = np.asarray(log_mel_spectrogram(w, n_mels=128))
    pal = np.asarray(whisper_log_mel_pallas(w, interpret=True, n_mels=128))
    np.testing.assert_allclose(pal, ref, atol=1e-4)
