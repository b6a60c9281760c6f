"""Pallas kernels vs XLA reference paths (interpreter mode on CPU)."""

import numpy as np


def test_pallas_logmel_matches_xla(rng):
    import jax.numpy as jnp

    from stutter_tpu.ops.logmel import whisper_log_mel
    from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas

    w = (rng.randn(2, 480000) * 0.1).astype(np.float32)
    t = np.arange(480000) / 16000.0
    w += 0.3 * np.sin(2 * np.pi * 440 * t)[None].astype(np.float32)

    ref = np.asarray(whisper_log_mel(jnp.asarray(w)))
    pal = np.asarray(whisper_log_mel_pallas(jnp.asarray(w), interpret=True))
    assert pal.shape == ref.shape == (2, 80, 3000)
    np.testing.assert_allclose(pal, ref, atol=1e-4)
