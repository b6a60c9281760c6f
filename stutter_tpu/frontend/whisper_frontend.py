"""Whisper input frontend: pad/trim to 30 s then batched on-device log-mel.

Replaces the reference's per-clip host-side ``WhisperProcessor`` call
(``whisper_embeddings_large.py:241-248``) with one jit program over the batch.
"""

from __future__ import annotations

import jax

from stutter_tpu.ops.logmel import WHISPER_N_SAMPLES, log_mel_spectrogram, pad_or_trim


@jax.jit
def whisper_features(waveform: jax.Array) -> jax.Array:
    """[B, T] float32 (any T) -> [B, 80, 3000] Whisper input features.

    Zero-pads/trims to exactly 480 000 samples first (HF
    ``feature_extraction_whisper.py:294-302``); zero padding is part of the
    contract — the encoder attends to the padded mel, exactly as the
    reference does.
    """
    wave = pad_or_trim(waveform, WHISPER_N_SAMPLES)
    return log_mel_spectrogram(wave)
