"""Whisper input frontend: pad/trim to 30 s then batched on-device log-mel.

Replaces the reference's per-clip host-side ``WhisperProcessor`` call
(``whisper_embeddings_large.py:241-248``) with one jit program over the batch.
"""

from __future__ import annotations

import os

import jax

from stutter_tpu.ops.logmel import WHISPER_N_SAMPLES, log_mel_spectrogram, pad_or_trim


def _use_pallas() -> bool:
    if os.environ.get("STUTTER_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


@jax.jit
def whisper_features(waveform: jax.Array) -> jax.Array:
    """[B, T] float32 (any T) -> [B, 80, 3000] Whisper input features.

    Zero-pads/trims to exactly 480 000 samples first (HF
    ``feature_extraction_whisper.py:294-302``); zero padding is part of the
    contract — the encoder attends to the padded mel, exactly as the
    reference does. On TPU the fused Pallas kernel computes the mel image;
    the XLA conv path serves CPU and acts as the numerics reference.
    """
    wave = pad_or_trim(waveform, WHISPER_N_SAMPLES)
    if _use_pallas():
        from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas

        return whisper_log_mel_pallas(wave)
    return log_mel_spectrogram(wave)
