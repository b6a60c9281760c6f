"""Whisper input frontend: pad/trim to 30 s then batched on-device log-mel.

Replaces the reference's per-clip host-side ``WhisperProcessor`` call
(``whisper_embeddings_large.py:241-248``) with one jit program over the batch.
"""

from __future__ import annotations

import functools
import os

import jax

from stutter_tpu.ops.logmel import WHISPER_N_SAMPLES, log_mel_spectrogram, pad_or_trim


def _use_pallas() -> bool:
    # NOTE: evaluated at trace time; the first call per shape freezes the
    # choice into the jit cache
    if os.environ.get("STUTTER_TPU_NO_PALLAS", "").lower() in ("1", "true", "yes"):
        return False
    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def whisper_features(waveform: jax.Array, n_mels: int = 80) -> jax.Array:
    """[B, T] float32 (any T) -> [B, n_mels, 3000] Whisper input features.

    n_mels is 80 for whisper tiny..large-v2, 128 for large-v3.

    Zero-pads/trims to exactly 480 000 samples first (HF
    ``feature_extraction_whisper.py:294-302``); zero padding is part of the
    contract — the encoder attends to the padded mel, exactly as the
    reference does. On TPU the fused Pallas kernel computes the mel image;
    the XLA conv path serves CPU and acts as the numerics reference.
    """
    wave = pad_or_trim(waveform, WHISPER_N_SAMPLES)
    if _use_pallas():
        from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas

        return whisper_log_mel_pallas(wave, n_mels=n_mels)
    return log_mel_spectrogram(wave, n_mels=n_mels)
