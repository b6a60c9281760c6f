"""WavLM waveform frontend: per-utterance zero-mean / unit-variance norm.

Behavior parity: HF ``Wav2Vec2FeatureExtractor.zero_mean_unit_var_norm``
(``feature_extraction_wav2vec2.py:80-100``) — normalization over the clip's
true (unpadded) length with variance epsilon 1e-7. ``do_normalize`` is a
per-checkpoint flag (True for wavlm-large, False for the wavlm-base family);
the reference applies whatever the checkpoint's preprocessor config says
(``WavLM_embeddings.py:289-293``).

TPU-first: the reference normalizes one clip at a time on host; here the whole
padded batch is normalized in one masked jit op so extraction stays on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_VAR_EPS = 1e-7


def wavlm_normalize(waveform: jax.Array, lengths: jax.Array) -> jax.Array:
    """Masked per-clip zero-mean/unit-var norm of a padded [B, T] batch.

    Padding positions are forced to 0 afterwards (HF pads with 0.0 after
    normalizing each clip independently).
    """
    T = waveform.shape[-1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    n = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
    x = waveform.astype(jnp.float32) * mask
    mean = jnp.sum(x, axis=-1, keepdims=True) / n
    centered = (waveform.astype(jnp.float32) - mean) * mask
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / n
    return centered / jnp.sqrt(var + _VAR_EPS) * mask


def wavlm_prepare_batch(
    waveform: jax.Array, lengths: jax.Array, do_normalize: bool
) -> jax.Array:
    """Apply the checkpoint's normalization policy to a padded batch."""
    if do_normalize:
        return wavlm_normalize(waveform, lengths)
    T = waveform.shape[-1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    return waveform.astype(jnp.float32) * mask
