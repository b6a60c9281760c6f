"""Windowed-sinc resampling as a batched on-device convolution.

Capability parity target: the reference resamples every clip to 16 kHz with
``torchaudio.transforms.Resample`` (reference ``WavLM_embeddings.py:105-110``)
and implements speed perturbation by resampling down/up
(``model_training_01.py:150-162``). torchaudio's kernel is the polyphase
windowed-sinc (``sinc_interp_hann``, lowpass_filter_width=6, rolloff=0.99);
this module builds the identical kernel in numpy and applies it as a single
strided ``conv_general_dilated`` — the polyphase filter becomes one
``[new, 1, K]`` conv on the MXU, batched over clips, instead of a host loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def resample_kernel_weights(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int, int, int]:
    """Polyphase sinc kernel for orig_freq -> new_freq.

    Returns (kernel [new, 1, K], width, orig, new) where orig/new are the
    gcd-reduced rates and K = 2*width + orig.
    """
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64) / orig  # [K]
    t = (-np.arange(new, dtype=np.float64) / new)[:, None] + idx[None, :]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t *= np.pi
    scale = base_freq / orig
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernel = (kernel * window * scale).astype(np.float32)
    return kernel[:, None, :], width, orig, new


def resample(
    waveform: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Resample [..., T] float32 from orig_freq to new_freq.

    Matches torchaudio ``resample(..., resampling_method='sinc_interp_hann')``
    semantics: output length ``ceil(new_freq * T / orig_freq)``.
    """
    if orig_freq == new_freq:
        return waveform
    kernel, width, orig, new = resample_kernel_weights(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    squeeze = waveform.ndim == 1
    x = waveform[None] if squeeze else waveform
    batch_shape, length = x.shape[:-1], x.shape[-1]
    x = x.reshape(-1, 1, length).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernel),
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, new, frames]
    y = jnp.transpose(y, (0, 2, 1)).reshape(len(y), -1)  # interleave phases
    target_len = int(math.ceil(new * length / orig))
    y = y[:, :target_len].reshape(*batch_shape, target_len)
    return y[0] if squeeze else y
