"""Phase-vocoder pitch shift on device (reference C12 'pitch' augmentation).

The reference uses ``torchaudio.transforms.PitchShift`` (phase-vocoder
time-stretch + resample; ``model_training_01.py:173-176``). Same algorithm
here, built from jit-able pieces: matmul STFT (DFT basis on the MXU), phase
accumulation via ``cumsum``, overlap-add iSTFT, then the shared windowed-sinc
resampler. torchaudio defaults mirrored: n_fft=512, hop=n_fft//4, hann,
rate = 2^(-n_steps/12).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stutter_tpu.ops.resample import resample


@functools.lru_cache(maxsize=4)
def _fourier_bases(n_fft: int):
    n = np.arange(n_fft)[None, :]
    k = np.arange(n_fft // 2 + 1)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    win = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))[None, :]
    fwd_cos = (np.cos(ang) * win).astype(np.float32)
    fwd_sin = (-np.sin(ang) * win).astype(np.float32)
    # inverse: x[n] = sum_k w_k (Re X_k cos - Im X_k sin), w_k = 1/N * (1 or 2)
    scale = np.full((n_fft // 2 + 1, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    inv_cos = (np.cos(ang) * scale).astype(np.float32)
    inv_sin = (-np.sin(ang) * scale).astype(np.float32)
    return fwd_cos, fwd_sin, inv_cos, inv_sin, win[0].astype(np.float32)


def _stft(x: jax.Array, n_fft: int, hop: int):
    """Center reflect-padded STFT -> (real, imag) [F, bins]."""
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (xp.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = xp[idx]  # [F, n_fft]
    fwd_cos, fwd_sin, *_ = _fourier_bases(n_fft)
    real = frames @ jnp.asarray(fwd_cos).T
    imag = frames @ jnp.asarray(fwd_sin).T
    return real, imag


def _istft(real: jax.Array, imag: jax.Array, n_fft: int, hop: int, length: int):
    """Overlap-add inverse STFT with hann synthesis window + COLA norm."""
    _, _, inv_cos, inv_sin, win = _fourier_bases(n_fft)
    frames = real @ jnp.asarray(inv_cos) + imag @ jnp.asarray(inv_sin)  # [F, n_fft]
    frames = frames * jnp.asarray(win)[None, :]
    n_frames = frames.shape[0]
    total = n_fft + (n_frames - 1) * hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    out = jnp.zeros((total,), frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    norm = jnp.zeros((total,), frames.dtype).at[idx.reshape(-1)].add(
        jnp.broadcast_to(jnp.asarray(win * win)[None, :], frames.shape).reshape(-1)
    )
    pad = n_fft // 2
    out = out[pad : pad + length] / jnp.maximum(norm[pad : pad + length], 1e-8)
    return out


def phase_vocoder(real: jax.Array, imag: jax.Array, rate: float, hop: int, n_fft: int):
    """Time-stretch a (real, imag) STFT by `rate` (torchaudio semantics)."""
    n_frames = real.shape[0]
    n_bins = real.shape[1]
    phase_advance = jnp.asarray(
        (np.linspace(0, np.pi * hop, n_bins, dtype=np.float32))[None, :]
    )
    steps = jnp.arange(0, n_frames, rate)  # output frame positions (float)
    # pad two frames so idx+1 stays valid at the stretched tail (torchaudio
    # phase_vocoder semantics)
    real_p = jnp.concatenate([real, jnp.zeros((2, n_bins), real.dtype)])
    imag_p = jnp.concatenate([imag, jnp.zeros((2, n_bins), imag.dtype)])

    idx = jnp.floor(steps).astype(jnp.int32)
    frac = (steps - idx)[:, None]

    mag0 = jnp.sqrt(real_p[idx] ** 2 + imag_p[idx] ** 2)
    mag1 = jnp.sqrt(real_p[idx + 1] ** 2 + imag_p[idx + 1] ** 2)
    mag = (1 - frac) * mag0 + frac * mag1

    phase0 = jnp.arctan2(imag_p[idx], real_p[idx])
    phase1 = jnp.arctan2(imag_p[idx + 1], real_p[idx + 1])
    dphase = phase1 - phase0 - phase_advance
    dphase = dphase - 2 * jnp.pi * jnp.round(dphase / (2 * jnp.pi))
    dphase = dphase + phase_advance

    # accumulated output phase: phase of first frame, then cumulative advances
    first = phase0[0:1]
    acc = jnp.cumsum(jnp.concatenate([first, dphase[:-1]]), axis=0)
    return mag * jnp.cos(acc), mag * jnp.sin(acc)


def pitch_shift(
    waveform: jax.Array,
    sample_rate: int,
    n_steps: int,
    bins_per_octave: int = 12,
    n_fft: int = 512,
    freq_quantum: int = 50,
) -> jax.Array:
    """Shift pitch by n_steps semitones, preserving duration ([T] -> [T]).

    ``freq_quantum`` snaps the intermediate resample frequency to a multiple
    of itself: the exact ``int(sr/rate)`` is usually COPRIME with the sample
    rate (e.g. 17959 vs 16000 for +2 semitones), which makes the gcd-reduced
    polyphase sinc kernel ~[16000, 18000] — gigabytes and minutes to build
    (torchaudio's resampler shares this pathology). Snapping to 50 Hz keeps
    the kernel tiny at <=0.3% rate error (<0.06 semitones), inaudible for
    the +-2-semitone augmentation this implements.
    """
    if n_steps == 0:
        return waveform
    hop = n_fft // 4
    length = waveform.shape[0]
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    real, imag = _stft(waveform.astype(jnp.float32), n_fft, hop)
    real_s, imag_s = phase_vocoder(real, imag, rate, hop, n_fft)
    stretched_len = int(round(length / rate))
    y = _istft(real_s, imag_s, n_fft, hop, stretched_len)
    orig_freq = int(sample_rate / rate)
    if freq_quantum > 1:
        orig_freq = max(freq_quantum, round(orig_freq / freq_quantum) * freq_quantum)
    y = resample(y, orig_freq, sample_rate)
    # pad/trim back to the original length (torchaudio fixes output length)
    if y.shape[0] >= length:
        return y[:length]
    return jnp.pad(y, (0, length - y.shape[0]))
