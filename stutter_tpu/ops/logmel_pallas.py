"""Fused Pallas TPU kernel for the Whisper log-mel frontend.

The XLA path (ops/logmel.py) lowers to conv + elementwise + matmul with
intermediate HBM round-trips for the [F, 402] spectrum. This kernel fuses the
whole per-clip pipeline — hop-strided framing, windowed DFT (two MXU matmuls
against a cos/sin basis), power, mel projection, log10 — inside VMEM, one
grid step per (clip, frame-block). The per-clip max-8 floor and (x+4)/4
affine need the global max over the clip's mel image, so they run as a tiny
fused epilogue outside the kernel (two elementwise ops XLA fuses into one
pass).

Framing trick: with hop=160 and n_fft=400, frame t = rows t..t+2 of the
[F+2, 160] hop-strided reshape of the padded wave, so a frame block is built
from three static slices of a contiguous VMEM tile — no gather needed.

Guide: /opt/skills/guides/pallas_guide.md (grid/BlockSpec, MXU matmul,
preferred_element_type, VMEM budgeting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stutter_tpu.ops.logmel import (
    WHISPER_HOP,
    WHISPER_N_FFT,
    WHISPER_N_MELS,
    WHISPER_N_SAMPLES,
    WHISPER_SR,
    _dft_basis,
    _whisper_mel_matrix,
)

FRAME_BLOCK = 600  # frames per grid step (3000 = 5 blocks; multiple of 8 for sublane tiling)


def _logmel_kernel(r0_ref, r1_ref, r2_ref, basis_ref, mel_ref, out_ref):
    """One (clip, frame-block): shifted row tiles -> [FRAME_BLOCK, 80].

    frame t = concat(rows[t], rows[t+1], rows[t+2][:80]) (n_fft = 2.5 * hop);
    the three shifted row views arrive as separate non-overlapping-blocked
    inputs because BlockSpec blocks cannot overlap.
    """
    hop = WHISPER_HOP
    n_fft = WHISPER_N_FFT
    f0 = r0_ref[0]
    f1 = r1_ref[0]
    f2 = r2_ref[0][:, : n_fft - 2 * hop]
    frames = jnp.concatenate([f0, f1, f2], axis=1)  # [FRAME_BLOCK, 400]
    # windowed DFT on the MXU: [FB, 400] @ [400, 402]. HIGHEST precision:
    # quiet frames rely on destructive cancellation a single bf16 pass loses
    # (observed 0.1 log10 error at the dynamic-range floor).
    spec = jnp.dot(
        frames, basis_ref[:],
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    n_bins = n_fft // 2 + 1
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2  # [FB, 201]
    mel = jnp.dot(
        power, mel_ref[:],
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # [FB, 80]
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.lru_cache(maxsize=2)
def _padded_basis() -> np.ndarray:
    # [2*201, 1, 400] -> [400, 402] (transposed for frames @ basis)
    return np.ascontiguousarray(_dft_basis(WHISPER_N_FFT)[:, 0, :].T)


@functools.partial(jax.jit, static_argnames=("interpret", "n_mels"))
def whisper_log_mel_pallas(
    waveform: jax.Array, interpret: bool = False, n_mels: int = WHISPER_N_MELS
) -> jax.Array:
    """[B, 480000] float32 -> [B, n_mels, 3000], fused on-chip.

    Numerically equivalent to ops/logmel.whisper_log_mel (tested to 1e-4).
    interpret=True runs the Pallas interpreter (CPU test path). n_mels is 80
    for whisper <= large-v2, 128 for large-v3.
    """
    B, T = waveform.shape
    assert T == WHISPER_N_SAMPLES, f"whisper contract: 480000 samples, got {T}"
    hop, n_fft = WHISPER_HOP, WHISPER_N_FFT
    pad = n_fft // 2
    x = jnp.pad(waveform.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    # drop the trailing frame (HF drops it): need 3000 frames -> rows 0..3001
    n_frames = T // hop  # 3000
    rows_needed = n_frames + 2
    x = x[:, : rows_needed * hop].reshape(B, rows_needed, hop)
    r0 = x[:, :n_frames]
    r1 = x[:, 1 : n_frames + 1]
    r2 = x[:, 2 : n_frames + 2]

    basis = jnp.asarray(_padded_basis())  # [400, 402]
    mel_m = jnp.asarray(_whisper_mel_matrix(n_fft, n_mels, WHISPER_SR))  # [201, n_mels]

    n_blocks = n_frames // FRAME_BLOCK
    row_spec = pl.BlockSpec(
        (1, FRAME_BLOCK, hop), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    log_mel = pl.pallas_call(
        _logmel_kernel,
        grid=(B, n_blocks),
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec((n_fft, 2 * (n_fft // 2 + 1)), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft // 2 + 1, n_mels), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_BLOCK, n_mels),
            lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(r0, r1, r2, basis, mel_m)

    # per-clip dynamic-range floor + affine (fused epilogue)
    clip_max = jnp.max(log_mel, axis=(1, 2), keepdims=True)
    log_mel = (jnp.maximum(log_mel, clip_max - 8.0) + 4.0) / 4.0
    return jnp.transpose(log_mel, (0, 2, 1))
