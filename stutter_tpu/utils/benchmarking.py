"""Shared measurement helpers for bench.py and scripts/profile_*.py.

The chained-accumulator timer is the ONLY reliable way to time through the
tunneled TPU (CLAUDE.md): ``jax.block_until_ready`` sometimes returns before
execution, and per-call host syncs serialize the pipeline — so a scalar is
chained across N dispatches and fetched once.

The FLOP model (MACs x 2) mirrors the architecture exactly so MFU numbers in
bench.py and the profiling scripts cannot silently diverge.
"""

from __future__ import annotations

import time

import numpy as np

# v5e bf16 peak (MXU), per chip
V5E_BF16_PEAK = 197e12


def chain_time(fn, args, iters: int = 12) -> float:
    """Seconds per call: warm up once, then chain a scalar across iters."""
    acc = fn(*args)
    float(acc)  # forces compile + first execution outside the timed region
    t0 = time.perf_counter()
    acc = fn(*args)
    for _ in range(iters - 1):
        acc = acc + fn(*args)
    total = float(acc)
    assert np.isfinite(total)
    return (time.perf_counter() - t0) / iters


def whisper_encoder_flops(cfg, batch: int) -> int:
    """FLOPs (MACs x 2) for one whisper encoder forward over 30 s inputs.

    Stem: Conv1d(mel->D, k3, 3000 frames) + Conv1d(D->D, k3, s2, 1500
    frames); encoder per token per layer: qkvo 4D^2 + attention
    scores/values 2LD + ffn 2DF MACs (modeling_whisper.py:608-609,372-432).
    """
    D, F, L = cfg.d_model, cfg.ffn_dim, cfg.max_source_positions
    stem = 2 * L * 3 * cfg.num_mel_bins * D + L * 3 * D * D
    enc = (4 * D * D + 2 * L * D + 2 * D * F) * L * cfg.encoder_layers
    return 2 * (stem + enc) * batch


def wavlm_flops(cfg, batch: int, n_samples: int) -> tuple[int, int, int]:
    """(encoder_flops, stem_flops, n_frames) for one batch, MACs x 2.

    Encoder per token per layer: qkvo 4D^2 + attention scores/values 2LD +
    ffn 2*D*F MACs; stem: the conv chain's L_i * C_out * C_in * k.
    """
    from stutter_tpu.models.wavlm import wavlm_feature_lengths

    L = int(wavlm_feature_lengths(cfg, n_samples))
    D, F = cfg.hidden_size, cfg.intermediate_size
    enc = 2 * (4 * D * D + 2 * L * D + 2 * D * F) * L * cfg.num_hidden_layers * batch
    lens, cin, stem_macs = n_samples, 1, 0
    for cout, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        lens = (lens - k) // s + 1
        stem_macs += lens * cout * cin * k
        cin = cout
    return enc, 2 * stem_macs * batch, L
