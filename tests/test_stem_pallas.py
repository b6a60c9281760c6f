"""Fused Pallas stem (ops/wavlm_stem_pallas) vs the XLA conv stem.

CPU runs the kernel in interpret mode — the real-TPU lowering is exercised
by bench.py / the extraction drive. The config under test is the large-style
LAYER-NORM stem (the only one the kernel supports) at 128 channels so the
interpret-mode matmuls stay cheap on the 1-core host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stutter_tpu.models.wavlm import WavLMConfig, conv_feature_encoder, wavlm_feature_lengths
from stutter_tpu.ops.wavlm_stem_pallas import (
    fused_stem_applicable,
    stem_frames_for_samples,
    wavlm_fused_stem,
)

C = 128
CFG = WavLMConfig(
    conv_dim=(C,) * 7,
    conv_bias=True,
    feat_extract_norm="layer",
)


def _make_layers(rng):
    layers = []
    in_dim = 1
    for i, out_dim in enumerate(CFG.conv_dim):
        k = CFG.conv_kernel[i]
        layers.append(
            {
                "w": jnp.asarray(
                    rng.randn(out_dim, in_dim, k).astype(np.float32)
                    * (in_dim * k) ** -0.5
                ),
                "b": jnp.asarray(rng.randn(out_dim).astype(np.float32) * 0.1),
                "norm": {
                    "scale": jnp.asarray(1.0 + 0.1 * rng.randn(out_dim).astype(np.float32)),
                    "bias": jnp.asarray(0.1 * rng.randn(out_dim).astype(np.float32)),
                },
            }
        )
        in_dim = out_dim
    return layers


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_fused_stem_matches_xla_path(rng):
    """Masked fused output tracks the XLA conv stem within bf16 noise, and
    is NO FARTHER from the f32 truth than the XLA bf16 path itself.

    Both paths share the bf16 rounding points (conv -> bf16 + bias, f32 LN
    stats, tanh GELU) but differ in accumulation order, which the 7-layer
    LN chain compounds to ~1.4% nrmse — the same distance each bf16 path
    sits from f32 (measured: fused-vs-f32 0.0121 < xla-bf16-vs-f32 0.0137),
    so the meaningful bound is against the f32 truth, not path-vs-path."""
    L = 32  # two 16-frame blocks per row
    T = L * 320 + 80
    B = 2
    layers = _make_layers(rng)
    wave = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
    lengths = jnp.asarray([T, T - 1600], dtype=jnp.int32)

    assert stem_frames_for_samples(T) == L
    assert fused_stem_applicable(CFG, T, layers)

    ref = conv_feature_encoder(
        {"conv_layers": layers}, wave, CFG, jax.lax.Precision.DEFAULT,
        sample_lengths=lengths, compute_dtype=jnp.bfloat16,
    )
    truth = conv_feature_encoder(
        {"conv_layers": layers}, wave, CFG, jax.lax.Precision.HIGHEST,
        sample_lengths=lengths, compute_dtype=jnp.float32,
    )
    fused = wavlm_fused_stem(wave, layers, interpret=True)
    # caller contract: mask padded frames (the XLA path zeroes them per-layer;
    # for the per-frame layer-norm stem end-masking is equivalent)
    fl = wavlm_feature_lengths(CFG, lengths)
    mask = (jnp.arange(L)[None, :] < fl[:, None])[:, :, None]
    fused = fused * mask.astype(fused.dtype)

    assert fused.shape == ref.shape == (B, L, C)
    r = np.asarray(ref, np.float32)
    f = np.asarray(fused, np.float32)
    t = np.asarray(truth, np.float32)
    # padded frames exactly zero on both sides
    assert np.all(f[1, int(fl[1]):] == 0) and np.all(r[1, int(fl[1]):] == 0)
    nrmse_fused = np.linalg.norm(f - t) / np.linalg.norm(t)
    nrmse_xla = np.linalg.norm(r - t) / np.linalg.norm(t)
    assert nrmse_fused < 1.25 * max(nrmse_xla, 1e-3), (nrmse_fused, nrmse_xla)
    assert np.linalg.norm(f - r) / np.linalg.norm(r) < 0.03
    cos = np.dot(r.ravel(), f.ravel()) / (
        np.linalg.norm(r.ravel()) * np.linalg.norm(f.ravel()) + 1e-12)
    assert cos > 1 - 5e-4, cos


def test_fused_stem_applicability_gates(rng):
    layers = _make_layers(rng)
    T = 16 * 320 + 80
    assert fused_stem_applicable(CFG, T, layers)
    # group-norm (base-config) stem: time-axis stats -> excluded
    assert not fused_stem_applicable(
        WavLMConfig(conv_dim=(C,) * 7, conv_bias=True), T, layers)
    # a length whose frame count isn't 16-aligned or that leaves remainder
    # samples (the bucketer never produces these) -> excluded
    assert not fused_stem_applicable(CFG, T + 320, layers)  # L=17
    assert not fused_stem_applicable(CFG, T + 1, layers)  # dangling sample
    # int8-quantized stem weights -> excluded
    qlayers = [dict(layers[0], w={"q": None, "s": None})] + layers[1:]
    assert not fused_stem_applicable(CFG, T, qlayers)
    # non-standard geometry (tiny config) -> excluded
    assert not fused_stem_applicable(WavLMConfig.tiny(), T, layers)
