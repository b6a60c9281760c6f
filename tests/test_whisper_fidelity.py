"""Numerical-fidelity goldens: JAX Whisper vs HF torch WhisperModel.

Covers the two surfaces the reference uses (whisper_embeddings_large.py:
250-262): encoder forward with all hidden states, and the single decoder step
with token id 0 (the reference's deliberate quirk — NOT the real SOT token).
"""

import numpy as np
import pytest

from tests.conftest import cosine_distance

TINY = dict(
    d_model=64,
    encoder_layers=3,
    decoder_layers=3,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    num_mel_bins=80,
    max_source_positions=1500,
    max_target_positions=448,
    vocab_size=128,
    pad_token_id=0,
    bos_token_id=1,
    eos_token_id=2,
    decoder_start_token_id=3,
)


@pytest.fixture(scope="module")
def whisper_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel

    from stutter_tpu.weights import convert_whisper_state_dict, whisper_config_from_hf

    torch.manual_seed(0)
    hf_cfg = HFConfig(**TINY)
    model = WhisperModel(hf_cfg).eval()
    cfg = whisper_config_from_hf(hf_cfg)
    params = convert_whisper_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg
    )
    return model, cfg, params


def test_whisper_encoder_matches_hf(rng, whisper_pair):
    import torch

    from stutter_tpu.models import whisper_encoder_forward

    model, cfg, params = whisper_pair
    mel = (rng.randn(2, 80, 3000) * 0.5).astype(np.float32)
    with torch.no_grad():
        out = model.encoder(torch.from_numpy(mel), output_hidden_states=True)
    golden = [h.numpy() for h in out.hidden_states]

    _, all_hidden = whisper_encoder_forward(params, mel, cfg)
    ours = np.asarray(all_hidden)

    assert ours.shape[0] == len(golden) == cfg.encoder_layers + 1
    for i, g in enumerate(golden):
        d = cosine_distance(ours[i], g)
        assert d < 1e-3, f"encoder hidden {i}: {d}"
        np.testing.assert_allclose(ours[i], g, atol=2e-3, rtol=1e-3)


def test_gemm_stem_matches_conv_stem(rng, whisper_pair):
    """The shifted-GEMM stem (gemm_stem=True) must equal the XLA-conv stem
    up to matmul reassociation — checked on every hidden state so the
    difference can't hide behind the encoder stack."""
    from stutter_tpu.models import whisper_encoder_forward

    _, cfg, params = whisper_pair
    mel = (rng.randn(2, 80, 3000) * 0.5).astype(np.float32)
    _, conv_h = whisper_encoder_forward(params, mel, cfg)
    _, gemm_h = whisper_encoder_forward(params, mel, cfg, gemm_stem=True)
    np.testing.assert_allclose(np.asarray(gemm_h), np.asarray(conv_h),
                               atol=2e-5, rtol=1e-5)


def test_whisper_decoder_step_matches_hf(rng, whisper_pair):
    import torch

    from stutter_tpu.models import whisper_decoder_step, whisper_encoder_forward

    model, cfg, params = whisper_pair
    mel = (rng.randn(1, 80, 3000) * 0.5).astype(np.float32)
    with torch.no_grad():
        enc = model.encoder(torch.from_numpy(mel))
        dec = model.decoder(
            input_ids=torch.zeros((1, 1), dtype=torch.long),
            encoder_hidden_states=enc.last_hidden_state,
            output_hidden_states=True,
        )
    golden = [h.numpy() for h in dec.hidden_states]

    enc_last, _ = whisper_encoder_forward(params, mel, cfg)
    _, all_hidden = whisper_decoder_step(params, enc_last, token_id=0, cfg=cfg)
    ours = np.asarray(all_hidden)

    assert ours.shape[0] == len(golden) == cfg.decoder_layers + 1
    for i, g in enumerate(golden):
        d = cosine_distance(ours[i], g)
        assert d < 1e-3, f"decoder hidden {i}: {d}"


def test_sinusoids_match_hf_init():
    from transformers.models.whisper.modeling_whisper import sinusoids as hf_sinusoids

    from stutter_tpu.models.whisper import sinusoids

    ours = sinusoids(1500, 64)
    theirs = hf_sinusoids(1500, 64).numpy()
    # torch computes sin/cos in float32; argument reduction at position ~1500
    # differs from numpy float64 by up to ~1e-4.
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_cross_attention_1q_matches_general_attention():
    """The reassociated single-query cross-attention == the einsum MHA.

    whisper_decoder_step folds the K/V projections into the query side
    (models/whisper.py:_cross_attention_1q) — mathematically identical up to
    matmul reassociation; pin the equivalence directly against the general
    _attention path on the same params (f32/HIGHEST: tight; bf16: loose)."""
    import jax
    import jax.numpy as jnp

    from stutter_tpu.models.whisper import _attention, _cross_attention_1q

    rng = np.random.RandomState(3)
    B, L, D, H = 3, 96, 64, 4
    p = {}
    for n in ("q", "k", "v", "o"):
        p[f"xattn_{n}_w"] = jnp.asarray(rng.randn(D, D).astype(np.float32) * D**-0.5)
        p[f"xattn_{n}_b"] = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)

    q_in = jnp.asarray((rng.randn(B, 1, D) * 0.5).astype(np.float32))
    enc = jnp.asarray((rng.randn(B, L, D) * 0.5).astype(np.float32))

    hi = jax.lax.Precision.HIGHEST
    ref = np.asarray(_attention(q_in, enc, p, "xattn", H, hi))
    got = np.asarray(_cross_attention_1q(q_in, enc, p, H, hi))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)

    de = jax.lax.Precision.DEFAULT
    ref16 = np.asarray(
        _attention(q_in.astype(jnp.bfloat16), enc.astype(jnp.bfloat16),
                   p, "xattn", H, de), np.float32)
    got16 = np.asarray(
        _cross_attention_1q(q_in.astype(jnp.bfloat16), enc.astype(jnp.bfloat16),
                            p, H, de), np.float32)
    assert cosine_distance(got16, ref16) < 1e-3
