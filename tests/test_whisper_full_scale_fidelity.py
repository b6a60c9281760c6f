"""Full-geometry Whisper fidelity vs HF torch (VERDICT r1 weak #3).

Two gaps the tiny-width goldens (tests/test_whisper_fidelity.py) left open:

1. the real whisper-tiny geometry (d_model=384, 4+4 layers, 6 heads,
   ffn 1536 — openai/whisper-tiny per ``modeling_whisper.py``) END-TO-END:
   raw wave -> our fused log-mel -> encoder -> token-id-0 decoder step,
   against HF's WhisperFeatureExtractor + WhisperModel, including the
   reference's pooled layer taps (``whisper_embeddings_large.py:272-297``);
2. the 128-mel large-v3 *encoder* path from a raw wave (the v3 frontend was
   golden-tested alone in test_whisper_v3_mel.py, but never through a model).

CPU-feasible: whisper-tiny at 1500 positions is ~8 M params.
"""

import numpy as np
import pytest

from tests.conftest import cosine_distance

TINY_OFFICIAL = dict(
    d_model=384,
    encoder_layers=4,
    decoder_layers=4,
    encoder_attention_heads=6,
    decoder_attention_heads=6,
    encoder_ffn_dim=1536,
    decoder_ffn_dim=1536,
    num_mel_bins=80,
    max_source_positions=1500,
    max_target_positions=448,
    vocab_size=2048,  # random-init: embedding rows beyond token 0 are unused
    pad_token_id=0,
    bos_token_id=1,
    eos_token_id=2,
    decoder_start_token_id=3,
)


@pytest.fixture(scope="module")
def tiny_official_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel

    from stutter_tpu.weights import convert_whisper_state_dict, whisper_config_from_hf

    torch.manual_seed(0)
    hf_cfg = HFConfig(**TINY_OFFICIAL)
    model = WhisperModel(hf_cfg).eval()
    cfg = whisper_config_from_hf(hf_cfg)
    params = convert_whisper_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg
    )
    assert cfg.d_model == 384 and cfg.encoder_layers == 4  # real tiny geometry
    return model, cfg, params


def test_whisper_tiny_official_end_to_end(rng, tiny_official_pair):
    """wave -> mel -> encoder -> 1-step decoder at real whisper-tiny dims,
    our full path vs HF's full path, every hidden state <=1e-3 cosine."""
    import torch
    from transformers import WhisperFeatureExtractor

    from stutter_tpu.frontend import whisper_features
    from stutter_tpu.models import whisper_decoder_step, whisper_encoder_forward

    model, cfg, params = tiny_official_pair
    wave = (rng.randn(48000) * 0.2).astype(np.float32)  # 3 s, padded to 30 s

    fe = WhisperFeatureExtractor(feature_size=80)
    mel_hf = fe(wave, sampling_rate=16000, return_tensors="pt").input_features
    with torch.no_grad():
        enc = model.encoder(mel_hf, output_hidden_states=True)
        dec = model.decoder(
            input_ids=torch.zeros((1, 1), dtype=torch.long),
            encoder_hidden_states=enc.last_hidden_state,
            output_hidden_states=True,
        )
    enc_golden = [h.numpy() for h in enc.hidden_states]
    dec_golden = [h.numpy() for h in dec.hidden_states]

    mel = whisper_features(wave[None], n_mels=cfg.num_mel_bins)
    enc_last, enc_hidden = whisper_encoder_forward(params, mel, cfg)
    _, dec_hidden = whisper_decoder_step(params, enc_last, token_id=0, cfg=cfg)
    enc_hidden, dec_hidden = np.asarray(enc_hidden), np.asarray(dec_hidden)

    assert enc_hidden.shape == (5, 1, 1500, 384)
    for i, g in enumerate(enc_golden):
        d = cosine_distance(enc_hidden[i], g)
        assert d < 1e-3, f"encoder hidden {i}: {d}"
    for i, g in enumerate(dec_golden):
        d = cosine_distance(dec_hidden[i], g)
        assert d < 1e-3, f"decoder hidden {i}: {d}"

    # the reference's embedding taps: last-3 encoder states mean-pooled over
    # all 1500 padded positions + last-3 decoder single-token squeezes
    for li in (4, 3, 2):
        d = cosine_distance(
            enc_hidden[li, 0].mean(axis=0), enc_golden[li][0].mean(axis=0)
        )
        assert d < 1e-3, f"pooled encoder tap {li}: {d}"
        d = cosine_distance(dec_hidden[li, 0, 0], dec_golden[li][0, 0])
        assert d < 1e-3, f"decoder tap {li}: {d}"


def test_whisper_v3_geometry_encoder_from_wave(rng):
    """128-mel (large-v3 frontend geometry) wave -> mel -> encoder vs HF."""
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperFeatureExtractor, WhisperModel

    from stutter_tpu.frontend import whisper_features
    from stutter_tpu.models import whisper_encoder_forward
    from stutter_tpu.weights import convert_whisper_state_dict, whisper_config_from_hf

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        num_mel_bins=128, max_source_positions=1500, vocab_size=128,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
    )
    model = WhisperModel(hf_cfg).eval()
    cfg = whisper_config_from_hf(hf_cfg)
    params = convert_whisper_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg
    )
    assert cfg.num_mel_bins == 128

    wave = (rng.randn(32000) * 0.2).astype(np.float32)
    fe = WhisperFeatureExtractor(feature_size=128)
    mel_hf = fe(wave, sampling_rate=16000, return_tensors="pt").input_features
    with torch.no_grad():
        enc = model.encoder(mel_hf, output_hidden_states=True)
    golden = [h.numpy() for h in enc.hidden_states]

    mel = whisper_features(wave[None], n_mels=128)
    _, enc_hidden = whisper_encoder_forward(params, mel, cfg)
    enc_hidden = np.asarray(enc_hidden)
    for i, g in enumerate(golden):
        d = cosine_distance(enc_hidden[i], g)
        assert d < 1e-3, f"128-mel encoder hidden {i}: {d}"
