"""Numerical-fidelity goldens: JAX WavLM vs HF torch WavLMModel.

BASELINE.json north star: embeddings must match HF activations to <=1e-3
cosine distance. Zero egress here, so goldens use randomly-initialized HF
models (same architecture code, same numerics) converted through
``stutter_tpu.weights`` — that exercises the converter AND the forward.
Small configs keep CPU runtime sane; they hit every code path the real
checkpoints use (group vs layer norm stems, post vs pre LN encoders).
"""

import numpy as np
import pytest

from tests.conftest import cosine_distance


def _hf_wavlm(tiny_kwargs):
    import torch
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(**tiny_kwargs)
    model = WavLMModel(hf_cfg).eval()
    return hf_cfg, model


TINY_BASE = dict(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    conv_dim=[32, 32, 32],
    conv_stride=[5, 2, 2],
    conv_kernel=[10, 3, 3],
    num_feat_extract_layers=3,
    conv_bias=False,
    feat_extract_norm="group",
    do_stable_layer_norm=False,
    num_buckets=64,
    max_bucket_distance=100,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    layerdrop=0.0,
    vocab_size=32,
)

TINY_LARGE = dict(
    TINY_BASE,
    conv_bias=True,
    feat_extract_norm="layer",
    do_stable_layer_norm=True,
)


@pytest.mark.parametrize("kwargs", [TINY_BASE, TINY_LARGE], ids=["base-style", "large-style"])
def test_wavlm_forward_matches_hf(rng, kwargs):
    import torch

    from stutter_tpu.models import wavlm_forward
    from stutter_tpu.weights import convert_wavlm_state_dict, wavlm_config_from_hf

    hf_cfg, model = _hf_wavlm(kwargs)
    cfg = wavlm_config_from_hf(hf_cfg)
    params = convert_wavlm_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg
    )

    wave = (rng.randn(2, 3200) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(wave), output_hidden_states=True)
    golden = [h.numpy() for h in out.hidden_states]

    _, all_hidden, _ = wavlm_forward(params, wave, cfg)
    ours = np.asarray(all_hidden)

    assert ours.shape[0] == len(golden) == cfg.num_hidden_layers + 1
    for i, g in enumerate(golden):
        d = cosine_distance(ours[i], g)
        assert d < 1e-3, f"hidden state {i}: cosine distance {d}"
        np.testing.assert_allclose(ours[i], g, atol=2e-3, rtol=1e-3)


def test_wavlm_padded_batch_matches_per_clip(rng):
    """Masked batched extraction == per-clip extraction (the TPU batching win
    must be numerically invisible)."""
    import torch

    from stutter_tpu.models import wavlm_encode, wavlm_feature_lengths
    from stutter_tpu.weights import convert_wavlm_state_dict, wavlm_config_from_hf

    hf_cfg, model = _hf_wavlm(TINY_LARGE)
    cfg = wavlm_config_from_hf(hf_cfg)
    params = convert_wavlm_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg
    )

    lengths = [3200, 2100]
    clips = [(rng.randn(n) * 0.1).astype(np.float32) for n in lengths]
    padded = np.zeros((2, 3200), np.float32)
    for i, c in enumerate(clips):
        padded[i, : len(c)] = c

    n_states = cfg.num_hidden_layers + 1
    layer_indices = (n_states - 1, n_states // 2)
    batched = np.asarray(
        wavlm_encode(params, padded, cfg, layer_indices, sample_lengths=np.array(lengths))
    )  # [S, B, D]

    for i, clip in enumerate(clips):
        single = np.asarray(
            wavlm_encode(params, clip[None], cfg, layer_indices,
                         sample_lengths=np.array([len(clip)]))
        )
        for s in range(len(layer_indices)):
            d = cosine_distance(batched[s, i], single[s, 0])
            assert d < 1e-5, f"clip {i} layer-sel {s}: {d}"

    # also against HF golden (unpadded, batch=1)
    for i, clip in enumerate(clips):
        with torch.no_grad():
            out = model(torch.from_numpy(clip[None]), output_hidden_states=True)
        for s, li in enumerate(layer_indices):
            g = out.hidden_states[li].numpy().mean(axis=1)[0]
            d = cosine_distance(batched[s, i], g)
            assert d < 1e-3, f"clip {i} hf layer {li}: {d}"


def test_feature_lengths_match_hf():
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMModel

    from stutter_tpu.models import wavlm_feature_lengths
    from stutter_tpu.weights import wavlm_config_from_hf

    hf_cfg = HFConfig(**TINY_BASE)
    model = WavLMModel(hf_cfg)
    cfg = wavlm_config_from_hf(hf_cfg)
    import torch

    for n in [400, 1000, 3200, 16000]:
        theirs = int(model._get_feat_extract_output_lengths(torch.tensor(n)))
        ours = int(wavlm_feature_lengths(cfg, np.array(n)))
        assert ours == theirs, (n, ours, theirs)


def test_bucket_matrix_matches_hf():
    import torch

    from transformers.models.wavlm.modeling_wavlm import WavLMAttention

    from stutter_tpu.models.wavlm import relative_position_buckets

    attn = WavLMAttention(embed_dim=64, num_heads=4, num_buckets=64, max_distance=100)
    ctx = torch.arange(37)[:, None]
    mem = torch.arange(37)[None, :]
    theirs = attn._relative_positions_bucket(mem - ctx).numpy()
    ours = relative_position_buckets(37, 64, 100)
    np.testing.assert_array_equal(ours, theirs)
