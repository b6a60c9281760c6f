"""Full-architecture fidelity: real wavlm-base dims vs HF torch (BASELINE
config[0]: 'WavLM-Base mean-pooled embeddings on 3s clips, CPU-runnable').

The tiny-config goldens cover every code path; this covers the real base
geometry (7-conv stem, 12 layers, 768 hidden, 320 buckets / 800 distance)
end-to-end at 1 s, including the reference's layer selection + mean pooling.
"""

import numpy as np


def test_wavlm_base_full_dims_fidelity(rng):
    import torch
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMModel

    from stutter_tpu.models import wavlm_encode
    from stutter_tpu.weights import convert_wavlm_state_dict, wavlm_config_from_hf
    from tests.conftest import cosine_distance

    torch.manual_seed(0)
    hf_cfg = HFConfig(layerdrop=0.0)  # true wavlm-base architecture
    model = WavLMModel(hf_cfg).eval()
    cfg = wavlm_config_from_hf(hf_cfg)
    params = convert_wavlm_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg
    )

    wave = (rng.randn(1, 16000) * 0.1).astype(np.float32)  # 1 s clip
    n_states = cfg.num_hidden_layers + 1  # 13
    layer_indices = (n_states - 1, n_states - 2, n_states - 3, n_states // 2)

    with torch.no_grad():
        out = model(torch.from_numpy(wave), output_hidden_states=True)

    pooled = np.asarray(
        wavlm_encode(params, wave, cfg, layer_indices,
                     sample_lengths=np.array([16000]))
    )  # [4, 1, 768]
    assert pooled.shape == (4, 1, 768)

    for s, li in enumerate(layer_indices):
        golden = out.hidden_states[li].numpy().mean(axis=1)[0]
        d = cosine_distance(pooled[s, 0], golden)
        assert d < 1e-3, f"layer {li}: cosine distance {d}"
