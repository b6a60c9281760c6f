"""HF torch checkpoint -> JAX pytree converters.

The reference loads HF checkpoints directly
(``WavLM_embeddings.py:482-483``, ``whisper_embeddings_large.py:430-438``);
this module owns the equivalent capability for the TPU build: a pure
name-mapping from an HF ``state_dict`` (as numpy arrays — from a live torch
module, a ``pytorch_model.bin`` or a safetensors file) onto the stacked-layer
pytrees consumed by ``stutter_tpu.models``.

Conventions converted:
- torch Linear weights [out, in] -> JAX [in, out]
- per-layer params -> stacked [num_layers, ...] arrays for lax.scan
- the pos-conv weight-norm parameterization (weight_g/weight_v, or
  parametrizations.weight.original0/1 on new torch) is folded into the
  effective conv weight (g * v / ||v||, norms over dims (0,1) per kernel
  position — torch weight_norm(dim=2))
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Mapping

import numpy as np

from stutter_tpu.models.wavlm import WavLMConfig
from stutter_tpu.models.whisper import WhisperConfig
from stutter_tpu.utils.logging import get_logger

logger = get_logger("weights")

Array = np.ndarray
StateDict = Mapping[str, Array]


def _np(t) -> Array:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def _dense(sd: StateDict, name: str, bias: bool = True):
    w = _np(sd[f"{name}.weight"]).T.copy()
    if bias:
        return w, _np(sd[f"{name}.bias"]).copy()
    return w


def _ln(sd: StateDict, name: str):
    return {"scale": _np(sd[f"{name}.weight"]).copy(), "bias": _np(sd[f"{name}.bias"]).copy()}


def _stack(layer_dicts: list[dict[str, Array]]) -> dict[str, Array]:
    keys = layer_dicts[0].keys()
    return {k: np.stack([ld[k] for ld in layer_dicts]) for k in keys}


def _pos_conv_effective_weight(sd: StateDict, prefix: str) -> Array:
    """Fold weight-norm into a plain conv weight [out, in/groups, k]."""
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
    return (g * v / norm).astype(v.dtype)


# ---------------------------------------------------------------------------
# WavLM
# ---------------------------------------------------------------------------


def wavlm_config_from_hf(hf_config) -> WavLMConfig:
    return WavLMConfig(
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        conv_dim=tuple(hf_config.conv_dim),
        conv_stride=tuple(hf_config.conv_stride),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_bias=hf_config.conv_bias,
        feat_extract_norm=hf_config.feat_extract_norm,
        do_stable_layer_norm=hf_config.do_stable_layer_norm,
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
        num_buckets=hf_config.num_buckets,
        max_bucket_distance=hf_config.max_bucket_distance,
        layer_norm_eps=hf_config.layer_norm_eps,
    )


def convert_wavlm_state_dict(sd: StateDict, cfg: WavLMConfig) -> dict[str, Any]:
    """HF WavLMModel state_dict -> stutter_tpu wavlm param pytree."""
    sd = {k.removeprefix("wavlm."): v for k, v in sd.items()}

    conv_layers = []
    for i in range(len(cfg.conv_dim)):
        p = f"feature_extractor.conv_layers.{i}"
        layer: dict[str, Any] = {"w": _np(sd[f"{p}.conv.weight"]).copy()}
        layer["b"] = _np(sd[f"{p}.conv.bias"]).copy() if f"{p}.conv.bias" in sd else None
        if f"{p}.layer_norm.weight" in sd:
            layer["norm"] = _ln(sd, f"{p}.layer_norm")
        conv_layers.append(layer)

    proj_w, proj_b = _dense(sd, "feature_projection.projection")

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}"
        q_w, q_b = _dense(sd, f"{p}.attention.q_proj")
        k_w, k_b = _dense(sd, f"{p}.attention.k_proj")
        v_w, v_b = _dense(sd, f"{p}.attention.v_proj")
        o_w, o_b = _dense(sd, f"{p}.attention.out_proj")
        gru_w, gru_b = _dense(sd, f"{p}.attention.gru_rel_pos_linear")
        ff1_w, ff1_b = _dense(sd, f"{p}.feed_forward.intermediate_dense")
        ff2_w, ff2_b = _dense(sd, f"{p}.feed_forward.output_dense")
        ln1 = _ln(sd, f"{p}.layer_norm")
        ln2 = _ln(sd, f"{p}.final_layer_norm")
        layers.append({
            "q_w": q_w, "q_b": q_b, "k_w": k_w, "k_b": k_b,
            "v_w": v_w, "v_b": v_b, "o_w": o_w, "o_b": o_b,
            "gru_w": gru_w, "gru_b": gru_b,
            "gru_const": _np(sd[f"{p}.attention.gru_rel_pos_const"]).reshape(-1).copy(),
            "ff_w1": ff1_w, "ff_b1": ff1_b, "ff_w2": ff2_w, "ff_b2": ff2_b,
            "ln1_s": ln1["scale"], "ln1_b": ln1["bias"],
            "ln2_s": ln2["scale"], "ln2_b": ln2["bias"],
        })

    out: dict[str, Any] = {
        "feature_encoder": {"conv_layers": conv_layers},
        "feature_projection": {
            "ln": _ln(sd, "feature_projection.layer_norm"),
            "w": proj_w,
            "b": proj_b,
        },
        "encoder": {
            "pos_conv": {
                "w": _pos_conv_effective_weight(sd, "encoder.pos_conv_embed.conv"),
                "b": _np(sd["encoder.pos_conv_embed.conv.bias"]).copy(),
            },
            "ln": _ln(sd, "encoder.layer_norm"),
            "rel_attn_embed": _np(sd["encoder.layers.0.attention.rel_attn_embed.weight"]).copy(),
            "layers": _stack(layers),
        },
    }
    if "masked_spec_embed" in sd:  # SpecAugment learned mask vector
        out["masked_spec_embed"] = _np(sd["masked_spec_embed"]).copy()
    return out


# ---------------------------------------------------------------------------
# Whisper
# ---------------------------------------------------------------------------


def whisper_config_from_hf(hf_config) -> WhisperConfig:
    return WhisperConfig(
        d_model=hf_config.d_model,
        encoder_layers=hf_config.encoder_layers,
        encoder_attention_heads=hf_config.encoder_attention_heads,
        decoder_layers=hf_config.decoder_layers,
        decoder_attention_heads=hf_config.decoder_attention_heads,
        ffn_dim=hf_config.encoder_ffn_dim,
        num_mel_bins=hf_config.num_mel_bins,
        max_source_positions=hf_config.max_source_positions,
        max_target_positions=hf_config.max_target_positions,
        vocab_size=hf_config.vocab_size,
    )


def _whisper_attn(sd: StateDict, p: str, prefix: str) -> dict[str, Array]:
    q_w, q_b = _dense(sd, f"{p}.q_proj")
    k_w = _dense(sd, f"{p}.k_proj", bias=False)
    v_w, v_b = _dense(sd, f"{p}.v_proj")
    o_w, o_b = _dense(sd, f"{p}.out_proj")
    return {
        f"{prefix}_q_w": q_w, f"{prefix}_q_b": q_b, f"{prefix}_k_w": k_w,
        f"{prefix}_v_w": v_w, f"{prefix}_v_b": v_b,
        f"{prefix}_o_w": o_w, f"{prefix}_o_b": o_b,
    }


def convert_whisper_state_dict(sd: StateDict, cfg: WhisperConfig) -> dict[str, Any]:
    """HF WhisperModel state_dict -> stutter_tpu whisper param pytree."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        ln1 = _ln(sd, f"{p}.self_attn_layer_norm")
        ln2 = _ln(sd, f"{p}.final_layer_norm")
        fc1_w, fc1_b = _dense(sd, f"{p}.fc1")
        fc2_w, fc2_b = _dense(sd, f"{p}.fc2")
        enc_layers.append({
            **_whisper_attn(sd, f"{p}.self_attn", "attn"),
            "ln1_s": ln1["scale"], "ln1_b": ln1["bias"],
            "ln2_s": ln2["scale"], "ln2_b": ln2["bias"],
            "fc1_w": fc1_w, "fc1_b": fc1_b, "fc2_w": fc2_w, "fc2_b": fc2_b,
        })

    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"decoder.layers.{i}"
        ln1 = _ln(sd, f"{p}.self_attn_layer_norm")
        ln2 = _ln(sd, f"{p}.encoder_attn_layer_norm")
        ln3 = _ln(sd, f"{p}.final_layer_norm")
        fc1_w, fc1_b = _dense(sd, f"{p}.fc1")
        fc2_w, fc2_b = _dense(sd, f"{p}.fc2")
        dec_layers.append({
            **_whisper_attn(sd, f"{p}.self_attn", "attn"),
            **_whisper_attn(sd, f"{p}.encoder_attn", "xattn"),
            "ln1_s": ln1["scale"], "ln1_b": ln1["bias"],
            "ln2_s": ln2["scale"], "ln2_b": ln2["bias"],
            "ln3_s": ln3["scale"], "ln3_b": ln3["bias"],
            "fc1_w": fc1_w, "fc1_b": fc1_b, "fc2_w": fc2_w, "fc2_b": fc2_b,
        })

    enc_ln = _ln(sd, "encoder.layer_norm")
    dec_ln = _ln(sd, "decoder.layer_norm")
    return {
        "encoder": {
            "conv1_w": _np(sd["encoder.conv1.weight"]).copy(),
            "conv1_b": _np(sd["encoder.conv1.bias"]).copy(),
            "conv2_w": _np(sd["encoder.conv2.weight"]).copy(),
            "conv2_b": _np(sd["encoder.conv2.bias"]).copy(),
            "pos_embed": _np(sd["encoder.embed_positions.weight"]).copy(),
            "ln_s": enc_ln["scale"], "ln_b": enc_ln["bias"],
            "layers": _stack(enc_layers),
        },
        "decoder": {
            "embed_tokens": _np(sd["decoder.embed_tokens.weight"]).copy(),
            "pos_embed": _np(sd["decoder.embed_positions.weight"]).copy(),
            "ln_s": dec_ln["scale"], "ln_b": dec_ln["bias"],
            "layers": _stack(dec_layers),
        },
    }


# ---------------------------------------------------------------------------
# High-level loaders (local checkpoint dir or HF hub when network exists)
# ---------------------------------------------------------------------------


def _load_state_dict_from_dir(path: str) -> StateDict:
    """Read a checkpoint directory's weights without torch-loading the model."""
    safetensors = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if safetensors:
        from safetensors.numpy import load_file

        sd: dict[str, Array] = {}
        for f in sorted(safetensors):
            sd.update(load_file(os.path.join(path, f)))
        return sd
    import torch

    # only weight shards — Trainer dirs also hold training_args.bin etc.
    bins = [f for f in os.listdir(path)
            if f.endswith(".bin") and f.startswith(("pytorch_model", "model"))]
    sd = {}
    for f in sorted(bins):
        loaded = torch.load(os.path.join(path, f), map_location="cpu")
        if not hasattr(loaded, "items"):
            logger.warning("skipping non-state-dict file %s", f)
            continue
        sd.update({k: _np(v) for k, v in loaded.items()})
    return sd


def load_wavlm(model_name_or_path: str):
    """Load a WavLM checkpoint into (config, params).

    Accepts a local directory (config.json + weights) or an HF hub name
    (requires network, like the reference's ``from_pretrained`` at
    WavLM_embeddings.py:483).
    """
    from transformers import WavLMConfig as HFWavLMConfig

    if os.path.isdir(model_name_or_path):
        hf_cfg = HFWavLMConfig.from_pretrained(model_name_or_path)
        sd = _load_state_dict_from_dir(model_name_or_path)
    else:
        from transformers import WavLMModel

        model = WavLMModel.from_pretrained(model_name_or_path)
        hf_cfg = model.config
        sd = {k: _np(v) for k, v in model.state_dict().items()}
    cfg = wavlm_config_from_hf(hf_cfg)
    # do_normalize is a per-checkpoint frontend policy; read it from the
    # checkpoint's preprocessor config when available, name heuristic only
    # as a last resort (hub ids like microsoft/wavlm-large encode the family)
    do_norm = None
    pp = os.path.join(model_name_or_path, "preprocessor_config.json")
    if os.path.isfile(pp):
        import json

        do_norm = bool(json.load(open(pp)).get("do_normalize", False))
    else:
        try:
            from transformers import Wav2Vec2FeatureExtractor

            fe = Wav2Vec2FeatureExtractor.from_pretrained(model_name_or_path)
            do_norm = bool(fe.do_normalize)
        except Exception:  # noqa: BLE001 — offline/no preprocessor config
            pass
    if do_norm is None:
        do_norm = "large" in os.path.basename(model_name_or_path).lower()
        logger.warning(
            "no preprocessor config found; inferring do_normalize=%s from the "
            "checkpoint name (wavlm-large family normalizes)", do_norm,
        )
    cfg = dataclasses.replace(cfg, do_normalize=do_norm)
    logger.info("converted WavLM %s: %d layers, hidden %d", model_name_or_path,
                cfg.num_hidden_layers, cfg.hidden_size)
    return cfg, convert_wavlm_state_dict(sd, cfg)


def load_whisper(model_name_or_path: str):
    """Load a Whisper checkpoint into (config, params)."""
    from transformers import WhisperConfig as HFWhisperConfig

    if os.path.isdir(model_name_or_path):
        hf_cfg = HFWhisperConfig.from_pretrained(model_name_or_path)
        sd = _load_state_dict_from_dir(model_name_or_path)
    else:
        from transformers import WhisperModel

        model = WhisperModel.from_pretrained(model_name_or_path)
        hf_cfg = model.config
        sd = {k: _np(v) for k, v in model.state_dict().items()}
    cfg = whisper_config_from_hf(hf_cfg)
    logger.info("converted Whisper %s: %d enc / %d dec layers, d_model %d",
                model_name_or_path, cfg.encoder_layers, cfg.decoder_layers, cfg.d_model)
    return cfg, convert_whisper_state_dict(sd, cfg)
