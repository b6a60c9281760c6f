"""Runtime model-identity verification (reference C5).

Mirrors ``verify_model_loading`` / ``get_model_layer_info``
(``WavLM_embeddings.py:55-85,249-265``; ``whisper_embeddings_large.py:47-76,
200-232``): run a dummy 1 s zero-audio forward, assert the hidden size
matches the checkpoint family (768 base / 1024 wavlm-large / 1280
whisper-large), and log layer count + shapes.
"""

from __future__ import annotations

import numpy as np

from stutter_tpu.models.wavlm import WavLMConfig, wavlm_forward
from stutter_tpu.models.whisper import (
    WhisperConfig,
    whisper_decoder_step,
    whisper_encoder_forward,
)
from stutter_tpu.utils.logging import get_logger

logger = get_logger("models.verify")


def verify_wavlm(params, cfg: WavLMConfig, model_name: str = "") -> int:
    """Dummy forward; returns number of hidden states. Raises on mismatch."""
    dummy = np.zeros((1, 16000), np.float32)  # 1 s of silence
    _, all_hidden, _ = wavlm_forward(params, dummy, cfg)
    n_states, _, frames, hidden = all_hidden.shape
    logger.info("WavLM verified: %d hidden states of [1, %d, %d]", n_states, frames, hidden)
    for i in range(n_states):
        logger.debug("layer %d: shape %s", i, all_hidden[i].shape)
    name = model_name.lower()
    if "large" in name and hidden != 1024:
        raise ValueError(f"requested large model but hidden size is {hidden}, not 1024")
    if ("base" in name and "large" not in name) and hidden != 768:
        raise ValueError(f"requested base model but hidden size is {hidden}, not 768")
    if hidden != cfg.hidden_size:
        raise ValueError(f"hidden size {hidden} != config {cfg.hidden_size}")
    return n_states


def verify_whisper(params, cfg: WhisperConfig, model_name: str = "") -> tuple[int, int]:
    """Dummy mel forward; returns (encoder states, decoder states)."""
    dummy = np.zeros((1, cfg.num_mel_bins, 3000), np.float32)
    enc_last, enc_states = whisper_encoder_forward(params, dummy, cfg)
    _, dec_states = whisper_decoder_step(params, enc_last, 0, cfg)
    hidden = enc_last.shape[-1]
    logger.info(
        "Whisper verified: %d encoder / %d decoder hidden states, d_model %d",
        enc_states.shape[0], dec_states.shape[0], hidden,
    )
    if "large" in model_name.lower() and hidden != 1280:
        raise ValueError(f"requested large model but d_model is {hidden}, not 1280")
    if hidden != cfg.d_model:
        raise ValueError(f"d_model {hidden} != config {cfg.d_model}")
    return int(enc_states.shape[0]), int(dec_states.shape[0])
