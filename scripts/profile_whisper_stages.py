"""Whisper-large encoder stage profile: mel kernel, conv stem, scan."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stutter_tpu.utils.benchmarking import chain_time


def main():
    import jax
    import jax.numpy as jnp

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WhisperConfig, init_whisper_params
    from stutter_tpu.models.whisper import _attention, _ffn, _layer_norm, whisper_encoder_forward
    from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas

    cfg = WhisperConfig.large()
    params = cast_params_for_preset(init_whisper_params(jax.random.key(0), cfg), "fast")
    B = int(os.environ.get("PROFILE_BATCH", "8"))
    rs = np.random.RandomState(0)
    waves = jax.device_put((rs.randn(B, 480000) * 0.1).astype(np.float32))
    enc = params["encoder"]

    @jax.jit
    def mel_only(w):
        return jnp.sum(whisper_log_mel_pallas(w).astype(jnp.float32))

    @jax.jit
    def full(p, w):
        mel = whisper_log_mel_pallas(w)
        _, states = whisper_encoder_forward(
            p, mel, cfg, jax.lax.Precision.DEFAULT, jnp.bfloat16,
            hidden_reducer=lambda h: jnp.mean(h.astype(jnp.float32), axis=1),
        )
        return jnp.sum(states)

    # scan-only from premade hidden states
    hidden = jax.device_put(jnp.asarray(
        (rs.randn(B, cfg.max_source_positions, cfg.d_model) * 0.05).astype(np.float32),
        jnp.bfloat16))

    @jax.jit
    def scan_only(p, h):
        e = p["encoder"]
        eps = cfg.layer_norm_eps
        nh = cfg.encoder_attention_heads

        def body(carry, layer):
            hh = _layer_norm(carry, layer["ln1_s"], layer["ln1_b"], eps)
            new = carry + _attention(hh, hh, layer, "attn", nh, jax.lax.Precision.DEFAULT)
            hh = _layer_norm(new, layer["ln2_s"], layer["ln2_b"], eps)
            out = (new + _ffn(hh, layer, jax.lax.Precision.DEFAULT)).astype(carry.dtype)
            return out, jnp.mean(carry.astype(jnp.float32), axis=1)

        last, states = jax.lax.scan(body, h, e["layers"])
        return jnp.sum(states) + jnp.sum(last.astype(jnp.float32))

    t_mel = chain_time(mel_only, (waves,), iters=10)
    t_full = chain_time(full, (params, waves), iters=6)
    t_scan = chain_time(scan_only, (params, hidden), iters=6)

    flops = 2 * (4 * cfg.d_model**2 + 2 * 1500 * cfg.d_model
                 + 2 * cfg.d_model * cfg.ffn_dim) * 1500 * cfg.encoder_layers * B
    print(json.dumps({
        "batch": B,
        "mel_ms": round(t_mel * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "scan_ms": round(t_scan * 1e3, 2),
        "stem_other_ms": round((t_full - t_mel - t_scan) * 1e3, 2),
        "audio_s_per_s": round(B * 30.0 / t_full, 1),
        "mfu_scan": round(flops / t_scan / 197e12, 3),
    }))


if __name__ == "__main__":
    main()
