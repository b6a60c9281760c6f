"""Retest whisper-large encoder batch sizes under auto-block flash attention.

The round-1 negative result "batch 16 slower than 8" was measured with
block-512 flash attention; the single-1536-block kernel changes the VMEM
and grid picture, so retest B in {8, 12, 16}. Prints one JSON line with
audio-s/s per batch size.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WhisperConfig, init_whisper_params
    from stutter_tpu.models.whisper import whisper_encoder_forward
    from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WhisperConfig.large()
    params = cast_params_for_preset(init_whisper_params(jax.random.key(0), cfg), "fast")
    turbo = cast_params_for_preset(params, "turbo")
    fast = dict(precision=jax.lax.Precision.DEFAULT, activation_dtype=jnp.bfloat16)

    @jax.jit
    def enc_only(p, waves):
        mel = whisper_log_mel_pallas(waves)
        _, states = whisper_encoder_forward(
            p, mel, cfg, **fast,
            hidden_reducer=lambda h: jnp.mean(h.astype(jnp.float32), axis=1),
        )
        return jnp.sum(states)

    out = {}
    rs = np.random.RandomState(0)
    for batch in (8, 16):
        waves = jax.device_put((rs.randn(batch, 480000) * 0.1).astype(np.float32))
        for name, p in (("fast", params), ("turbo", turbo)):
            t = chain_time(enc_only, (p, waves), iters=5)
            out[f"{name}_b{batch}_audio_s_per_s"] = round(batch * 30.0 / t, 1)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
