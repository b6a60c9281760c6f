"""Whisper-large encoder throughput + fast-vs-f32 fidelity on the real TPU."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from stutter_tpu.utils.benchmarking import chain_time as timeit


def main():
    import jax
    import jax.numpy as jnp

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WhisperConfig, init_whisper_params
    from stutter_tpu.models.whisper import whisper_encoder_forward
    from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas

    cfg = WhisperConfig.large()
    params_f32 = init_whisper_params(jax.random.key(0), cfg)
    params = cast_params_for_preset(params_f32, "fast")
    sel = jnp.asarray((cfg.encoder_layers, cfg.encoder_layers - 1, cfg.encoder_layers - 2))

    def make(p_prec, adt):
        def fn(p, waves):
            mel = whisper_log_mel_pallas(waves)
            _, states = whisper_encoder_forward(p, mel, cfg, p_prec, adt)
            return jnp.mean(states[sel].astype(jnp.float32), axis=2)  # [3, B, D]
        return jax.jit(fn)

    fast = make(jax.lax.Precision.DEFAULT, jnp.bfloat16)
    exact = make(jax.lax.Precision.HIGHEST, jnp.float32)

    rs = np.random.RandomState(0)
    batch = int(os.environ.get("PROFILE_BATCH", "8"))
    waves = jax.device_put((rs.randn(batch, 480000) * 0.1).astype(np.float32))

    # fidelity on 2 clips
    a = np.asarray(fast(params, waves[:2]), np.float64)
    b = np.asarray(exact(params_f32, waves[:2]), np.float64)
    cos = [1.0 - np.dot(a[s, i], b[s, i]) / (np.linalg.norm(a[s, i]) * np.linalg.norm(b[s, i]))
           for s in range(3) for i in range(2)]
    fidelity = float(np.max(cos))

    def fn_scalar(p, w):
        mel = whisper_log_mel_pallas(w)
        _, states = whisper_encoder_forward(p, mel, cfg, jax.lax.Precision.DEFAULT,
                                            jnp.bfloat16)
        return jnp.sum(jnp.mean(states[sel].astype(jnp.float32), axis=2))

    t = timeit(jax.jit(fn_scalar), (params, waves))
    print(json.dumps({
        "batch": batch,
        "step_ms": round(t * 1e3, 2),
        "audio_s_per_s": round(batch * 30.0 / t, 1),
        "fidelity_fast_vs_f32": fidelity,
    }))


if __name__ == "__main__":
    main()
