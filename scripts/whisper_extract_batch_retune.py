"""Retune the whisper-large EXTRACT batch size after the decoder fold.

Batch 8 was chosen when the decoder step cost ~14% (separate dispatch,
full cross-K/V projections). The single-query reassociation collapsed that
to ~5.5% and changed the program's HBM/VMEM picture, so retest the full
extract program (mel -> encoder in-scan pool -> folded 1-token decoder)
at B in {8, 12, 16} under turbo, interleaved loops.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WhisperConfig, init_whisper_params
    from stutter_tpu.models.whisper import (
        whisper_decoder_step, whisper_encoder_forward,
    )
    from stutter_tpu.ops.logmel_pallas import whisper_log_mel_pallas
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WhisperConfig.large()
    params = cast_params_for_preset(
        cast_params_for_preset(init_whisper_params(jax.random.key(0), cfg),
                               "fast"), "turbo")
    sel = jnp.asarray((cfg.encoder_layers, cfg.encoder_layers - 1,
                       cfg.encoder_layers - 2))
    opts = dict(precision=jax.lax.Precision.DEFAULT,
                activation_dtype=jnp.bfloat16)

    @jax.jit
    def extract(p, waves):
        mel = whisper_log_mel_pallas(waves)
        enc_last, pooled = whisper_encoder_forward(
            p, mel, cfg, **opts,
            hidden_reducer=lambda h: jnp.mean(h.astype(jnp.float32), axis=1),
        )
        _, dec = whisper_decoder_step(p, enc_last, 0, cfg, **opts)
        return jnp.sum(pooled[sel]) + jnp.sum(dec[sel].astype(jnp.float32))

    rs = np.random.RandomState(0)
    waves = {b: jax.device_put((rs.randn(b, 480000) * 0.1).astype(np.float32))
             for b in (8, 12, 16)}
    for b, w in waves.items():
        float(extract(params, w))  # compile all first (interleaving)
        print(json.dumps({"compiled": b}), flush=True)

    out = {"metric": "whisper_extract_batch_retune", "preset": "turbo"}
    times: dict = {b: [] for b in waves}
    for _ in range(4):
        for b, w in waves.items():
            times[b].append(chain_time(extract, (params, w), iters=5))
    for b in waves:
        t = min(times[b])
        out[f"b{b}"] = round(b * 30.0 / t, 2)
        out[f"b{b}_loop_ms"] = [round(x * 1e3, 1) for x in times[b]]
    out["winner"] = max(waves, key=lambda b: out[f"b{b}"])
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts",
            "whisper_extract_batch_retune_r4.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
