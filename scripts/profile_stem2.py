"""Cumulative-prefix stem profile: time stem truncated after conv i, inside
one jit program each — differences give per-stage cost in real context."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=15):
    acc = fn(*args)
    float(acc)
    t0 = time.perf_counter()
    acc = fn(*args)
    for _ in range(iters - 1):
        acc = acc + fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.models import WavLMConfig, init_wavlm_params
    from stutter_tpu.models.wavlm import conv_feature_encoder

    cfg = WavLMConfig.large()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "fast")
    B, T = 128, 51280
    rs = np.random.RandomState(0)
    waves = jax.device_put((rs.randn(B, T) * 0.1).astype(np.float32))
    lengths = jax.device_put(np.full((B,), T, np.int32))

    prev = 0.0
    for n in range(1, len(cfg.conv_dim) + 1):
        sub = dataclasses.replace(
            cfg,
            conv_dim=cfg.conv_dim[:n],
            conv_stride=cfg.conv_stride[:n],
            conv_kernel=cfg.conv_kernel[:n],
        )
        sub_params = {"conv_layers": params["feature_encoder"]["conv_layers"][:n]}

        @jax.jit
        def prefix(p, w, l, sub=sub):
            feats = conv_feature_encoder(p, w, sub, jax.lax.Precision.DEFAULT,
                                         sample_lengths=l, compute_dtype=jnp.bfloat16)
            return jnp.sum(feats.astype(jnp.float32))

        t = timeit(prefix, (sub_params, waves, lengths)) * 1e3
        print(json.dumps({"through_conv": n - 1, "cum_ms": round(t, 2),
                          "delta_ms": round(t - prev, 2)}), flush=True)
        prev = t


if __name__ == "__main__":
    main()
