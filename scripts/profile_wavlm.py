"""Per-stage WavLM-Large profile on the real TPU (VERDICT r1 next #3).

Times the full extraction forward and its stages separately (conv stem,
frontend prep, encoder) with the tunnel-safe chained-accumulator method
(CLAUDE.md): chain a scalar through N dispatches, fetch once.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from stutter_tpu.utils.benchmarking import V5E_BF16_PEAK, chain_time as timeit, wavlm_flops


def main():
    import jax
    import jax.numpy as jnp

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    from stutter_tpu.extract.batcher import BucketBatcher
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.frontend.wavlm_frontend import wavlm_prepare_batch
    from stutter_tpu.models import WavLMConfig, init_wavlm_params, wavlm_encode
    from stutter_tpu.models.wavlm import (
        conv_feature_encoder,
        wavlm_encoder,
        wavlm_feature_lengths,
    )

    cfg = WavLMConfig.large()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "fast")
    n_states = cfg.num_hidden_layers + 1
    layer_indices = (n_states - 1, n_states - 2, n_states - 3, n_states // 2)

    batch = int(os.environ.get("PROFILE_BATCH", "128"))
    batcher = BucketBatcher(frame_align=(*cfg.stem_geometry, 16))
    n_samples = batcher.bucket_samples(3.0)
    rs = np.random.RandomState(0)
    waves = jax.device_put((rs.randn(batch, n_samples) * 0.1).astype(np.float32))
    lengths = jax.device_put(np.full((batch,), n_samples, np.int32))
    L = int(wavlm_feature_lengths(cfg, n_samples))
    print(f"batch={batch} samples={n_samples} frames={L}", flush=True)

    precision = jax.lax.Precision.DEFAULT
    adt = jnp.bfloat16

    @jax.jit
    def full(p, w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        out = wavlm_encode(p, x, cfg, layer_indices, sample_lengths=l,
                           precision=precision, activation_dtype=adt)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def stem_only(p, w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        feats = conv_feature_encoder(p["feature_encoder"], x, cfg, precision,
                                     sample_lengths=l, compute_dtype=adt)
        return jnp.sum(feats.astype(jnp.float32))

    # encoder from pre-made hidden states (excludes stem+projection)
    hidden = jax.device_put(
        jnp.asarray((rs.randn(batch, L, cfg.hidden_size) * 0.05).astype(np.float32),
                    jnp.bfloat16)
    )
    frame_lengths = jax.device_put(np.full((batch,), L, np.int32))

    @jax.jit
    def encoder_only(p, h, fl):
        _, pooled = wavlm_encoder(
            p["encoder"], h, fl, cfg, precision,
            reducer=lambda x: jnp.mean(x.astype(jnp.float32), axis=1),
        )
        return jnp.sum(pooled)

    # fidelity: fast preset vs f32/HIGHEST on a small slice
    params_f32 = init_wavlm_params(jax.random.key(0), cfg)

    @jax.jit
    def exact(p, w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        return wavlm_encode(p, x, cfg, layer_indices, sample_lengths=l,
                            precision=jax.lax.Precision.HIGHEST,
                            activation_dtype=jnp.float32)

    @jax.jit
    def fast_emb(p, w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        return wavlm_encode(p, x, cfg, layer_indices, sample_lengths=l,
                            precision=precision, activation_dtype=adt)

    sw, sl = waves[:4], lengths[:4]
    a = np.asarray(fast_emb(params, sw, sl), np.float64)
    b = np.asarray(exact(params_f32, sw, sl), np.float64)
    cos = [1.0 - np.dot(a[s, i], b[s, i]) / (np.linalg.norm(a[s, i]) * np.linalg.norm(b[s, i]))
           for s in range(a.shape[0]) for i in range(a.shape[1])]
    fidelity = float(np.max(cos))

    t_full = timeit(full, (params, waves, lengths))
    t_stem = timeit(stem_only, (params, waves, lengths))
    t_enc = timeit(encoder_only, (params, hidden, frame_lengths))

    audio_s = batch * n_samples / 16000
    enc_flops, stem_flops, _ = wavlm_flops(cfg, batch, n_samples)
    peak = V5E_BF16_PEAK
    out = {
        "full_ms": round(t_full * 1e3, 2),
        "stem_ms": round(t_stem * 1e3, 2),
        "encoder_ms": round(t_enc * 1e3, 2),
        "other_ms": round((t_full - t_stem - t_enc) * 1e3, 2),
        "audio_s_per_s": round(audio_s / t_full, 1),
        "enc_tflops": round(enc_flops / 1e12, 2),
        "stem_tflops": round(stem_flops / 1e12, 2),
        "mfu_full": round((enc_flops + stem_flops) / t_full / peak, 3),
        "mfu_encoder": round(enc_flops / t_enc / peak, 3),
        "mfu_stem": round(stem_flops / t_stem / peak, 3),
        "fidelity_fast_vs_f32": fidelity,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
