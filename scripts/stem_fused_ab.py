"""A/B the fused Pallas stem (ops/wavlm_stem_pallas) vs the XLA conv stem on
the real TPU: stem-only time, end-to-end extraction throughput, and pooled
embedding fidelity vs the f32 path. Interleaved measurement loops (compile
everything first) per the tunnel-noise rule in CLAUDE.md."""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--clip_s", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--preset", default="turbo", choices=["fast", "turbo"])
    args = ap.parse_args()

    from stutter_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()

    from stutter_tpu.extract.batcher import BucketBatcher
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.frontend.wavlm_frontend import wavlm_prepare_batch
    from stutter_tpu.models import WavLMConfig, init_wavlm_params, wavlm_encode
    from stutter_tpu.models.wavlm import conv_feature_encoder
    from stutter_tpu.ops.wavlm_stem_pallas import wavlm_fused_stem
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WavLMConfig.large()
    params = init_wavlm_params(jax.random.key(0), cfg)
    bench_params = cast_params_for_preset(params, args.preset)
    n_states = cfg.num_hidden_layers + 1
    layer_indices = (n_states - 1, n_states - 2, n_states - 3, n_states // 2)

    batcher = BucketBatcher(frame_align=(*cfg.stem_geometry, 16))
    n_samples = batcher.bucket_samples(args.clip_s)
    sr = 16000
    rs = np.random.RandomState(0)
    waves_d = jax.device_put((rs.randn(args.batch, n_samples) * 0.1).astype(np.float32))
    lengths_d = jax.device_put(np.full((args.batch,), n_samples, np.int32))

    @jax.jit
    def stem_xla(p, w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        feats = conv_feature_encoder(p["feature_encoder"], x, cfg,
                                     jax.lax.Precision.DEFAULT,
                                     sample_lengths=l, compute_dtype=jnp.bfloat16)
        return jnp.sum(feats.astype(jnp.float32))

    @jax.jit
    def stem_fused(p, w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        feats = wavlm_fused_stem(x, p["feature_encoder"]["conv_layers"])
        return jnp.sum(feats.astype(jnp.float32))

    def make_e2e(use_fused):
        def fn(p, w, l):
            x = wavlm_prepare_batch(w, l, cfg.do_normalize)
            emb = wavlm_encode(p, x, cfg, layer_indices, sample_lengths=l,
                               precision=jax.lax.Precision.DEFAULT,
                               activation_dtype=jnp.bfloat16,
                               use_fused_stem=use_fused)
            return jnp.sum(emb)
        return jax.jit(fn)

    def make_emb(use_fused, precision, dtype):
        def fn(p, w, l):
            x = wavlm_prepare_batch(w, l, cfg.do_normalize)
            return wavlm_encode(p, x, cfg, layer_indices, sample_lengths=l,
                                precision=precision, activation_dtype=dtype,
                                use_fused_stem=use_fused)
        return jax.jit(fn)

    e2e_xla, e2e_fused = make_e2e(False), make_e2e(True)

    # fidelity on a small slice vs f32/HIGHEST
    small_w, small_l = waves_d[:4], lengths_d[:4]
    exact = make_emb(False, jax.lax.Precision.HIGHEST, jnp.float32)
    emb_exact = np.asarray(exact(params, small_w, small_l), np.float64)

    def maxcos(emb):
        out = []
        for s in range(emb.shape[0]):
            for b in range(emb.shape[1]):
                a, r = emb[s, b], emb_exact[s, b]
                out.append(1 - np.dot(a, r) / (np.linalg.norm(a) * np.linalg.norm(r)))
        return float(np.max(out))

    fused_emb = make_emb(True, jax.lax.Precision.DEFAULT, jnp.bfloat16)
    fid_fused = maxcos(np.asarray(fused_emb(bench_params, small_w, small_l), np.float64))
    print("fused-stem pooled fidelity vs f32:", fid_fused, flush=True)

    # compile everything at full shape first, then interleave timing loops
    for f in (stem_xla, stem_fused, e2e_xla, e2e_fused):
        float(f(bench_params, waves_d, lengths_d))
    print("compiled", flush=True)

    res = {"stem_xla": [], "stem_fused": [], "e2e_xla": [], "e2e_fused": []}
    for _ in range(3):
        res["stem_xla"].append(chain_time(stem_xla, (bench_params, waves_d, lengths_d), iters=args.iters))
        res["stem_fused"].append(chain_time(stem_fused, (bench_params, waves_d, lengths_d), iters=args.iters))
        res["e2e_xla"].append(chain_time(e2e_xla, (bench_params, waves_d, lengths_d), iters=args.iters))
        res["e2e_fused"].append(chain_time(e2e_fused, (bench_params, waves_d, lengths_d), iters=args.iters))

    audio_s = args.batch * n_samples / sr
    out = {
        "preset": args.preset,
        "batch": args.batch,
        "n_samples": n_samples,
        "fused_fidelity_vs_f32": fid_fused,
        "stem_xla_ms": [round(t * 1e3, 2) for t in res["stem_xla"]],
        "stem_fused_ms": [round(t * 1e3, 2) for t in res["stem_fused"]],
        "e2e_xla_ms": [round(t * 1e3, 2) for t in res["e2e_xla"]],
        "e2e_fused_ms": [round(t * 1e3, 2) for t in res["e2e_fused"]],
        "e2e_xla_audio_s_per_s": round(audio_s / min(res["e2e_xla"]), 2),
        "e2e_fused_audio_s_per_s": round(audio_s / min(res["e2e_fused"]), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
