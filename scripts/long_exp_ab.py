"""A/B the long-attention kernel's forward-softmax exp dtype on the TPU.

The 30 s native bucket reads 2126 audio-s/s (long_threshold_sweep r4) vs the
2500 bar. Roofline: head_dim=64 pins both attention matmuls at ~50% MXU, so
the L-wide f32 exp+divide (the VPU's largest term) is the available lever —
this measures f32 vs bf16 exp end-to-end at 20 s and 30 s under turbo, plus
the end-to-end embedding fidelity of bf16 exp vs the f32/HIGHEST einsum
reference (the bench.py methodology, 1e-3 bar).
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

    from stutter_tpu.extract.batcher import BucketBatcher
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.frontend.wavlm_frontend import wavlm_prepare_batch
    from stutter_tpu.models import WavLMConfig, init_wavlm_params, wavlm_encode
    from stutter_tpu.utils.benchmarking import chain_time

    cfg = WavLMConfig.large()
    params_f32 = init_wavlm_params(jax.random.key(0), cfg)
    params = cast_params_for_preset(params_f32, "turbo")
    n_states = cfg.num_hidden_layers + 1
    layer_indices = (n_states - 1, n_states - 2, n_states - 3, n_states // 2)
    sr = 16000
    batcher = BucketBatcher(frame_align=(*cfg.stem_geometry, 16))

    def make_fn(exp: str, scalar: bool = True, exact: bool = False):
        def fn(p, waves, lengths):
            os.environ["STUTTER_TPU_LONG_ATTENTION_EXP"] = exp
            x = wavlm_prepare_batch(waves, lengths, cfg.do_normalize)
            emb = wavlm_encode(
                p, x, cfg, layer_indices, sample_lengths=lengths,
                precision=jax.lax.Precision.HIGHEST if exact
                else jax.lax.Precision.DEFAULT,
                activation_dtype=jnp.float32 if exact else jnp.bfloat16,
            )
            return jnp.sum(emb) if scalar else emb
        return jax.jit(fn)

    rs = np.random.RandomState(0)
    out: dict = {"metric": "long_exp_ab", "preset": "turbo"}

    # fidelity first (small batch): bf16-exp kernel vs f32/HIGHEST einsum
    n30 = batcher.bucket_samples(30.0)
    w4 = jax.device_put((rs.randn(4, n30) * 0.1).astype(np.float32))
    l4 = jax.device_put(np.full((4,), n30, np.int32))
    ref = np.asarray(make_fn("f32", scalar=False, exact=True)(params_f32, w4, l4),
                     np.float64)
    got = np.asarray(make_fn("bf16", scalar=False)(params, w4, l4), np.float64)
    worst = 0.0
    for s in range(ref.shape[0]):
        for b in range(ref.shape[1]):
            u, v = ref[s, b], got[s, b]
            worst = max(worst, 1 - u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
    out["bf16_exp_fidelity_cosine_vs_f32"] = worst
    print(json.dumps({"fidelity": worst}), flush=True)
    del w4, l4, ref, got

    def measure(tag: str, exp: str, clip_s: float, batch: int,
                loops: int = 3, iters: int = 6) -> float:
        n = batcher.bucket_samples(clip_s)
        fn = make_fn(exp)
        w = jax.device_put((rs.randn(batch, n) * 0.1).astype(np.float32))
        length = jax.device_put(np.full((batch,), n, np.int32))
        float(fn(params, w, length))
        ts = [chain_time(fn, (params, w, length), iters=iters) for _ in range(loops)]
        tp = batch * (n / sr) / min(ts)
        out[tag] = round(tp, 1)
        print(json.dumps({tag: out[tag]}), flush=True)
        del w, length
        return tp

    f30 = measure("f32_30s_b12", "f32", 30.0, 12)
    b30 = measure("bf16_30s_b12", "bf16", 30.0, 12)
    f20 = measure("f32_20s_b18", "f32", 20.0, 18)
    b20 = measure("bf16_20s_b18", "bf16", 20.0, 18)
    # confirmation interleave on the 30 s pair
    f30b = measure("f32_30s_b12_confirm", "f32", 30.0, 12)
    b30b = measure("bf16_30s_b12_confirm", "bf16", 30.0, 12)
    out["winner_30s"] = "bf16" if max(b30, b30b) > max(f30, f30b) else "f32"
    print(json.dumps(out))
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "long_exp_ab_r4.json")
    with open(art, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
