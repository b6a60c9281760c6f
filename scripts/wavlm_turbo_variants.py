"""WavLM-Large turbo-preset variant timings: fused short-seq attention retry.

The fused gated-bias attention kernel (ops/wavlm_attention_pallas.py) lost
end-to-end in the bf16 era (XLA fused the einsum logits with neighbors; the
pallas_call blocked that). Under the int8 turbo preset the neighborhood
changed — the o-projection is now a quantize+int8 GEMM — so retest both
paths at the bench shape.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(fused: bool) -> float:
    if fused:
        os.environ["STUTTER_TPU_FUSED_SHORT_ATTENTION"] = "1"
    else:
        os.environ.pop("STUTTER_TPU_FUSED_SHORT_ATTENTION", None)
    import jax
    import jax.numpy as jnp

    from stutter_tpu.extract.batcher import BucketBatcher
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.frontend.wavlm_frontend import wavlm_prepare_batch
    from stutter_tpu.models import WavLMConfig, init_wavlm_params, wavlm_encode

    cfg = WavLMConfig.large()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "turbo")
    batcher = BucketBatcher(frame_align=(*cfg.stem_geometry, 16))
    n = batcher.bucket_samples(3.0)
    batch = 128
    sel = (24, 23, 22, 12)

    @jax.jit
    def fn(p, w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        return wavlm_encode(p, x, cfg, sel, sample_lengths=l,
                            precision=jax.lax.Precision.DEFAULT,
                            activation_dtype=jnp.bfloat16)

    rs = np.random.RandomState(0)
    waves = jax.device_put((rs.randn(batch, n) * 0.1).astype(np.float32))
    lengths = jax.device_put(np.full((batch,), n, np.int32))
    np.asarray(fn(params, waves, lengths))  # compile
    import time
    iters = 15
    t0 = time.perf_counter()
    prev = fn(params, waves, lengths)
    for _ in range(iters - 1):
        cur = fn(params, waves, lengths)
        np.asarray(prev)
        prev = cur
    np.asarray(prev)
    return (time.perf_counter() - t0) / iters, batch * (n / 16000)


def main():
    fused = os.environ.get("VARIANT") == "fused"
    t, audio = run_variant(fused)
    print(json.dumps({"variant": "fused" if fused else "einsum",
                      "ms": round(t * 1e3, 2),
                      "audio_s_per_s": round(audio / t, 1)}))


if __name__ == "__main__":
    main()
