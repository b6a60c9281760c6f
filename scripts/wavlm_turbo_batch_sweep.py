"""WavLM-Large turbo batch sweep: does int8 change the best batch size?

The bf16-era sweep picked 128 (256 measured slower — DESIGN.md §1 negative
results). The turbo preset halves GEMM time but not the bf16 attention
logits/softmax or stem, shifting the balance — retest under the preset that
actually serves the headline.

RESULT (v5e, 2026-08-17): 128 stays the winner. A sequential sweep suggested
192 > 128 (3314 vs 3065), but the tunneled service's load noise depressed the
first-measured config; an interleaved A/B (4 alternating rounds, compiles
up front) read 128 at ~3420 and 192 at ~3278 steady-state. Lesson: on the
shared dev TPU, only interleaved comparisons are trustworthy across configs.
"""

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
    from stutter_tpu.extract.batcher import BucketBatcher
    from stutter_tpu.extract.pipeline import cast_params_for_preset
    from stutter_tpu.frontend.wavlm_frontend import wavlm_prepare_batch
    from stutter_tpu.models import WavLMConfig, init_wavlm_params, wavlm_encode

    cfg = WavLMConfig.large()
    params = cast_params_for_preset(init_wavlm_params(jax.random.key(0), cfg), "turbo")
    batcher = BucketBatcher(frame_align=(*cfg.stem_geometry, 16))
    n = batcher.bucket_samples(3.0)
    sel = (24, 23, 22, 12)

    @jax.jit
    def fn(p, w, l):
        x = wavlm_prepare_batch(w, l, cfg.do_normalize)
        return jnp.sum(wavlm_encode(p, x, cfg, sel, sample_lengths=l,
                                    precision=jax.lax.Precision.DEFAULT,
                                    activation_dtype=jnp.bfloat16))

    rs = np.random.RandomState(0)
    out = {}
    for batch in (128, 192, 256):
        waves = jax.device_put((rs.randn(batch, n) * 0.1).astype(np.float32))
        lengths = jax.device_put(np.full((batch,), n, np.int32))
        t = chain_time(fn, (params, waves, lengths), iters=10)
        out[f"batch_{batch}"] = {
            "ms": round(t * 1e3, 2),
            "audio_s_per_s": round(batch * n / 16000 / t, 1),
        }
        print(json.dumps({f"batch_{batch}": out[f"batch_{batch}"]}), flush=True)
        del waves, lengths
    print(json.dumps(out))


if __name__ == "__main__":
    main()
