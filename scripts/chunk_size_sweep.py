"""Chunk-size sweep for the long-clip policy (round 4, follow-on to
scripts/long_policy_ab.py).

long_policy_ab measured chunk-12s (2357 audio-s/s) > native-30s (2128),
both under the 2500 target. The chunk length is OUR policy knob — the
reference's --max_length only trims (WavLM_embeddings.py:112-117), chunking
is this repo's extension — so sweep it: 6 s (L~304, einsum attention path,
30 s = 5 exact chunks), 8 s, 10 s (3 exact chunks), 12 s at a few batch
sizes. Report each bucket's raw rate and the EFFECTIVE 30 s-clip rate
(full chunks + tail chunk at its own bucket's rate, zero-overhead model —
the real combine adds host-side work the pipeline overlaps).
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
    params = cast_params_for_preset(
        init_wavlm_params(jax.random.key(0), cfg), "turbo")
    n_states = cfg.num_hidden_layers + 1
    layer_indices = (n_states - 1, n_states - 2, n_states - 3, n_states // 2)
    sr = 16000
    batcher = BucketBatcher(frame_align=(*cfg.stem_geometry, 16))

    @jax.jit
    def fn(p, waves, lengths):
        x = wavlm_prepare_batch(waves, lengths, cfg.do_normalize)
        emb = wavlm_encode(p, x, cfg, layer_indices, sample_lengths=lengths,
                           precision=jax.lax.Precision.DEFAULT,
                           activation_dtype=jnp.bfloat16)
        return jnp.sum(emb)

    rs = np.random.RandomState(0)
    out: dict = {"metric": "chunk_size_sweep", "preset": "turbo"}

    def measure(clip_s: float, batch: int, loops: int = 3, iters: int = 6) -> float:
        tag = f"b{batch}_{clip_s:g}s"
        n = batcher.bucket_samples(clip_s)
        w = jax.device_put((rs.randn(batch, n) * 0.1).astype(np.float32))
        length = jax.device_put(np.full((batch,), n, np.int32))
        float(fn(params, w, length))
        ts = [chain_time(fn, (params, w, length), iters=iters) for _ in range(loops)]
        tp = batch * (n / sr) / min(ts)
        out[tag] = round(tp, 1)
        print(json.dumps({tag: out[tag], "L": (n - 400) // 320 + 1}), flush=True)
        del w, length
        return tp

    # raw bucket rates (audio-budget-equivalent batches, ~360 audio-s each)
    r6 = measure(6.0, 60)
    r8 = measure(8.0, 45)
    r10 = measure(10.0, 36)
    r12 = measure(12.0, 30)
    # batch sensitivity at the two leaders
    measure(6.0, 48)
    measure(6.0, 64)
    measure(10.0, 32)

    # effective 30 s-clip rate per policy (tail chunk at its own rate)
    rates = {6.0: r6, 8.0: r8, 10.0: r10, 12.0: r12}
    for c, r in rates.items():
        full = int(30.0 // c)
        tail = 30.0 - full * c
        t = full * c / r
        if tail > 0:
            # tail rides the bucket it lands in (next bucket >= tail)
            tb = next((b for b in sorted(rates) if tail <= b), max(rates))
            t += tail / rates[tb]
        out[f"effective_30s_chunk{c:g}"] = round(30.0 / t, 1)
    print(json.dumps(out))
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "chunk_size_sweep_r4.json")
    with open(art, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
