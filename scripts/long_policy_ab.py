"""Long-clip policy A/B on the real TPU (VERDICT r3 weak #4 / next #3).

Decides, by measurement, how a corpus of 30 s clips should run under the
turbo preset:

  A. native 30 s bucket (L~1500, fused long-attention kernel), batch 12
  B. 12 s chunks (L~600, same kernel, smaller tiles), batch 30 — the
     existing ``--long_files chunk`` policy with max_length 12; measured as
     full 12 s chunks, i.e. the chunk path's best case (a real 30 s clip
     also pays a 6 s tail chunk + the host-side combine)
  C. native 30 s with forced q-block sizes (end-to-end block retune — the
     isolated-kernel sweep reads ~30 ms relay noise per call, so only the
     full program decides; STUTTER_TPU_LONG_ATTENTION_BLOCK hook)

All variants time the SAME extraction program shape as bench.py (pooled
scalar chained across iterations, min over spaced loops). Throughputs in
audio-s/s/chip, directly comparable to bench.py's long_bucket_30s field.
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

    def make_fn(block_env: str | None):
        # distinct function object per env setting: the env var is read at
        # TRACE time inside the attention dispatch, so each setting must be
        # traced/compiled as its own jit program
        def fn(p, waves, lengths):
            if block_env is not None:
                os.environ["STUTTER_TPU_LONG_ATTENTION_BLOCK"] = block_env
            else:
                os.environ.pop("STUTTER_TPU_LONG_ATTENTION_BLOCK", None)
            x = wavlm_prepare_batch(waves, lengths, cfg.do_normalize)
            emb = wavlm_encode(p, x, cfg, layer_indices, sample_lengths=lengths,
                               precision=jax.lax.Precision.DEFAULT,
                               activation_dtype=jnp.bfloat16)
            return jnp.sum(emb)
        return jax.jit(fn)

    rs = np.random.RandomState(0)
    out: dict = {"metric": "long_policy_ab", "preset": "turbo"}

    def measure(tag: str, clip_s: float, batch: int, block: str | None,
                loops: int = 3, iters: int = 6) -> float:
        n = batcher.bucket_samples(clip_s)
        w = jax.device_put((rs.randn(batch, n) * 0.1).astype(np.float32))
        l = jax.device_put(np.full((batch,), n, np.int32))
        f = make_fn(block)
        float(f(params, w, l))  # compile + forced first exec
        ts = [chain_time(f, (params, w, l), iters=iters) for _ in range(loops)]
        tp = batch * (n / sr) / min(ts)
        out[tag] = round(tp, 1)
        out[tag + "_loop_ms"] = [round(t * 1e3, 1) for t in ts]
        print(json.dumps({tag: out[tag]}), flush=True)
        del w, l
        return tp

    # interleave A/B/C measurement loops? The loops-of-min discipline plus
    # ordering spread already absorbs most load noise; keep it simple and
    # re-run the winner last as a confirmation pass.
    a = measure("native_30s_bq_auto", 30.0, 12, None)
    b = measure("chunk_12s", 12.0, 30, None)
    c384 = measure("native_30s_bq384", 30.0, 12, "384")
    c256 = measure("native_30s_bq256", 30.0, 12, "256")
    # confirmation pass on the best native variant + chunk, interleaved
    best_native = max([("native_30s_bq_auto", a, None),
                       ("native_30s_bq384", c384, "384"),
                       ("native_30s_bq256", c256, "256")], key=lambda x: x[1])
    out["best_native"] = best_native[0]
    a2 = measure(best_native[0] + "_confirm", 30.0, 12, best_native[2])
    b2 = measure("chunk_12s_confirm", 12.0, 30, None)
    out["winner"] = ("chunk_12s" if max(b, b2) > max(a, a2, best_native[1])
                     else best_native[0])
    print(json.dumps(out))
    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts"), exist_ok=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts", "long_policy_ab_r4.json"),
            "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
