"""Einsum-vs-fused-kernel crossover sweep for WavLM long-bucket attention.

chunk_size_sweep (round 4) showed the einsum path at L=400 (3104 audio-s/s)
beating the fused kernel at L=512 (2508) — the old hard L>=512 dispatch
threshold was suspect. This sweeps BOTH paths at each bucket length by
forcing the threshold via STUTTER_TPU_LONG_ATTENTION_MIN_L (trace-time env,
one jit program per setting) and records the crossover; the winner sets the
default in models/wavlm.py.
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

    def make_fn(min_l: int):
        def fn(p, waves, lengths):
            os.environ["STUTTER_TPU_LONG_ATTENTION_MIN_L"] = str(min_l)
            x = wavlm_prepare_batch(waves, lengths, cfg.do_normalize)
            emb = wavlm_encode(p, x, cfg, layer_indices, sample_lengths=lengths,
                               precision=jax.lax.Precision.DEFAULT,
                               activation_dtype=jnp.bfloat16)
            return jnp.sum(emb)
        return jax.jit(fn)

    rs = np.random.RandomState(0)
    out: dict = {"metric": "long_threshold_sweep", "preset": "turbo"}

    def measure(clip_s: float, batch: int, path: str,
                loops: int = 3, iters: int = 6) -> float:
        n = batcher.bucket_samples(clip_s)
        fn = make_fn(100000 if path == "einsum" else 16)
        w = jax.device_put((rs.randn(batch, n) * 0.1).astype(np.float32))
        length = jax.device_put(np.full((batch,), n, np.int32))
        float(fn(params, w, length))
        ts = [chain_time(fn, (params, w, length), iters=iters) for _ in range(loops)]
        tp = batch * (n / sr) / min(ts)
        tag = f"{path}_{clip_s:g}s_b{batch}"
        out[tag] = round(tp, 1)
        print(json.dumps({tag: out[tag]}), flush=True)
        del w, length
        return tp

    # (clip_s, batch): ~360 audio-s per dispatch throughout
    for clip_s, batch in ((10.0, 36), (12.0, 30), (16.0, 22), (20.0, 18),
                          (30.0, 12)):
        e = measure(clip_s, batch, "einsum")
        f = measure(clip_s, batch, "fused")
        out[f"winner_{clip_s:g}s"] = "einsum" if e > f else "fused"
    print(json.dumps(out))
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "long_threshold_sweep_r4.json")
    with open(art, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
