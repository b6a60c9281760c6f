"""End-to-end A/B: divisor q-blocks vs padded power-of-two blocks for the
long fused attention kernel.

VERDICT r4 next-round #5 (20 s bucket at 49.5x, bar 50x). The dispatch pads
L up to a multiple of the q-block (512/256), and EVERY layer then pays pad
copies: q/k/v [B, H, L, d] -> Lp, the [H, L, L] f32 bias -> [H, Lp, Lp]
(~67 MB re-write per layer at L=1008), and an output slice back to L. But
the 20 s bucket is exactly L=1008 = 2*504 and the 30 s bucket L=1504 =
4*376 — divisor blocks (504 / 376, both 8-aligned sublane counts) make
Lp == L and delete ALL of that traffic. Pallas lane-dim tiling allows a
block whose last dim spans the full (non-128-multiple) array dim, so 1008
and 1504 rows are legal; Mosaic pads lanes internally without HBM copies.

Forced via the existing STUTTER_TPU_LONG_ATTENTION_BLOCK env (read at trace
time), so this is a pure-measurement script: interleaved chained-scalar
loops of the FULL extraction forward per bucket, baseline block choice vs
divisor block.

    python scripts/long_divisor_block_ab.py --out artifacts/long_divisor_ab_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--preset", type=str, default="turbo")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

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
        init_wavlm_params(jax.random.key(0), cfg), args.preset)
    n_states = cfg.num_hidden_layers + 1
    layer_indices = (n_states - 1, n_states - 2, n_states - 3, n_states // 2)
    batcher = BucketBatcher(frame_align=(*cfg.stem_geometry, 16))
    sr = 16000
    rs = np.random.RandomState(0)

    def make_fn(tag):
        # distinct function object per env setting: the block env is read at
        # trace time, so each jit must trace fresh
        def fn(p, waves, lengths, _tag=tag):
            x = wavlm_prepare_batch(waves, lengths, cfg.do_normalize)
            emb = wavlm_encode(p, x, cfg, layer_indices, sample_lengths=lengths,
                               precision=jax.lax.Precision.DEFAULT,
                               activation_dtype=jnp.bfloat16)
            return jnp.sum(emb)
        return jax.jit(fn)

    # (bucket_s, candidate divisor block). Baseline = unset env (512, padded).
    cases = [(20.0, 504), (30.0, 376), (30.0, 504)]
    out = {"metric": "long_divisor_block_ab", "preset": args.preset,
           "loops": args.loops, "iters": args.iters, "cases": {}}

    for bucket_s, div_block in cases:
        ns = batcher.bucket_samples(bucket_s)
        b = batcher.batch_size_for(bucket_s)
        waves = jax.device_put((rs.randn(b, ns) * 0.1).astype(np.float32))
        lengths = jax.device_put(np.full((b,), ns, np.int32))
        L = (ns - 400) // 320 + 1

        # jax.jit traces LAZILY at the first call, and models/wavlm.py reads
        # the block env at trace time — so each variant must be warmed (its
        # first call made) while its env setting is ACTIVE. The first cut of
        # this script popped the env before the warm-up calls and measured
        # baseline vs baseline (caught by round-5 self-review: loop times
        # identical to 0.1 ms, far inside tunnel noise).
        variants = {}
        os.environ.pop("STUTTER_TPU_LONG_ATTENTION_BLOCK", None)
        variants["baseline"] = make_fn(f"base_{bucket_s}")
        float(variants["baseline"](params, waves, lengths))  # trace+compile now
        os.environ["STUTTER_TPU_LONG_ATTENTION_BLOCK"] = str(div_block)
        variants[f"div{div_block}"] = make_fn(f"div_{bucket_s}_{div_block}")
        float(variants[f"div{div_block}"](params, waves, lengths))
        os.environ.pop("STUTTER_TPU_LONG_ATTENTION_BLOCK", None)

        times: dict[str, list] = {k: [] for k in variants}
        for _ in range(args.loops):  # interleaved: tunnel noise hits both
            for name, f in variants.items():
                times[name].append(
                    chain_time(f, (params, waves, lengths), iters=args.iters))
        case = {}
        for name, ts in times.items():
            t = min(ts)
            case[name] = {
                "audio_s_per_s": round(b * (ns / sr) / t, 1),
                "loop_ms": [round(x * 1e3, 1) for x in ts],
            }
        out["cases"][f"{bucket_s:g}s_L{L}_div{div_block}"] = case
        print(json.dumps({f"{bucket_s:g}s_div{div_block}": case}), flush=True)
        del waves, lengths

    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
