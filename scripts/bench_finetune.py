"""WavLM-Large fine-tune training-step throughput on one v5e chip.

Measures the steady-state jit train step (forward + backward + adamw update,
remat on the encoder scan) at the largest batch the remote compile service
accepts (16 — batch 32 500s server-side, CLAUDE.md). Reports audio-s/s and
a model-FLOP utilization estimate (3x forward FLOPs for fwd+bwd; remat adds
a 4th forward pass which the MFU figure deliberately does NOT credit, so it
is a conservative lower bound).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches accumulated per optimizer update "
                         "(effective batch = 16 * K from the batch-16 graph)")
    ap.add_argument("--no_remat", action="store_true",
                    help="keep encoder activations for the backward pass "
                         "instead of recomputing (trades HBM for the remat "
                         "forward)")
    ap.add_argument("--batch", type=int, default=16,
                    help="per-step batch (16 = the unfrozen remote-compile "
                         "ceiling; frozen probes compile far larger)")
    ap.add_argument("--freeze_backbone", action="store_true",
                    help="SUPERB-style frozen probe: stop_gradient prunes "
                         "the backbone backward from the step program")
    ap.add_argument("--remat_policy",
                    choices=["layer", "layer_probs", "layer_dots",
                             "nothing", "dots"],
                    default="layer",
                    help="'layer' = per-encoder-layer checkpoint (default); "
                         "'layer_dots' also saves per-layer GEMM outputs; "
                         "'nothing'/'dots' = whole-forward remat")
    ap.add_argument("--f32_params", action="store_true",
                    help="disable the mixed-precision bf16 param cast, "
                         "keeping bf16 activations (the pre-round-3 "
                         "behavior, for A/B comparison)")
    ap.add_argument("--fused_short_attention", action="store_true",
                    help="route the 3 s bucket's attention through the fused "
                         "Pallas kernel + its custom VJP (probs chain stays "
                         "in VMEM both directions) instead of the einsum "
                         "path")
    ap.add_argument("--accum_unroll", type=int, default=1,
                    help="grad-accum scan unroll factor")
    ap.add_argument("--int8_forward", action="store_true",
                    help="int8 W8A8 forward GEMMs inside the training step "
                         "(straight-through backward — ops/quant.qdot_ste); "
                         "gate on scripts/finetune_int8_grad_check.py first")
    ap.add_argument("--loops", type=int, default=5,
                    help="spaced timing loops; min wins (tunnel load noise)")
    ap.add_argument("--clip_s", type=float, default=3.0,
                    help="training clip bucket seconds (12.0 -> L=608 for "
                         "the long-bucket einsum-vs-VJP-kernel training A/B; "
                         "pair with STUTTER_TPU_LONG_ATTENTION_MIN_L)")
    args = ap.parse_args()

    if args.fused_short_attention:
        os.environ["STUTTER_TPU_FUSED_SHORT_ATTENTION"] = "1"

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    from stutter_tpu.models.wavlm import WavLMConfig
    from stutter_tpu.train.finetune import FinetuneConfig, FinetuneTrainer
    from stutter_tpu.utils.benchmarking import V5E_BF16_PEAK, wavlm_flops

    model_cfg = WavLMConfig.large()
    cfg = FinetuneConfig(model=model_cfg, n_classes=8,
                         remat_encoder=not args.no_remat,
                         remat_policy=args.remat_policy,
                         freeze_backbone=args.freeze_backbone,
                         cast_params=not args.f32_params,
                         accum_unroll=args.accum_unroll,
                         int8_forward=args.int8_forward)
    K = max(1, args.grad_accum)
    trainer = FinetuneTrainer(cfg, grad_accum=K)

    batch, clip_s, sr = args.batch, args.clip_s, 16000
    # frame-aligned bucket padding, exactly as cli/finetune.py batches
    # training clips (L=160; raw 3.0 s would be L=149, ~40% slower on MXU)
    from stutter_tpu.extract.batcher import BucketBatcher

    n = BucketBatcher(frame_align=(*model_cfg.stem_geometry, 16)).bucket_samples(clip_s)
    rs = np.random.RandomState(0)
    waves = (rs.randn(batch, n) * 0.1).astype(np.float32)
    lengths = np.full((batch,), n, np.int32)
    labels = rs.randint(0, 8, batch).astype(np.int32)
    cw = np.ones((8,), np.float32)

    if K > 1:
        mbs = [(waves, lengths, labels, np.ones((batch,), np.float32))] * K

        def run(sync=True):
            return trainer.step_accum(mbs, cw, sync=sync)
    else:

        def run(sync=True):
            return trainer.step(waves, lengths, labels, cw, sync=sync)

    import time

    run()  # compile + first exec
    # async-dispatch chain (sync=False): params/opt_state flow device-side
    # step to step; one final metrics fetch — no per-step relay round trip.
    # min over spaced loops = the device's demonstrated steady state (the
    # shared tunnel shows ±10-30% load noise on multi-minute scales).
    iters = 8
    loop_t: list[float] = []
    m = {"loss": float("nan")}
    for _ in range(max(1, args.loops)):
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            run(sync=False)
        m = run()
        loop_t.append((time.perf_counter() - t0) / iters)
    t = min(loop_t)

    enc_flops, stem_flops, _ = wavlm_flops(model_cfg, batch, n)
    # FLOP credit matches bench.py:_finetune_throughput exactly so the two
    # mfu_lower_bound fields are comparable: 3x encoder for fwd+bwd, 1x stem
    # when the stem is frozen (its backward is structurally pruned), 1x
    # everything when the whole backbone is frozen
    if args.freeze_backbone:
        flops = (enc_flops + stem_flops) * K
    else:
        stem_mult = 1 if cfg.freeze_feature_encoder else 3
        flops = (3 * enc_flops + stem_mult * stem_flops) * K
    out = {
        "metric": "wavlm_large_finetune_step_throughput",
        "batch": batch,
        "grad_accum": K,
        "freeze_backbone": args.freeze_backbone,
        "effective_batch": batch * K,
        "step_ms": round(t * 1e3, 2),
        # padded bucket seconds, same accounting as bench.py's extraction
        # headline (n is the frame-aligned bucket for 3.0 s clips)
        "audio_s_per_s": round(K * batch * (n / sr) / t, 1),
        "mfu_lower_bound": round(flops / t / V5E_BF16_PEAK, 3),
        "loop_ms": [round(x * 1e3, 1) for x in loop_t],
        "fused_short_attention": args.fused_short_attention,
        "accum_unroll": args.accum_unroll,
        "int8_forward": args.int8_forward,
        "clip_s": clip_s,
        "long_attention_min_l": os.environ.get("STUTTER_TPU_LONG_ATTENTION_MIN_L"),
        "loss": float(m["loss"]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
