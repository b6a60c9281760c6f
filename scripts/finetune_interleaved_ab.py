"""Interleaved fine-tune A/B on the real TPU: several step-program variants
compiled up front, then alternating timing loops (the tunnel shows ~2x load
swings on 20-minute scales, so sequential per-process sweeps are not
comparable — CLAUDE.md).

All variants SHARE one params+opt_state lineage (the previous version built
one FinetuneTrainer per variant — 3 x ~3.2 GB of f32 master state — and
OOM'd the 16 GB chip before measuring anything). The jit step fns donate
(params, opt_state), so state simply flows through whichever variant runs.

Every variant processes the SAME effective batch 64 of aligned 3 s-bucket
clips (n = 51200 samples, L = 160 frames) per optimizer update:

  A: batch 16 x grad_accum 4, no remat      (the r2 best corner)
  B: batch 16 x grad_accum 4, layer remat   (per-encoder-layer checkpoint)
  C: batch 32 x grad_accum 2, layer remat   (unlocked by the in-scan pooled
     reduction + per-layer remat; whole-forward remat stacked a 1.88 GB f32
     attention-probs residual and OOM'd at batch 32)
  D: batch 32 x grad_accum 2, no remat      (500s in the remote compile
     service — the known batch-32 no-remat graph limit; auto-dropped)
  E: batch 32 x grad_accum 2, layer_dots    (per-layer checkpoint saving
     GEMM outputs; recompute only elementwise — ~3.5 GB extra residuals)
  F: batch 64 x grad_accum 1, layer remat   (layer remat shrinks the
     backward graph; probe whether the compile service takes batch 64)

Round-1 measured (3 rounds x 8 iters, min): A 658, B 527, C 682 audio-s/s;
D dropped (HTTP 500 at compile). Tunnel noise within-variant was ~2x, so
rankings need the interleaving.
"""

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip", default="",
                    help="comma-separated variant letters to skip, e.g. 'D'")
    ap.add_argument("--only", default="",
                    help="comma-separated variant letters to run exclusively "
                         "(e.g. 'M,N' for the long-bucket kernel A/B)")
    ap.add_argument("--clip_s", type=float, default=3.0,
                    help="training clip bucket seconds (20/30 engage the "
                         "long-attention dispatch at L=1008/1504)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    skip = set(args.skip.upper().split(","))
    only = set(x for x in args.only.upper().split(",") if x)

    from stutter_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()

    from stutter_tpu.extract.batcher import BucketBatcher
    from stutter_tpu.models.wavlm import WavLMConfig
    from stutter_tpu.train.finetune import (
        FinetuneConfig, init_finetune_params, make_optimizer, make_train_step)

    model_cfg = WavLMConfig.large()
    n = BucketBatcher(frame_align=(*model_cfg.stem_geometry, 16)).bucket_samples(args.clip_s)
    sr = 16000
    rs = np.random.RandomState(0)
    base = FinetuneConfig(model=model_cfg, n_classes=8)

    # ONE shared state lineage (same tx for every variant: the optimizer
    # depends only on freeze flags / LRs, identical across variants)
    params = init_finetune_params(base)
    tx = make_optimizer(base, params)
    opt_state = tx.init(params)
    cw = np.asarray(np.ones((8,), np.float32))

    def make(batch, accum, remat, policy="layer", unroll=1, env=None,
             int8=False):
        cfg = FinetuneConfig(model=model_cfg, n_classes=8,
                             remat_encoder=remat, remat_policy=policy,
                             accum_unroll=unroll, int8_forward=int8)
        step = jax.jit(make_train_step(cfg, tx, accum), donate_argnums=(0, 1))
        # accum == 1 builds the plain step, whose batch arrays have NO
        # leading microbatch axis (make_train_step contract)
        lead = (accum,) if accum > 1 else ()
        waves = np.broadcast_to(
            (rs.randn(batch, n) * 0.1).astype(np.float32),
            (*lead, batch, n)).copy()
        lengths = np.full((*lead, batch), n, np.int32)
        labels = rs.randint(0, 8, (*lead, batch)).astype(np.int32)
        valid = np.ones((*lead, batch), np.float32)
        # env: trace-time attention-dispatch knobs — applied around the
        # variant's FIRST call (the trace+compile); compiled programs are
        # env-independent afterwards
        return step, (waves, lengths, labels, valid), batch * accum, env or {}

    variants = {}
    if "A" not in skip:
        variants["A_b16a4_noremat"] = make(16, 4, False)
    if "B" not in skip:
        variants["B_b16a4_rematlayer"] = make(16, 4, True)
    if "C" not in skip:
        variants["C_b32a2_rematlayer"] = make(32, 2, True)
    if "D" not in skip:
        variants["D_b32a2_noremat"] = make(32, 2, False)
    if "E" not in skip:
        variants["E_b32a2_layerdots"] = make(32, 2, True, "layer_dots")
    if "F" not in skip:
        variants["F_b64a1_rematlayer"] = make(64, 1, True)
    if "G" not in skip:
        variants["G_b16a4_layerprobs"] = make(16, 4, True, "layer_probs")
    if "H" not in skip:
        variants["H_b64a1_layerprobs"] = make(64, 1, True, "layer_probs")
    # round-4 variants: the fused short-attention custom VJP (3 s bucket's
    # [BB, L, L] probs chain in VMEM both directions) and the grad-accum
    # scan unroll (fuse the f32 grad-tree adds into backward epilogues)
    if "I" not in skip:
        variants["I_b16a4_fusedshort"] = make(
            16, 4, True, env={"STUTTER_TPU_FUSED_SHORT_ATTENTION": "1"})
    if "J" not in skip:
        variants["J_b16a4_unroll2"] = make(16, 4, True, unroll=2)
    if "K" not in skip:
        variants["K_b16a4_unroll4"] = make(16, 4, True, unroll=4)
    if "L" not in skip:
        variants["L_b16a4_fusedshort_unroll4"] = make(
            16, 4, True, unroll=4,
            env={"STUTTER_TPU_FUSED_SHORT_ATTENTION": "1"})
    # round-5 variants. M/N: the LONG-bucket training kernel A/B (VERDICT r4
    # #8) — run with --clip_s 20 or 30 and --only M,N; b4·K4 keeps the
    # einsum variant's [B, H, L, L] chain inside HBM and the backward graph
    # inside the remote compile service's limit. O/P: int8 forward GEMMs in
    # the step (ops/quant.qdot_ste straight-through backward, VERDICT r4 #2).
    if "M" not in skip:
        variants["M_b4a4_einsum_long"] = make(
            4, 4, True, env={"STUTTER_TPU_LONG_ATTENTION_MIN_L": "99999"})
    if "N" not in skip:
        variants["N_b4a4_kernel_long"] = make(4, 4, True)
    if "O" not in skip:
        variants["O_b16a4_int8fwd"] = make(16, 4, True, int8=True)
    if "P" not in skip:
        variants["P_b16a4_bf16_ctrl"] = make(16, 4, True)
    if only:
        variants = {k: v for k, v in variants.items() if k.split("_")[0] in only}

    key = jax.random.key(1)
    dead = set()

    def run_one(name, sync):
        nonlocal params, opt_state, key
        step, (w, l, y, v), _, _ = variants[name]
        key, k = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, w, l, y, v, cw, k)
        if sync:
            return {k2: float(v2) for k2, v2 in aux.items()}
        return aux

    # compile + first exec for every variant BEFORE any timing; a variant
    # that fails (compile 500 / HBM OOM raised at compile time) is dropped
    for name in list(variants):
        env = variants[name][3]
        try:
            for k2, v2 in env.items():
                os.environ[k2] = v2
            m = run_one(name, sync=True)
            print(f"compiled {name}: loss={m['loss']:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"DROPPED {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            dead.add(name)
        finally:
            for k2 in env:
                os.environ.pop(k2, None)

    times = {k: [] for k in variants if k not in dead}
    for r in range(args.rounds):
        for name in times:
            t0 = time.perf_counter()
            for _ in range(args.iters - 1):
                run_one(name, sync=False)
            run_one(name, sync=True)  # metrics fetch syncs the chain
            times[name].append((time.perf_counter() - t0) / args.iters)
        print(f"round {r}: " + " ".join(
            f"{k}={times[k][-1]*1e3:.1f}ms" for k in times), flush=True)

    out = {}
    for name in times:
        t = min(times[name])
        eff = variants[name][2]
        out[name] = {
            "effective_batch": eff,
            "step_ms": round(t * 1e3, 2),
            "audio_s_per_s": round(eff * (n / sr) / t, 1),
            "loop_ms": [round(x * 1e3, 1) for x in times[name]],
        }
    out["clip_s"] = args.clip_s
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
