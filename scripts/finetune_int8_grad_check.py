"""Gradient-fidelity gate for int8 forward GEMMs in the fine-tune step.

VERDICT r4 next-round #2: before any end-to-end A/B, measure how far the
``FinetuneConfig.int8_forward`` step's gradients sit from the bf16 step's —
the STE backward is exact GIVEN the forward's residuals (tests/test_quant),
so the whole difference is activation-quantization noise propagating through
the chain. Reported per top-level group (backbone / layer_weights / head)
plus the flattened-overall cosine, on WavLM-Large at the real training
shape, same harness discipline as artifacts/vjp_grad_equiv_tpu_r4.log.

    python scripts/finetune_int8_grad_check.py --batch 8
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flat(tree) -> np.ndarray:
    import jax

    return np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in jax.tree.leaves(tree)])


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return float(1.0 - a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-300))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clip_s", type=float, default=3.0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from stutter_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from stutter_tpu.extract.batcher import BucketBatcher
    from stutter_tpu.models.wavlm import WavLMConfig
    from stutter_tpu.train.finetune import (
        FinetuneConfig,
        finetune_forward,
        init_finetune_params,
    )
    from stutter_tpu.train.heads import weighted_softmax_xent

    model_cfg = WavLMConfig.large()
    base = FinetuneConfig(model=model_cfg, n_classes=8)
    cfg8 = dataclasses.replace(base, int8_forward=True)
    params = init_finetune_params(base)

    sr = 16000
    n = BucketBatcher(frame_align=(*model_cfg.stem_geometry, 16)).bucket_samples(args.clip_s)
    rs = np.random.RandomState(0)
    waves = jax.device_put((rs.randn(args.batch, n) * 0.1).astype(np.float32))
    lengths = jax.device_put(np.full((args.batch,), n, np.int32))
    labels = jax.device_put(rs.randint(0, 8, args.batch).astype(np.int32))
    cw = jax.device_put(np.ones((8,), np.float32))

    def make_grad(cfg):
        def loss(p):
            logits = finetune_forward(p, waves, lengths, cfg, train=False)
            return weighted_softmax_xent(logits, labels, cw)

        return jax.jit(jax.value_and_grad(loss))

    l16, g16 = make_grad(base)(params)
    l8, g8 = make_grad(cfg8)(params)
    l16, l8 = float(l16), float(l8)

    out = {"metric": "finetune_int8_grad_fidelity", "batch": args.batch,
           "clip_s": args.clip_s, "loss_bf16": l16, "loss_int8": l8,
           "groups": {}}
    for group in ("backbone", "layer_weights", "head"):
        a, b = _flat(g16[group]), _flat(g8[group])
        out["groups"][group] = {
            "cosine_distance": _cos(a, b),
            "rel_norm": float(np.linalg.norm(b) / max(np.linalg.norm(a), 1e-300)),
        }
    out["overall_cosine_distance"] = _cos(_flat(g16), _flat(g8))
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
