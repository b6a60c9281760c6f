"""End-to-end fine-tune CLI (BASELINE config[3]).

No reference equivalent exists (the reference only does frozen feature
extraction); this is the TPU build's first-class training entry point:
WavLM backbone + layer-weighted-sum + MLP head, class-weighted CE, DP mesh.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from stutter_tpu.cli.common import add_mesh_args, build_mesh, load_wavlm_model
from stutter_tpu.utils.logging import setup_logging


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Fine-tune WavLM end-to-end (TPU)")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--results_dir", type=str, required=True)
    parser.add_argument("--model_name", type=str, default="microsoft/wavlm-large")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--backbone_lr", type=float, default=1e-5)
    parser.add_argument("--head_lr", type=float, default=1e-3)
    parser.add_argument("--max_length", type=float, default=10.0)
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Accumulate gradients over K same-bucket batches "
                             "before each optimizer update: effective batch "
                             "K*batch_size from a batch_size-sized compiled "
                             "graph (the dev remote-compile service rejects "
                             "WavLM-Large backward graphs at batch >= 32)")
    parser.add_argument("--freeze_backbone", action="store_true",
                        help="SUPERB-style probe: train only layer weights + head")
    parser.add_argument("--no_remat", action="store_true",
                        help="Keep encoder activations for the backward pass "
                             "instead of recomputing. Measured +24%% step "
                             "throughput at batch 16 x 3 s on one v5e chip "
                             "(554 vs 445 audio-s/s); default stays remat for "
                             "headroom at bigger batch x length products")
    parser.add_argument("--remat_policy",
                        choices=["layer", "layer_probs", "layer_dots",
                                 "nothing", "dots"],
                        default="layer",
                        help="'layer' (default) checkpoints each encoder "
                             "layer — per-layer recompute, no cross-layer "
                             "f32 attention-probs residual (whole-forward "
                             "remat's was 1.88 GB at batch 32, the HBM OOM); "
                             "'layer_dots' additionally saves each layer's "
                             "GEMM outputs (measured slower on v5e); "
                             "'nothing'/'dots' remat the whole forward")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="Save the full train state (params + opt_state, "
                             "orbax, shard-aware) here after every epoch; "
                             "off when unset")
    parser.add_argument("--resume", action="store_true",
                        help="Restore the latest state under --checkpoint_dir "
                             "and continue from its epoch (rng/dropout state "
                             "is not part of the checkpoint)")
    parser.add_argument("--int8_forward", action="store_true",
                        help="int8 W8A8 forward GEMMs inside the training "
                             "step (straight-through backward). Measured on "
                             "v5e: +4%% step throughput at grad cosine "
                             "distance 5.3e-4 vs the bf16 step "
                             "(artifacts/finetune_int8_grad_r5.json)")
    parser.add_argument("--random_init", action="store_true")
    add_mesh_args(parser)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    logger = setup_logging("finetune")

    import jax.numpy as jnp

    from stutter_tpu.extract import BucketBatcher, create_metadata_from_files
    from stutter_tpu.train.class_weights import compute_class_weights
    from stutter_tpu.train.data import build_label_maps
    from stutter_tpu.train.finetune import FinetuneConfig, FinetuneTrainer
    from stutter_tpu.train.metrics import classification_metrics
    from stutter_tpu.train.persistence import save_model, save_results

    mesh = build_mesh(args)
    cfg_model, params = load_wavlm_model(args.model_path or args.model_name, args.random_init)

    metadata = create_metadata_from_files(args.data_dir, split="all")
    if len(metadata) == 0 or "label" not in metadata.columns:
        logger.error("no labeled files under %s", args.data_dir)
        return 1
    metadata = metadata[metadata["label"].notna()].reset_index(drop=True)
    label_to_idx, idx_to_label = build_label_maps(metadata["label"])
    class_names = [str(idx_to_label[i]) for i in range(len(idx_to_label))]

    train_meta = metadata[metadata["split"] == "train"].reset_index(drop=True)
    eval_meta = metadata[metadata["split"].isin(["test", "devel"])].reset_index(drop=True)
    y_train = train_meta["label"].map(label_to_idx).to_numpy()
    class_weights = compute_class_weights(y_train, len(class_names))

    cfg = FinetuneConfig(
        model=cfg_model, n_classes=len(class_names),
        backbone_lr=args.backbone_lr, head_lr=args.head_lr,
        freeze_backbone=args.freeze_backbone,
        remat_encoder=not args.no_remat,
        remat_policy=args.remat_policy,
        int8_forward=args.int8_forward,
        precision=__import__("jax").lax.Precision.DEFAULT,
        activation_dtype=jnp.bfloat16,
    )
    trainer = FinetuneTrainer(cfg, backbone_params=params, mesh=mesh,
                              grad_accum=max(1, args.grad_accum))
    batcher = BucketBatcher(
        audio_budget_s=args.batch_size * 3.0, max_batch=args.batch_size,
        batch_multiple=mesh.data_size if mesh else 1, max_length_s=args.max_length,
        # snap bucket lengths so the conv stem yields MXU-friendly frame
        # counts — a misaligned L=149 trains ~40% slower than L=160 on v5e
        # (same rule as extraction; extract/batcher.py frame_align)
        frame_align=(*cfg.model.stem_geometry, 16),
    )

    label_by_path = dict(zip(train_meta["path"], y_train))
    # decode once; epochs reuse the cached padded batches (the host decode
    # pool is for streaming extraction — training revisits the same clips)
    cached = []
    for batch in batcher.batches(list(train_meta["path"])):
        n_pad = len(batch.waves) - len(batch.paths)
        labels = np.array(
            [label_by_path.get(p, 0) for p in batch.paths] + [0] * n_pad, np.int32
        )
        # mask bucket-pad rows, decode failures, and unlabeled paths out of
        # the loss/accuracy (they'd otherwise train the head toward class 0)
        valid = np.array(
            [bool(batch.ok[j]) and p in label_by_path
             for j, p in enumerate(batch.paths)] + [False] * n_pad,
            np.float32,
        )
        cached.append((batch.waves, batch.lengths, labels, valid))
    start_epoch = 0
    if args.resume:
        from stutter_tpu.train.checkpointing import latest_step, restore_train_state

        if not args.checkpoint_dir:
            logger.error("--resume requires --checkpoint_dir")
            return 2
        step = latest_step(args.checkpoint_dir)
        if step is not None:
            trainer.params, trainer.opt_state, start_epoch = restore_train_state(
                args.checkpoint_dir, step, trainer.params, trainer.opt_state
            )
            logger.info("resuming from epoch %d", start_epoch)

    rng = np.random.RandomState(0)
    K = max(1, args.grad_accum)
    for epoch in range(start_epoch, args.epochs):
        # async-dispatch the whole epoch (sync=False): steps chain device-side
        # through the donated params/opt_state; losses are fetched once at
        # epoch end, so the hot loop never stalls on a per-step host sync
        # (measured 2x step time through a slow host link)
        auxes = []
        if K == 1:
            for i in rng.permutation(len(cached)):
                waves, lengths, labels, valid = cached[i]
                auxes.append(trainer.step(waves, lengths, labels, class_weights,
                                          valid=valid, sync=False))
        else:
            # grad accumulation needs same-shape microbatches: shuffle WITHIN
            # each bucket shape, then accumulate K consecutive batches per
            # update (short tails are valid=0-padded inside step_accum)
            by_shape: dict[tuple, list[int]] = {}
            for i in rng.permutation(len(cached)):
                by_shape.setdefault(cached[i][0].shape, []).append(i)
            for idxs in by_shape.values():
                for s in range(0, len(idxs), K):
                    group = [cached[i] for i in idxs[s : s + K]]
                    auxes.append(trainer.step_accum(group, class_weights,
                                                    sync=False))
        losses = [float(a["loss"]) for a in auxes]
        logger.info("epoch %d: mean loss %.4f", epoch, float(np.mean(losses)))
        if args.checkpoint_dir:
            from stutter_tpu.train.checkpointing import save_train_state

            # epoch index as the checkpoint step: resume restarts at epoch+1
            save_train_state(args.checkpoint_dir, epoch + 1,
                             trainer.params, trainer.opt_state)

    # evaluation
    y_true, y_pred = [], []
    eval_labels = dict(zip(eval_meta["path"], eval_meta["label"].map(label_to_idx)))
    for batch in batcher.batches(list(eval_meta["path"])):
        preds = trainer.predict(batch.waves, batch.lengths)
        for j, p in enumerate(batch.paths):
            if batch.ok[j] and p in eval_labels:
                y_true.append(eval_labels[p])
                y_pred.append(int(preds[j]))
    results = classification_metrics(np.array(y_true), np.array(y_pred),
                                     len(class_names), class_names)
    logger.info("eval balanced_acc=%.4f weighted_f1=%.4f",
                results["balanced_accuracy"], results["weighted_f1"])
    save_results({k: v for k, v in results.items() if k != "confusion_matrix"},
                 args.results_dir, "finetune_results.json")
    import jax

    save_model(jax.tree.map(np.asarray, trainer.params), args.results_dir,
               "wavlm_finetune", "weighted_sum", "mlp", results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
