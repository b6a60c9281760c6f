"""Minority-class augmentation + batched re-extraction (reference C13).

Reference behavior (``model_training_01.py:290-388``): for every class with
fewer than ``minority_threshold`` training samples, create
``augmentation_factor`` augmented copies per clip and run the FULL model
forward per copy (batch=1, the second hot loop) to get embeddings, appending
them to the training set with ``{filename}_aug_{i}`` names.

TPU-first restructuring: all augmented copies are generated first (host DSP +
device resample/pitch kernels), then embedded in large padded batches through
the same extractor the pipeline uses — the per-copy forwards collapse into a
handful of bucket-shaped jit calls.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from stutter_tpu.audio.wavio import load_audio
from stutter_tpu.extract.batcher import Batch
from stutter_tpu.train.augment import AugmentConfig, augment_audio
from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.augment_extract")


def _embed_waves(extractor, waves: list[np.ndarray], chunk: int = 64):
    """Batch-embed a list of variable-length waves with one extractor call
    per fixed-shape chunk. Returns {column: [n, D]}.

    Shape discipline matters here exactly as in the main pipeline: ONE padded
    length for all chunks (frame-aligned via the extractor's stem geometry so
    the conv frame count tiles the MXU) and batch sizes padded to the mesh
    data-axis multiple — otherwise every chunk is a fresh 60-90 s remote
    compile and DP sharding crashes on ragged remainders.
    """
    sr = 16000
    out: dict[str, list] = {name: [] for name in extractor.column_names}
    mesh = getattr(extractor, "mesh", None)
    multiple = mesh.data_size if mesh is not None else 1
    chunk = ((chunk + multiple - 1) // multiple) * multiple

    max_len = max(len(w) for w in waves)
    align = getattr(extractor, "frame_align", None)
    if align is not None:
        k, s, m = align
        frames = max(1, (max_len - k) // s + 1)
        frames = ((frames + m - 1) // m) * m
        max_len = (frames - 1) * s + k

    for i in range(0, len(waves), chunk):
        group = waves[i : i + chunk]
        bsz = ((len(group) + multiple - 1) // multiple) * multiple
        padded = np.zeros((bsz, max_len), np.float32)
        lengths = np.zeros((bsz,), np.int64)
        for j, w in enumerate(group):
            w = w[:max_len]
            padded[j, : len(w)] = w
            lengths[j] = len(w)
        ok = np.arange(bsz) < len(group)
        batch = Batch(
            paths=[f"<aug:{i + j}>" for j in range(len(group))],
            rows=list(range(len(group))),
            waves=padded, lengths=lengths, ok=ok,
            bucket_s=max_len / sr, sample_rate=sr,
        )
        embs = extractor(batch)
        for name in out:
            out[name].append(embs[name][: len(group)])
    return {name: np.concatenate(v) for name, v in out.items()}


def apply_data_augmentation(
    train_meta: pd.DataFrame,
    train_embeddings: dict[str, np.ndarray],
    extractor,
    augmentation_factor: int = 3,
    minority_threshold: int = 100,
    config: AugmentConfig | None = None,
    seed: int = 0,
) -> tuple[pd.DataFrame, dict[str, np.ndarray]]:
    """Augment minority classes and append re-extracted embeddings."""
    if "path" not in train_meta.columns:
        logger.warning("no audio file paths found; skipping data augmentation")
        return train_meta, train_embeddings
    if "label" not in train_meta.columns:
        logger.warning("no labels found; skipping data augmentation")
        return train_meta, train_embeddings

    class_counts = train_meta["label"].value_counts()
    minority = class_counts[class_counts < minority_threshold].index.tolist()
    logger.info("classes to augment (< %d samples): %s", minority_threshold, minority)
    if not minority:
        logger.info("no minority classes found; skipping augmentation")
        return train_meta, train_embeddings

    rng = random.Random(seed)
    aug_rows: list[pd.Series] = []
    aug_waves: list[np.ndarray] = []
    for class_name in minority:
        class_samples = train_meta[train_meta["label"] == class_name]
        logger.info("augmenting %d samples for class %r", len(class_samples), class_name)
        for _, row in class_samples.iterrows():
            original = load_audio(row["path"], target_sr=16000)
            if original is None:
                continue
            for aug_idx in range(augmentation_factor):
                try:
                    wave = augment_audio(original, 16000, "random", config=config, rng=rng)
                except Exception as e:  # noqa: BLE001 — skip-on-failure contract
                    logger.warning("failed to augment %s: %s", row["filename"], e)
                    continue
                meta = row.copy()
                meta["filename"] = f"{row['filename']}_aug_{aug_idx}"
                meta["augmented"] = True
                meta["augmentation_type"] = "mixed"
                aug_rows.append(meta)
                aug_waves.append(wave)

    if not aug_rows:
        logger.warning("no augmented samples were created")
        return train_meta, train_embeddings

    aug_embeddings = _embed_waves(extractor, aug_waves)
    combined_meta = pd.concat([train_meta, pd.DataFrame(aug_rows)], ignore_index=True)
    combined = {}
    for layer_name, original in train_embeddings.items():
        if layer_name in aug_embeddings:
            combined[layer_name] = np.vstack([original, aug_embeddings[layer_name]])
        else:
            combined[layer_name] = original
        logger.info(
            "combined %s: %d original + %d augmented = %d total",
            layer_name, len(original),
            len(combined[layer_name]) - len(original), len(combined[layer_name]),
        )
    logger.info("data augmentation complete: %d -> %d samples", len(train_meta), len(combined_meta))
    return combined_meta, combined
