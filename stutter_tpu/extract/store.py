"""The .npy+CSV embedding store — the reference's single most important API.

Write side parity: ``save_embeddings`` (``WavLM_embeddings.py:343-387``) —
per split, ``embedding_metadata.csv`` holds every non-``layer_``/embedding
column; each embedding column becomes ``{name}_embeddings.npy`` (row-stacked,
row order == metadata order), with an expected-dim audit.

Read side parity: ``load_data`` (``model_training_01.py:72-138``) — reads all
three splits, tags the split column, and vstacks each layer's arrays in
train -> test -> devel order (downstream slicing is positional, so the order
is part of the contract).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from stutter_tpu.utils.logging import get_logger

logger = get_logger("extract.store")

SPLIT_ORDER = ("train", "test", "devel")


def _is_embedding_col(col: str) -> bool:
    return col.startswith(("layer_", "encoder_layer_", "decoder_layer_"))


def save_embeddings(
    embeddings_df: pd.DataFrame,
    output_dir: str,
    split: str | None = None,
    expected_dim: int | None = None,
) -> None:
    """Persist one split's embeddings: metadata CSV + one .npy per layer."""
    if len(embeddings_df) == 0:
        logger.warning("no embeddings to save")
        return
    split_dir = os.path.join(output_dir, split) if split and split != "all" else output_dir
    os.makedirs(split_dir, exist_ok=True)

    metadata_cols = [c for c in embeddings_df.columns if not _is_embedding_col(c)]
    embeddings_df[metadata_cols].to_csv(
        os.path.join(split_dir, "embedding_metadata.csv"), index=False
    )
    logger.info("saved metadata for %d files to %s", len(embeddings_df), split_dir)

    for col in [c for c in embeddings_df.columns if _is_embedding_col(c)]:
        arr = np.stack([np.asarray(v) for v in embeddings_df[col].values])
        if expected_dim is not None and arr.shape[-1] != expected_dim:
            logger.warning(
                "WARNING: %s has dimension %d but expected %d", col, arr.shape[-1], expected_dim
            )
        np.save(os.path.join(split_dir, f"{col}_embeddings.npy"), arr)
        logger.info("saved %s embeddings with shape %s", col, arr.shape)


def load_embeddings_combined(
    embeddings_dir: str,
    parts: tuple[str, ...] = ("wavlm", "whisper"),
    splits: tuple[str, ...] = SPLIT_ORDER,
) -> tuple[pd.DataFrame | None, dict[str, np.ndarray]]:
    """Multi-model fusion store: align rows by (filename, split), expose each
    part's layers prefixed plus a concatenated top-layer feature.

    The reference CLI accepts ``--model_type combined`` but has no
    implementation (``model_training_01.py:49-51`` vs ``:737-753``); this is
    the working version.
    """
    metas, layer_sets = [], []
    for part in parts:
        meta, layers = load_embeddings(embeddings_dir, part, splits)
        if meta is None or not layers:
            logger.error("combined store: missing part %r under %s", part, embeddings_dir)
            return None, {}
        metas.append(meta)
        layer_sets.append(layers)

    # align on the first part's row order; (filename, split) must be unique
    # per part or rows could pair with the wrong embeddings — dedupe with a
    # warning (keep first, matching the stores' row order)
    def dedupe(meta, layers, part):
        dup = meta.duplicated(["filename", "split"], keep="first").to_numpy()
        if dup.any():
            logger.warning("combined store: part %r has %d duplicate "
                           "(filename, split) rows; keeping first", part, int(dup.sum()))
            meta = meta[~dup].reset_index(drop=True)
            layers = {k: v[~dup] for k, v in layers.items()}
        return meta, layers

    base, base_layers = dedupe(metas[0], layer_sets[0], parts[0])
    out_layers: dict[str, np.ndarray] = {f"{parts[0]}_{k}": v for k, v in base_layers.items()}
    keep = np.ones(len(base), bool)
    for part, meta, layers in zip(parts[1:], metas[1:], layer_sets[1:]):
        meta, layers = dedupe(meta.copy(), layers, part)
        meta["_other_row"] = np.arange(len(meta))
        joined = base.merge(meta[["filename", "split", "_other_row"]],
                            on=["filename", "split"], how="left")
        matched = joined["_other_row"].notna().to_numpy()
        keep &= matched
        idx = joined["_other_row"].fillna(0).to_numpy(np.int64)
        for k, v in layers.items():
            out_layers[f"{part}_{k}"] = v[idx]
    if not keep.all():
        logger.warning("combined store: dropping %d rows missing in some part",
                       int((~keep).sum()))
        base = base[keep].reset_index(drop=True)
        out_layers = {k: v[keep] for k, v in out_layers.items()}

    # concatenated top-layer fusion feature
    tops = [out_layers[f"{p}_{combined_top_key(layer_sets[i])}"]
            for i, p in enumerate(parts)]
    out_layers["combined_top"] = np.hstack(tops)
    return base, out_layers


def combined_top_key(columns) -> str:
    """The per-part 'top' layer feeding ``combined_top``: the highest-numbered
    non-decoder column. Shared by the fusion store above and the combined
    serving extractor (serve/combined.py) so the two can't drift."""

    def num(k):
        tail = k.rsplit("_", 1)[-1]
        return int(tail) if tail.isdigit() else -1

    pref = [k for k in columns if not k.startswith("decoder_")] or list(columns)
    return max(pref, key=num)


def load_embeddings(
    embeddings_dir: str,
    model_type: str,
    splits: tuple[str, ...] = SPLIT_ORDER,
) -> tuple[pd.DataFrame | None, dict[str, np.ndarray]]:
    """Load the predefined-split store: (metadata df with 'split', {layer: X}).

    Row order of each layer array matches the concatenated metadata rows
    (train -> test -> devel) — downstream consumers slice positionally.
    """
    # reference uses a substring heuristic (`model_type in embeddings_dir`,
    # model_training_01.py:75-77) that misfires on paths merely containing the
    # model name; resolve by directory existence instead
    candidate = os.path.join(embeddings_dir, model_type)
    model_dir = candidate if os.path.isdir(candidate) else embeddings_dir
    if not os.path.isdir(model_dir):
        logger.error("embeddings directory for %s not found: %s", model_type, model_dir)
        return None, {}

    frames = []
    per_split_layers: dict[str, list[np.ndarray]] = {}
    for sub in splits:
        split_dir = os.path.join(model_dir, sub)
        meta_path = os.path.join(split_dir, "embedding_metadata.csv")
        if not os.path.exists(meta_path):
            logger.error("metadata file not found for %s: %s", sub, meta_path)
            return None, {}
        df = pd.read_csv(meta_path)
        df["split"] = sub
        frames.append(df)

        files = sorted(f for f in os.listdir(split_dir) if f.endswith("_embeddings.npy"))
        for f in files:
            layer = f[: -len("_embeddings.npy")]
            per_split_layers.setdefault(layer, []).append(np.load(os.path.join(split_dir, f)))

    metadata = pd.concat(frames, ignore_index=True)
    layers = {k: np.vstack(v) if len(v) > 1 else v[0] for k, v in per_split_layers.items()}
    for k, v in layers.items():
        if len(v) != len(metadata):
            logger.warning("layer %s rows (%d) != metadata rows (%d)", k, len(v), len(metadata))
    return metadata, layers
