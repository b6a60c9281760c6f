"""Training data preparation (reference C16).

``prepare_data`` (``model_training_01.py:420-452``): align metadata labels
with embedding rows (dropping rows with missing labels), build label<->index
maps. The train/test slicing is POSITIONAL over the loader's
train -> test -> devel vstack order (``model_training_01.py:781-789`` slices
``emb[:n_train]`` / ``emb[n_train:]``); ``positional_split`` makes that
contract explicit. The reference treats test+devel together as the eval set
(``model_training_01.py:719-728``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.data")


def build_label_maps(labels) -> tuple[dict, dict]:
    classes = sorted(pd.unique(pd.Series(labels).dropna()), key=str)
    label_to_idx = {c: i for i, c in enumerate(classes)}
    idx_to_label = {i: c for c, i in label_to_idx.items()}
    return label_to_idx, idx_to_label


def prepare_data(
    metadata: pd.DataFrame,
    embeddings: np.ndarray,
    label_to_idx: dict | None = None,
) -> tuple[np.ndarray, np.ndarray, dict, dict]:
    """Return (X, y, label_to_idx, idx_to_label) for valid-label rows."""
    if len(metadata) != len(embeddings):
        logger.warning(
            "metadata rows (%d) != embedding rows (%d); truncating to min",
            len(metadata), len(embeddings),
        )
        n = min(len(metadata), len(embeddings))
        metadata = metadata.iloc[:n]
        embeddings = embeddings[:n]

    valid = metadata["label"].notna().to_numpy()
    if label_to_idx is None:
        label_to_idx, idx_to_label = build_label_maps(metadata["label"])
    else:
        idx_to_label = {i: c for c, i in label_to_idx.items()}
        # labels absent from the supplied map (e.g. a class only present in
        # eval) would NaN->INT64_MIN through .map; drop them with a warning
        known = metadata["label"].isin(label_to_idx).to_numpy()
        unknown = valid & ~known
        if unknown.any():
            logger.warning(
                "dropping %d rows with labels outside the training label map: %s",
                int(unknown.sum()),
                sorted(set(metadata.loc[unknown, "label"].astype(str)))[:5],
            )
        valid = valid & known

    X = np.asarray(embeddings)[valid]
    y = metadata.loc[valid, "label"].map(label_to_idx).to_numpy(dtype=np.int64)
    logger.info("prepared %d samples, %d classes", len(y), len(label_to_idx))
    return X, y, label_to_idx, idx_to_label


def stratified_test_mask(
    metadata: pd.DataFrame, test_size: float = 0.2, seed: int = 42
) -> np.ndarray:
    """Boolean test-row mask for a stratified split (positional, so callers
    can slice every embedding layer consistently)."""
    rng = np.random.RandomState(seed)
    labels = metadata["label"].fillna("__nan__").to_numpy()
    test_idx: list[int] = []
    for cls in pd.unique(labels):
        idx = np.flatnonzero(labels == cls)
        rng.shuffle(idx)
        n_test = max(1, int(round(len(idx) * test_size))) if len(idx) > 1 else 0
        test_idx.extend(idx[:n_test])
    mask = np.zeros(len(metadata), bool)
    mask[test_idx] = True
    return mask


def stratified_split(
    metadata: pd.DataFrame,
    embeddings: np.ndarray,
    test_size: float = 0.2,
    seed: int = 42,
) -> tuple[pd.DataFrame, np.ndarray, pd.DataFrame, np.ndarray]:
    """Manual stratified train/test split (the reference's ``--split
    train_test`` mode, which its loader accepts but never implements —
    ``model_training_01.py:136-138`` errors out; implemented properly here).
    """
    test_mask = stratified_test_mask(metadata, test_size, seed)
    train_meta = metadata[~test_mask].reset_index(drop=True)
    test_meta = metadata[test_mask].reset_index(drop=True)
    logger.info("stratified split: %d train / %d test", len(train_meta), len(test_meta))
    return train_meta, embeddings[~test_mask], test_meta, embeddings[test_mask]


def positional_split(
    metadata: pd.DataFrame, embeddings: np.ndarray
) -> tuple[pd.DataFrame, np.ndarray, pd.DataFrame, np.ndarray]:
    """Split loader output by split column using the positional contract.

    train rows form the training set; test+devel rows form the eval set
    (reference model_training_01.py:719-728,781-789).
    """
    splits = metadata["split"].to_numpy()
    train_mask = splits == "train"
    n_train = int(train_mask.sum())
    # the contract: train rows are the leading block
    assert train_mask[:n_train].all(), "loader order violated: train rows not leading"
    train_meta = metadata.iloc[:n_train].reset_index(drop=True)
    eval_meta = metadata.iloc[n_train:].reset_index(drop=True)
    return train_meta, embeddings[:n_train], eval_meta, embeddings[n_train:]
