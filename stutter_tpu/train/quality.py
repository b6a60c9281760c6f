"""Data-quality reporting (reference ``model_training_1.py:466-540``).

``check_data_quality``: NaN/inf counts, feature stats, row/label alignment.
``analyze_class_distribution``: counts + imbalance ratio per class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.quality")


def check_data_quality(X: np.ndarray, y: np.ndarray) -> dict:
    X = np.asarray(X)
    report = {
        "n_samples": int(len(X)),
        "n_features": int(X.shape[1]) if X.ndim > 1 else 1,
        "nan_count": int(np.isnan(X).sum()),
        "inf_count": int(np.isinf(X).sum()),
        "feature_mean": float(np.nanmean(X)),
        "feature_std": float(np.nanstd(X)),
        "rows_match_labels": bool(len(X) == len(y)),
    }
    logger.info("data quality: %s", report)
    if report["nan_count"] or report["inf_count"]:
        logger.warning(
            "found %d NaN and %d inf values in features",
            report["nan_count"], report["inf_count"],
        )
    return report


def analyze_class_distribution(y, idx_to_label: dict | None = None) -> pd.DataFrame:
    y = pd.Series(list(y))
    counts = y.value_counts().sort_index()
    total = len(y)
    rows = []
    for cls, count in counts.items():
        name = idx_to_label.get(cls, cls) if idx_to_label else cls
        rows.append({
            "class": name,
            "count": int(count),
            "fraction": count / total,
            "imbalance_ratio": float(counts.max() / count),
        })
    df = pd.DataFrame(rows)
    logger.info("class distribution:\n%s", df.to_string(index=False))
    return df
