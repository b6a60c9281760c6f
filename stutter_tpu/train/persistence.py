"""Trained-model + results persistence (reference C20).

Same artifact contract as the reference: joblib dump of the estimator plus a
JSON info sidecar (model_type, layer, classifier, metrics, date) —
``model_training_01.py:626-687``, ``model_training_1.py:761-825``. JAX heads
serialize their param pytree with joblib too (numpy arrays inside).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import joblib
import numpy as np

from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.persistence")


def _jsonable(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def save_model(
    model,
    results_dir: str,
    model_type: str,
    layer_name: str,
    classifier_name: str,
    metrics: dict | None = None,
    class_names: list | None = None,
) -> str:
    """Persist an estimator + JSON sidecar; returns the model path.

    ``class_names[i]`` is the human label for class index i — stored in the
    sidecar so the serving path (serve/classify.py) can answer with labels,
    not indices. The reference sidecar has no such field (its predictions
    never leave the training script), so it is optional for artifact parity.
    """
    os.makedirs(results_dir, exist_ok=True)
    base = f"{model_type}_{layer_name}_{classifier_name}"
    model_path = os.path.join(results_dir, f"{base}_model.joblib")
    joblib.dump(model, model_path)

    info = {
        "model_type": model_type,
        "layer": layer_name,
        "classifier": classifier_name,
        "date": datetime.now().isoformat(),
        "framework": "stutter_tpu",
    }
    if class_names is not None:
        info["class_names"] = [str(c) for c in class_names]
    if metrics:
        info["metrics"] = _jsonable(
            {k: v for k, v in metrics.items() if k not in ("confusion_matrix", "estimator")}
        )
    with open(os.path.join(results_dir, f"{base}_info.json"), "w") as f:
        json.dump(info, f, indent=2)
    logger.info("saved model to %s", model_path)
    return model_path


def load_model(model_path: str):
    return joblib.load(model_path)


def save_results(all_results: dict, results_dir: str, filename: str = "results.json") -> str:
    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir, filename)
    with open(path, "w") as f:
        json.dump(_jsonable(all_results), f, indent=2, default=str)
    logger.info("saved results to %s", path)
    return path
