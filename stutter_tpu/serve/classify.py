"""Serving-side classification: trained downstream heads over served embeddings.

Closes the reference's loop at serve time. The reference trains per-layer
classifiers (``model_training_01.py:454-563``) and persists them
(``model_training_01.py:656-687``) but offers no way to apply them to new
audio. Here a persisted model — the ``train/persistence.py`` artifact pair
(joblib estimator + ``*_info.json`` sidecar) — rides on top of
``EmbeddingServer``: each request's response carries the predicted
stutter-class label (and per-class probabilities when the estimator exposes
them) computed from the same embedding column the model was trained on.
"""

from __future__ import annotations

import json
import os

import numpy as np

from stutter_tpu.utils.logging import get_logger

logger = get_logger("serve.classify")


def sidecar_path(model_path: str) -> str:
    """``{base}_model.joblib`` → ``{base}_info.json`` (the C20 artifact pair)."""
    base = model_path
    if base.endswith("_model.joblib"):
        base = base[: -len("_model.joblib")]
    else:
        base = os.path.splitext(base)[0]
    return base + "_info.json"


class ServingClassifier:
    """A trained estimator bound to the embedding column it was trained on.

    ``estimator`` is anything with sklearn's predict API (sklearn Pipeline,
    HistGB, or a ``train.heads.JaxClassifier``); ``layer`` names the served
    embedding column (e.g. ``layer_23`` / ``encoder_layer_31``) whose vectors
    the estimator consumes; ``class_names[i]`` is the human label for class
    index i (falls back to ``str(i)`` when the sidecar predates the field).
    """

    def __init__(self, estimator, layer: str, class_names: list[str] | None = None):
        self.estimator = estimator
        self.layer = layer
        self.class_names = [str(c) for c in class_names] if class_names else None

    @classmethod
    def load(cls, model_path: str) -> "ServingClassifier":
        """Load a ``save_model`` artifact; the sidecar supplies layer + labels."""
        import joblib

        estimator = joblib.load(model_path)
        info_path = sidecar_path(model_path)
        layer, class_names = None, None
        if os.path.exists(info_path):
            with open(info_path) as f:
                info = json.load(f)
            layer = info.get("layer")
            class_names = info.get("class_names")
        if layer is None:
            raise ValueError(
                f"cannot determine the embedding column for {model_path}: "
                f"no 'layer' in {info_path}"
            )
        logger.info(
            "loaded classifier %s (layer=%s, classes=%s)",
            model_path, layer, class_names,
        )
        return cls(estimator, layer, class_names)

    def _name(self, idx) -> str:
        i = int(idx)
        if self.class_names and 0 <= i < len(self.class_names):
            return self.class_names[i]
        return str(idx)

    def predict_rows(
        self, X: np.ndarray
    ) -> tuple[list[str], list[dict[str, float]] | None]:
        """Predict a [n, D] batch → (labels, per-class prob dicts or None)."""
        X = np.asarray(X, np.float32)
        pred = np.asarray(self.estimator.predict(X))
        labels = [self._name(p) for p in pred]
        probs = None
        proba_fn = getattr(self.estimator, "predict_proba", None)
        if proba_fn is not None:
            try:
                P = np.asarray(proba_fn(X), np.float64)
                # column i of predict_proba corresponds to estimator.classes_[i]
                # (sklearn contract); JaxClassifier's columns are class indices
                classes = getattr(self.estimator, "classes_", None)
                if classes is None:
                    classes = np.arange(P.shape[1])
                probs = [
                    {self._name(c): float(P[r, j]) for j, c in enumerate(classes)}
                    for r in range(P.shape[0])
                ]
            except Exception:  # noqa: BLE001 — e.g. SVC without probability=True
                logger.debug("predict_proba unavailable; serving labels only")
        return labels, probs

    def classify_embeddings(
        self, embeddings: dict[str, np.ndarray]
    ) -> tuple[str, dict[str, float] | None]:
        """Classify one request's column→vector dict (the Response payload)."""
        if self.layer not in embeddings:
            raise KeyError(
                f"served embeddings have no column '{self.layer}' "
                f"(columns: {sorted(embeddings)})"
            )
        labels, probs = self.predict_rows(embeddings[self.layer][None, :])
        return labels[0], probs[0] if probs else None
