"""Downstream classifier training (reference C17 + C18).

Two trainer surfaces mirrored from the reference:

- ``train_balanced_model`` (``model_training_01.py:454-563``): SMOTE ->
  Pipeline(StandardScaler -> clf) -> balanced-accuracy/F1 metric bundle, for
  one classifier choice.
- ``train_improved_models`` (``model_training_1.py:630-725``): the
  {Original, SMOTE} x {SVM_Basic, SVM_Weighted, RF_Basic, RF_Weighted} grid,
  skipping Weighted-on-SMOTE.

Backend registry (TPU-first): 'mlp'/'linear' are JAX heads trained on device
(the primary path, BASELINE config[1]); 'svm'/'rf' use sklearn for exact
reference parity (CPU, hyperparameters mirrored: SVC(rbf, C=10), RF(100));
'xgb' uses xgboost when importable, else sklearn HistGradientBoosting as a
documented stand-in (xgboost is absent in this environment).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from stutter_tpu.train.heads import HeadConfig, JaxClassifier
from stutter_tpu.train.metrics import classification_metrics
from stutter_tpu.train.smote import apply_smote_oversampling
from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.classifiers")


class LabelEncodedClassifier:
    """LabelEncoder round-trip wrapper (reference ``model_training_01.py:
    470-523``): XGBClassifier requires contiguous 0..K-1 integer labels, so
    the reference encodes y before fit and inverse-transforms predictions
    back to the original label space. Applied uniformly to the 'xgb' backend
    (real xgboost or the HistGB stand-in) so an xgboost-present environment
    is drop-in with identical label semantics."""

    def __init__(self, base):
        self.base = base
        self.label_encoder_ = None

    def fit(self, X, y):
        from sklearn.preprocessing import LabelEncoder

        self.label_encoder_ = LabelEncoder()
        y_enc = self.label_encoder_.fit_transform(np.asarray(y))
        logger.info(
            "Encoded %d classes for XGBoost: %s",
            len(self.label_encoder_.classes_), self.label_encoder_.classes_,
        )
        self.base.fit(X, y_enc)
        return self

    def predict(self, X):
        y_enc = np.asarray(self.base.predict(X), np.int64)
        return self.label_encoder_.inverse_transform(y_enc)

    def predict_proba(self, X):
        return self.base.predict_proba(X)

    @property
    def classes_(self):
        """Original labels in encoded-column order (sklearn contract).

        predict_proba's columns follow the ENCODED indices; without this,
        consumers that map columns to labels (serve/classify.py) would key
        probabilities by raw column position — wrong whenever the trained
        label set is non-contiguous (e.g. a class present only in eval)."""
        return self.label_encoder_.classes_


def make_classifier(
    classifier_type: str,
    n_features: int,
    n_classes: int,
    class_weight: str | None = "balanced",
    random_state: int = 42,
    head_overrides: dict | None = None,
):
    """Build an sklearn-style estimator for the given backend name.

    sklearn backends get wrapped in Pipeline(StandardScaler, clf) to mirror
    the reference exactly; JAX backends scale internally. head_overrides are
    extra HeadConfig fields (epochs, learning_rate, ...) for the JAX heads.
    """
    overrides = dict(head_overrides or {})
    if classifier_type in ("mlp", "jax_mlp"):
        overrides.setdefault("hidden_dims", (256,))
        return JaxClassifier(
            HeadConfig(in_dim=n_features, n_classes=n_classes, seed=random_state,
                       **overrides),
            class_weight=class_weight,
        )
    if classifier_type in ("linear", "logreg"):
        overrides.setdefault("hidden_dims", ())
        return JaxClassifier(
            HeadConfig(in_dim=n_features, n_classes=n_classes, seed=random_state,
                       **overrides),
            class_weight=class_weight,
        )

    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler as SkScaler

    if classifier_type == "svm":
        from sklearn.svm import SVC

        clf = SVC(kernel="rbf", C=10, class_weight=class_weight, random_state=random_state)
    elif classifier_type == "rf":
        from sklearn.ensemble import RandomForestClassifier

        clf = RandomForestClassifier(
            n_estimators=100, class_weight=class_weight, random_state=random_state, n_jobs=-1
        )
    elif classifier_type == "xgb":
        try:
            from xgboost import XGBClassifier

            clf = XGBClassifier(
                n_estimators=100, max_depth=6, learning_rate=0.1, random_state=random_state
            )
        except ImportError:
            from sklearn.ensemble import HistGradientBoostingClassifier

            logger.warning(
                "xgboost not installed; using sklearn HistGradientBoosting as the "
                "'xgb' backend (same gradient-boosted-trees capability)"
            )
            clf = HistGradientBoostingClassifier(
                max_iter=100, max_depth=6, learning_rate=0.1, random_state=random_state
            )
    else:
        raise ValueError(f"unknown classifier type: {classifier_type!r}")
    pipeline = Pipeline([("scaler", SkScaler()), ("clf", clf)])
    if classifier_type == "xgb":
        return LabelEncodedClassifier(pipeline)
    return pipeline


def train_balanced_model(
    X_train: np.ndarray,
    y_train: np.ndarray,
    X_test: np.ndarray,
    y_test: np.ndarray,
    classifier_type: str = "svm",
    class_names: list[str] | None = None,
    use_smote: bool = True,
    smote_k_neighbors: int = 3,
    random_state: int = 42,
    head_overrides: dict | None = None,
) -> tuple[Any, dict]:
    """SMOTE -> scale -> fit -> metric bundle (reference C17)."""
    n_classes = len(class_names) if class_names else int(max(y_train.max(), y_test.max())) + 1
    if use_smote:
        X_train, y_train = apply_smote_oversampling(
            X_train, y_train, k_neighbors=smote_k_neighbors, random_state=random_state
        )
    model = make_classifier(
        classifier_type, X_train.shape[1], n_classes,
        class_weight="balanced", random_state=random_state,
        head_overrides=head_overrides,
    )
    logger.info("training %s on %d samples x %d dims", classifier_type, *X_train.shape)
    model.fit(X_train, np.asarray(y_train))
    y_pred = model.predict(X_test)
    results = classification_metrics(y_test, y_pred, n_classes, class_names)
    results["classifier"] = classifier_type
    results["used_smote"] = use_smote
    logger.info(
        "%s: balanced_acc=%.4f weighted_f1=%.4f macro_f1=%.4f",
        classifier_type, results["balanced_accuracy"],
        results["weighted_f1"], results["macro_f1"],
    )
    return model, results


GRID_MODELS = ("SVM_Basic", "SVM_Weighted", "RF_Basic", "RF_Weighted")
# TPU-native extension of the reference grid (JAX heads, trained on device)
GRID_MODELS_JAX = ("Linear_Weighted", "MLP_Weighted")


def _grid_estimator(name: str, n_features: int, n_classes: int, random_state: int):
    base, variant = name.split("_")
    cw = "balanced" if variant == "Weighted" else None
    kind = {"SVM": "svm", "RF": "rf", "Linear": "linear", "MLP": "mlp"}[base]
    return make_classifier(kind, n_features, n_classes, class_weight=cw,
                           random_state=random_state)


def train_improved_models(
    X_train: np.ndarray,
    y_train: np.ndarray,
    X_test: np.ndarray,
    y_test: np.ndarray,
    class_names: list[str] | None = None,
    smote_k_neighbors: int = 5,
    random_state: int = 42,
    model_names: tuple[str, ...] = GRID_MODELS,
    include_smote: bool = True,
) -> dict[str, dict]:
    """{Original, SMOTE} x model grid, skipping Weighted-on-SMOTE (C18)."""
    n_classes = len(class_names) if class_names else int(max(y_train.max(), y_test.max())) + 1
    datasets = {"Original": (X_train, y_train)}
    if include_smote:
        Xs, ys = apply_smote_oversampling(
            X_train, y_train, k_neighbors=smote_k_neighbors, random_state=random_state
        )
        datasets["SMOTE"] = (Xs, ys)

    results: dict[str, dict] = {}
    for data_name, (Xd, yd) in datasets.items():
        for model_name in model_names:
            if data_name == "SMOTE" and "Weighted" in model_name:
                continue  # class weights + SMOTE double-corrects (reference :670-672)
            key = f"{data_name}_{model_name}"
            model = _grid_estimator(model_name, Xd.shape[1], n_classes, random_state)
            logger.info("training %s", key)
            model.fit(Xd, np.asarray(yd))
            y_pred = model.predict(X_test)
            r = classification_metrics(y_test, y_pred, n_classes, class_names)
            r["model"] = model_name
            r["data"] = data_name
            r["estimator"] = model
            results[key] = r
            logger.info(
                "%s: acc=%.4f balanced_acc=%.4f weighted_f1=%.4f",
                key, r["accuracy"], r["balanced_accuracy"], r["weighted_f1"],
            )
    return results
