"""Training drivers: per-layer sweep over the embedding store (reference C21).

``run_balanced_training`` mirrors ``model_training_01.py:689-969``: load the
.npy+CSV store -> positional train/eval split (test+devel as eval) ->
minority-class augmentation re-extraction (optional; needs a model) -> per
layer x classifier: SMOTE + fit + metrics -> plots, reports, model artifacts,
best-by-balanced-accuracy tracking -> global comparison CSVs + final summary.

``run_grid_training`` mirrors ``model_training_1.py:827-1121``: the
{Original, SMOTE} x {SVM,RF}x{Basic,Weighted} grid per layer, with
data-quality and class-distribution stages.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from stutter_tpu.extract.store import load_embeddings, load_embeddings_combined
from stutter_tpu.report.plots import (
    plot_confusion_matrices,
    plot_grid_comparison,
    plot_layer_comparison,
    plot_per_class_metrics,
)
from stutter_tpu.report.summaries import (
    write_classification_report,
    write_comparison_csv,
    write_final_summary,
    write_layer_summary,
)
from stutter_tpu.train.augment_extract import apply_data_augmentation
from stutter_tpu.train.classifiers import (
    GRID_MODELS,
    train_balanced_model,
    train_improved_models,
)
from stutter_tpu.train.data import positional_split, prepare_data, stratified_split
from stutter_tpu.train.persistence import save_model, save_results
from stutter_tpu.train.quality import analyze_class_distribution, check_data_quality
from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.trainer")


@dataclasses.dataclass
class TrainConfig:
    embeddings_dir: str
    results_dir: str
    model_type: str = "wavlm"
    classifiers: tuple[str, ...] = ("svm",)  # svm|rf|xgb|mlp|linear
    use_smote: bool = True
    smote_k_neighbors: int = 3
    augmentation_factor: int = 0  # 0 disables re-extraction augmentation
    minority_threshold: int = 100
    random_state: int = 42
    make_plots: bool = True
    head_overrides: dict | None = None  # HeadConfig fields for JAX heads
    split: str = "predefined"  # "predefined" | "train_test"
    test_size: float = 0.2


def _split_store(cfg: TrainConfig, metadata, embeddings, layer_names):
    """(train_meta, eval_meta, train_emb{}, eval_emb{}) per the split mode."""
    first = layer_names[0]
    if cfg.split == "train_test":
        from stutter_tpu.train.data import stratified_test_mask

        # one positional mask slices metadata and EVERY layer consistently
        mask = stratified_test_mask(metadata, cfg.test_size, cfg.random_state)
        train_meta = metadata[~mask].reset_index(drop=True)
        eval_meta = metadata[mask].reset_index(drop=True)
        train_embeddings = {k: v[~mask] for k, v in embeddings.items()}
        eval_embeddings = {k: v[mask] for k, v in embeddings.items()}
        return train_meta, eval_meta, train_embeddings, eval_embeddings
    train_meta, _, eval_meta, _ = positional_split(metadata, embeddings[first])
    train_embeddings = {k: v[: len(train_meta)] for k, v in embeddings.items()}
    eval_embeddings = {k: v[len(train_meta):] for k, v in embeddings.items()}
    return train_meta, eval_meta, train_embeddings, eval_embeddings


def _layer_sort_key(name: str):
    parts = name.rsplit("_", 1)
    return (parts[0], int(parts[1]) if parts[-1].isdigit() else 0)


def _load_store(cfg: TrainConfig):
    if cfg.model_type == "combined":
        return load_embeddings_combined(cfg.embeddings_dir)
    return load_embeddings(cfg.embeddings_dir, cfg.model_type)


def run_balanced_training(cfg: TrainConfig, extractor=None) -> dict:
    """The model_training_01 pipeline. Returns {layer: best-result dict}."""
    metadata, embeddings = _load_store(cfg)
    if metadata is None or not embeddings:
        raise FileNotFoundError(
            f"no embeddings found for {cfg.model_type} under {cfg.embeddings_dir}"
        )
    os.makedirs(cfg.results_dir, exist_ok=True)

    layer_names = sorted(embeddings, key=_layer_sort_key)
    train_meta, eval_meta, train_embeddings, eval_embeddings = _split_store(
        cfg, metadata, embeddings, layer_names
    )
    # label map over ALL splits (the reference fits its encoder on combined
    # labels, model_training_01.py:470-477) so eval-only classes don't crash
    from stutter_tpu.train.data import build_label_maps

    global_labels, _ = build_label_maps(metadata["label"]) if "label" in metadata else ({}, {})

    if cfg.augmentation_factor > 0:
        if extractor is None:
            logger.warning(
                "augmentation_factor=%d but no extractor provided; skipping "
                "augmentation re-extraction", cfg.augmentation_factor,
            )
        else:
            train_meta, train_embeddings = apply_data_augmentation(
                train_meta, train_embeddings, extractor,
                augmentation_factor=cfg.augmentation_factor,
                minority_threshold=cfg.minority_threshold,
                seed=cfg.random_state,
            )

    all_rows: list[dict] = []
    best_per_layer: dict[str, dict] = {}
    for layer in layer_names:
        logger.info("=== layer %s ===", layer)
        X_train, y_train, label_to_idx, idx_to_label = prepare_data(
            train_meta, train_embeddings[layer], label_to_idx=global_labels or None
        )
        X_eval, y_eval, _, _ = prepare_data(eval_meta, eval_embeddings[layer], label_to_idx)
        class_names = [str(idx_to_label[i]) for i in range(len(idx_to_label))]

        layer_best = None
        for clf_name in cfg.classifiers:
            model, results = train_balanced_model(
                X_train, y_train, X_eval, y_eval,
                classifier_type=clf_name, class_names=class_names,
                use_smote=cfg.use_smote, smote_k_neighbors=cfg.smote_k_neighbors,
                random_state=cfg.random_state, head_overrides=cfg.head_overrides,
            )
            tag = f"{layer}_{clf_name}"
            out_dir = os.path.join(cfg.results_dir, layer)
            if cfg.make_plots:
                plot_confusion_matrices(results["confusion_matrix"], class_names, out_dir, tag)
                plot_per_class_metrics(results["per_class"], out_dir, tag)
            write_classification_report(results, out_dir, tag)
            save_model(model, out_dir, cfg.model_type, layer, clf_name, results,
                       class_names=class_names)
            all_rows.append({
                "layer": layer, "classifier": clf_name,
                "accuracy": results["accuracy"],
                "balanced_accuracy": results["balanced_accuracy"],
                "weighted_f1": results["weighted_f1"],
                "macro_f1": results["macro_f1"],
            })
            if layer_best is None or results["balanced_accuracy"] > layer_best["balanced_accuracy"]:
                layer_best = results
        best_per_layer[layer] = layer_best

    write_comparison_csv(all_rows, cfg.results_dir)
    write_layer_summary(best_per_layer, cfg.results_dir)
    if cfg.make_plots:
        plot_layer_comparison(best_per_layer, cfg.results_dir)
    best_layer = max(best_per_layer, key=lambda k: best_per_layer[k]["balanced_accuracy"])
    write_final_summary(
        best_layer, best_per_layer[best_layer], best_per_layer,
        cfg.results_dir, cfg.model_type,
    )
    save_results(
        {k: {m: v for m, v in r.items() if m not in ("confusion_matrix", "estimator")}
         for k, r in best_per_layer.items()},
        cfg.results_dir, "best_per_layer.json",
    )
    return best_per_layer


def run_grid_training(cfg: TrainConfig, extractor=None, model_names=GRID_MODELS) -> dict:
    """The model_training_1 pipeline (grid trainer + quality stages)."""
    metadata, embeddings = _load_store(cfg)
    if metadata is None or not embeddings:
        raise FileNotFoundError(
            f"no embeddings found for {cfg.model_type} under {cfg.embeddings_dir}"
        )
    os.makedirs(cfg.results_dir, exist_ok=True)

    layer_names = sorted(embeddings, key=_layer_sort_key)
    train_meta, eval_meta, train_embeddings, eval_embeddings = _split_store(
        cfg, metadata, embeddings, layer_names
    )
    # label map over ALL splits (the reference fits its encoder on combined
    # labels, model_training_01.py:470-477) so eval-only classes don't crash
    from stutter_tpu.train.data import build_label_maps

    global_labels, _ = build_label_maps(metadata["label"]) if "label" in metadata else ({}, {})

    if cfg.augmentation_factor > 0:
        if extractor is None:
            logger.warning(
                "augmentation_factor=%d but no extractor provided; skipping "
                "augmentation re-extraction", cfg.augmentation_factor,
            )
        else:
            train_meta, train_embeddings = apply_data_augmentation(
                train_meta, train_embeddings, extractor,
                augmentation_factor=cfg.augmentation_factor,
                minority_threshold=cfg.minority_threshold,
                seed=cfg.random_state,
            )

    all_rows: list[dict] = []
    best_per_layer: dict[str, dict] = {}
    for layer in layer_names:
        logger.info("=== layer %s (grid) ===", layer)
        X_train, y_train, label_to_idx, idx_to_label = prepare_data(
            train_meta, train_embeddings[layer], label_to_idx=global_labels or None
        )
        X_eval, y_eval, _, _ = prepare_data(eval_meta, eval_embeddings[layer], label_to_idx)
        class_names = [str(idx_to_label[i]) for i in range(len(idx_to_label))]

        check_data_quality(X_train, y_train)
        analyze_class_distribution(y_train, idx_to_label)

        grid = train_improved_models(
            X_train, y_train, X_eval, y_eval, class_names=class_names,
            smote_k_neighbors=cfg.smote_k_neighbors, random_state=cfg.random_state,
            model_names=model_names, include_smote=cfg.use_smote,
        )
        out_dir = os.path.join(cfg.results_dir, layer)
        if cfg.make_plots:
            plot_grid_comparison(grid, out_dir, tag=f"{layer}_model_comparison")
        best_key = max(grid, key=lambda k: grid[k]["balanced_accuracy"])
        best = grid[best_key]
        if cfg.make_plots:
            plot_confusion_matrices(best["confusion_matrix"], class_names, out_dir, best_key)
        write_classification_report(best, out_dir, best_key)
        save_model(best["estimator"], out_dir, cfg.model_type, layer, best_key, best,
                   class_names=class_names)
        for key, r in grid.items():
            all_rows.append({
                "layer": layer, "configuration": key,
                "accuracy": r["accuracy"],
                "balanced_accuracy": r["balanced_accuracy"],
                "weighted_f1": r["weighted_f1"],
                "macro_f1": r["macro_f1"],
            })
        best_per_layer[layer] = {k: v for k, v in best.items() if k != "estimator"}
        best_per_layer[layer]["configuration"] = best_key

    write_comparison_csv(all_rows, cfg.results_dir)
    write_layer_summary(best_per_layer, cfg.results_dir)
    if cfg.make_plots:
        plot_layer_comparison(best_per_layer, cfg.results_dir)
    best_layer = max(best_per_layer, key=lambda k: best_per_layer[k]["balanced_accuracy"])
    write_final_summary(
        best_layer, best_per_layer[best_layer], best_per_layer,
        cfg.results_dir, cfg.model_type,
    )
    return best_per_layer
