"""Batch prediction CLI: audio corpus -> embeddings -> trained classifier -> CSV.

No reference equivalent — the reference trains and persists per-layer
classifiers (``model_training_01.py:656-687``) but never applies them to new
audio. ``cli/serve.py`` closes that loop live per request; this closes it for
a whole corpus in one pass:

    python -m stutter_tpu.cli.predict \
      --audio_dir /data/new_clips \
      --classifier_model results/wavlm/svm_layer_23_model.joblib \
      --model_type wavlm_large --output predictions.csv

Three input modes (exactly one):
- ``--data_dir``: a KSF-layout corpus (wav/ + lab/); any labels found ride
  into the output CSV and a balanced-accuracy line is logged.
- ``--audio_dir``: a flat/recursive directory of audio files, no labels.
- ``--embeddings_dir``: an existing extraction store (skip the backbone
  entirely and classify the stored vectors).

The classifier artifact is the C20 pair (joblib estimator +
``*_info.json`` sidecar naming the layer column and class names);
``--model_type combined`` extracts both backbones and classifies the fusion
store's columns (incl. ``combined_top``).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np
import pandas as pd

from stutter_tpu.cli.common import add_mesh_args, build_mesh
from stutter_tpu.utils.logging import setup_logging

MODEL_TYPES = ["wavlm", "wavlm_large", "whisper", "whisper_large_fixed", "combined"]
_SPLIT_DIRS = ("train", "test", "devel", "predict", "unknown")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Apply a trained stutter classifier to a corpus of audio"
    )
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--data_dir", type=str, default=None,
                     help="KSF-layout corpus (wav/ + lab/); labels, when "
                          "present, are carried into the output and scored")
    src.add_argument("--audio_dir", type=str, default=None,
                     help="Directory of audio files (recursive, no labels)")
    src.add_argument("--embeddings_dir", type=str, default=None,
                     help="Existing extraction store: classify stored "
                          "vectors, no backbone forward")
    parser.add_argument("--classifier_model", type=str, required=True,
                        help="Trained artifact: {...}_model.joblib with its "
                             "_info.json sidecar (train/persistence.py)")
    parser.add_argument("--output", type=str, default="predictions.csv",
                        help="Prediction CSV path")
    parser.add_argument("--model_type", type=str, default="wavlm_large",
                        choices=MODEL_TYPES)
    parser.add_argument("--model_name", type=str, default=None,
                        help="HF checkpoint path/name (default by model_type; "
                             "for 'combined' this names the WavLM part)")
    parser.add_argument("--whisper_model_name", type=str,
                        default="openai/whisper-large",
                        help="'combined' only: the Whisper part's checkpoint")
    parser.add_argument("--keep_embeddings_dir", type=str, default=None,
                        help="Persist the intermediate extraction store here "
                             "(default: a temp dir)")
    parser.add_argument("--batch_size", type=int, default=128,
                        help="Max clips per device batch")
    parser.add_argument("--audio_budget", type=float, default=240.0,
                        help="Audio seconds per device batch")
    parser.add_argument("--max_length", type=float, default=None,
                        help="Maximum audio length in seconds (longer trimmed)")
    parser.add_argument("--long_files", type=str, default="trim",
                        choices=["trim", "chunk"])
    parser.add_argument("--random_init", action="store_true",
                        help="Fresh backbone weights (offline smoke runs)")
    add_mesh_args(parser)
    return parser.parse_args(argv)


def _scan_audio_dir(audio_dir: str) -> pd.DataFrame:
    """Flat/recursive clip directory -> metadata with split='predict'."""
    from stutter_tpu.extract.scanner import _AUDIO_EXTS

    rows = []
    for root, _dirs, files in os.walk(audio_dir):
        for f in sorted(files):
            stem, ext = os.path.splitext(f)
            if ext.lower() in _AUDIO_EXTS:
                rows.append({"filename": stem, "path": os.path.join(root, f),
                             "split": "predict"})
    return pd.DataFrame(rows)


def _present_splits(model_dir: str, restrict=None) -> tuple[str, ...]:
    """Split subdirs of a store that actually hold a metadata CSV.

    ``restrict`` limits the scan to the named splits — used when this run
    just extracted the corpus, so a reused ``--keep_embeddings_dir`` holding
    stale split dirs from an earlier corpus can't contaminate the output.
    """
    names = _SPLIT_DIRS if restrict is None else tuple(restrict)
    return tuple(
        s for s in names
        if os.path.exists(os.path.join(model_dir, s, "embedding_metadata.csv"))
    )


def _load_store(embeddings_dir: str, model_type: str, logger, restrict=None):
    """(metadata, {layer: X}) from an existing store, any subset of splits."""
    from stutter_tpu.extract.store import load_embeddings, load_embeddings_combined

    if model_type == "combined":
        part_dir = os.path.join(embeddings_dir, "wavlm")
        splits = _present_splits(part_dir, restrict)
        if not splits:
            logger.error("combined store: no splits under %s", part_dir)
            return None, {}
        return load_embeddings_combined(embeddings_dir, splits=splits)
    candidate = os.path.join(embeddings_dir, model_type)
    model_dir = candidate if os.path.isdir(candidate) else embeddings_dir
    splits = _present_splits(model_dir, restrict)
    if not splits:
        logger.error("no split directories with metadata under %s", model_dir)
        return None, {}
    return load_embeddings(embeddings_dir, model_type, splits=splits)


def _extract_corpus(args, metadata: pd.DataFrame, out_root: str, logger) -> bool:
    """Run the extraction pipeline(s) into out_root (fusion layout for
    'combined': one subdir per part, exactly what the train CLI reads)."""
    from stutter_tpu.cli.common import default_model_name, make_bucket_batcher
    from stutter_tpu.cli.train import build_extractor_for
    from stutter_tpu.extract import ExtractionPipeline

    mesh = build_mesh(args)
    name = default_model_name(args.model_type, args.model_name)
    if args.model_type == "combined":
        # per-part max_length: the whisper part keeps its native 30 s window
        # (extract_whisper has no --max_length flag, so training-time whisper
        # embeddings always chunked/trimmed at 30 s — predict must match or
        # the classifier sees differently-windowed whisper features; the
        # model pads to 30 s on device anyway, so a shorter window only
        # multiplies forwards). --max_length governs the wavlm part.
        parts = [("wavlm", name, args.max_length),
                 ("whisper", args.whisper_model_name, None)]
    else:
        # same per-part policy in single-model mode: whisper-only predict
        # must keep the native 30 s window too (a --max_length here would
        # window whisper features differently from the extract_whisper-built
        # training store — the exact mismatch the combined branch avoids)
        part_max = None if args.model_type.startswith("whisper") else args.max_length
        if args.model_type.startswith("whisper") and args.max_length:
            logger.warning("--max_length is ignored for whisper predict: "
                           "training-time whisper embeddings use the native "
                           "30 s window (extract_whisper has no --max_length)")
        parts = [(args.model_type, name, part_max)]

    splits = [s for s in metadata["split"].unique() if isinstance(s, str)]
    for part_type, part_name, part_max_len in parts:
        extractor = build_extractor_for(part_type, part_name, args.random_init,
                                        mesh, args.preset)
        if extractor is None:
            logger.error("unsupported model_type %s", part_type)
            return False
        batcher = make_bucket_batcher(
            extractor, mesh, audio_budget_s=args.audio_budget,
            max_batch=args.batch_size, max_length_s=part_max_len,
        )
        pipe = ExtractionPipeline(extractor, batcher=batcher,
                                  long_file_policy=args.long_files)
        # fusion layout: {root}/{part}/{split}; single model: {root}/{split}
        # (load_embeddings resolves either, matching the train CLI)
        dest = os.path.join(out_root, part_type if args.model_type == "combined"
                            else args.model_type)
        # a reused --keep_embeddings_dir may hold a SAME-NAMED split from an
        # earlier corpus: clear its stale layer .npy files before rewriting,
        # or load_embeddings' directory scan would pick up layer columns this
        # extraction never wrote (row-count mismatch downstream)
        for split in splits:
            split_dir = os.path.join(dest, split)
            if os.path.isdir(split_dir):
                for f in os.listdir(split_dir):
                    if f.endswith("_embeddings.npy"):
                        os.unlink(os.path.join(split_dir, f))
        pipe.run(metadata, dest, splits=splits)
    return True


def main(argv=None) -> int:
    args = parse_args(argv)
    logger = setup_logging("predict")

    from stutter_tpu.serve.classify import ServingClassifier

    clf = ServingClassifier.load(args.classifier_model)

    corpus_splits = None  # None = trust every split on disk (--embeddings_dir)
    if args.embeddings_dir:
        store_root = args.embeddings_dir
    else:
        if args.audio_dir is not None:
            metadata = _scan_audio_dir(args.audio_dir)
        else:
            from stutter_tpu.extract import create_metadata_from_files

            metadata = create_metadata_from_files(args.data_dir, "all")
        if len(metadata) == 0:
            logger.error("no audio files found")
            return 1
        store_root = args.keep_embeddings_dir or tempfile.mkdtemp(prefix="stutter_predict_")
        logger.info("extracting %d clips -> %s", len(metadata), store_root)
        if not _extract_corpus(args, metadata, store_root, logger):
            return 1
        corpus_splits = [s for s in metadata["split"].unique()
                         if isinstance(s, str)]

    meta, layers = _load_store(store_root, args.model_type, logger,
                               restrict=corpus_splits)
    if meta is None or not layers:
        return 1
    if clf.layer not in layers:
        logger.error("classifier was trained on column %r; store has %s",
                     clf.layer, sorted(layers))
        return 1

    labels, probs = clf.predict_rows(layers[clf.layer])
    keep = [c for c in ("filename", "path", "split", "label") if c in meta.columns]
    out = meta[keep].copy()
    out["predicted_label"] = labels
    if probs:
        for cls in sorted(probs[0]):
            out[f"prob_{cls}"] = [p[cls] for p in probs]
    out.to_csv(args.output, index=False)
    logger.info("wrote %d predictions -> %s", len(out), args.output)

    if "label" in out.columns:
        from stutter_tpu.train.metrics import balanced_accuracy

        scored = out[out["label"].notna()]
        if len(scored):
            names = sorted(set(scored["label"].astype(str)) |
                           set(scored["predicted_label"].astype(str)))
            idx = {n: i for i, n in enumerate(names)}
            y_true = np.array([idx[str(v)] for v in scored["label"]])
            y_pred = np.array([idx[str(v)] for v in scored["predicted_label"]])
            bal = balanced_accuracy(y_true, y_pred, n_classes=len(names))
            logger.info("balanced accuracy on %d labeled clips: %.4f",
                        len(scored), bal)
    return 0


if __name__ == "__main__":
    sys.exit(main())
