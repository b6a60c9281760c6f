"""Corpus scanner: KSF / ComParE-22 layout -> metadata DataFrame.

Behavior parity with reference ``create_metadata_from_files``
(``WavLM_embeddings.py:127-247``) and the CSV-first whisper variant
(``whisper_embeddings_large.py:98-198``):

- ``{data_dir}/wav/**.wav`` holds clips; ``{data_dir}/lab/*.csv`` holds labels
- a label CSV's split comes from 'train'/'test'/'devel' in its filename
- id column = first column (``.wav`` appended if missing); label column = the
  first column containing 'label' (case-insensitive), else the second column
- files without a CSV mapping fall back to split-by-filename-substring
- ``split != 'all'`` filters rows
"""

from __future__ import annotations

import os

import pandas as pd

from stutter_tpu.utils.logging import get_logger

logger = get_logger("extract.scanner")

_SPLITS = ("train", "test", "devel")


def _split_from_name(name: str) -> str:
    for s in _SPLITS:
        if s in name:
            return s
    return "unknown"


def _load_label_mapping(lab_dir: str, split: str) -> dict[str, dict]:
    mapping: dict[str, dict] = {}
    if not os.path.isdir(lab_dir):
        logger.warning("label directory not found: %s", lab_dir)
        return mapping
    for csv_file in sorted(f for f in os.listdir(lab_dir) if f.endswith(".csv")):
        try:
            df = pd.read_csv(os.path.join(lab_dir, csv_file))
        except Exception as e:  # noqa: BLE001
            logger.error("error processing label file %s: %s", csv_file, e)
            continue
        current_split = _split_from_name(csv_file)
        if split != "all" and current_split not in ("unknown", split):
            continue
        id_col = df.columns[0]
        label_col = next((c for c in df.columns if "label" in c.lower()), None)
        if label_col is None and len(df.columns) > 1:
            label_col = df.columns[1]
        if label_col is None:
            continue
        for _, row in df.iterrows():
            file_id = str(row[id_col])
            if not file_id.endswith(".wav"):
                file_id = f"{file_id}.wav"
            mapping[file_id] = {"label": row[label_col], "split": current_split}
        logger.info("added %d label mappings from %s", len(df), csv_file)
    return mapping


def create_metadata_from_files(data_dir: str, split: str = "all") -> pd.DataFrame:
    """Scan a KSF-layout corpus into a DataFrame[filename, path, label, split]."""
    wav_dir = os.path.join(data_dir, "wav")
    lab_dir = os.path.join(data_dir, "lab")
    if not os.path.isdir(wav_dir):
        logger.error("WAV directory not found: %s", wav_dir)
        return pd.DataFrame()

    label_mapping = _load_label_mapping(lab_dir, split)

    rows = []
    for root, _dirs, files in os.walk(wav_dir):
        for file in sorted(files):
            if not file.endswith(".wav"):
                continue
            entry: dict = {"filename": os.path.splitext(file)[0], "path": os.path.join(root, file)}
            if file in label_mapping:
                entry.update(label_mapping[file])
            else:
                entry["split"] = _split_from_name(file)
            if split != "all" and entry.get("split", "unknown") != split:
                continue
            rows.append(entry)

    if not rows:
        logger.warning("no audio files found in %s for split %s", wav_dir, split)
    else:
        logger.info("found %d WAV files in %s", len(rows), wav_dir)
    return pd.DataFrame(rows)
