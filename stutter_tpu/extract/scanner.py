"""Corpus scanner: KSF / ComParE-22 layout -> metadata DataFrame.

Behavior parity with reference ``create_metadata_from_files``
(``WavLM_embeddings.py:127-247``) and the CSV-first whisper variant
(``whisper_embeddings_large.py:98-198``):

- ``{data_dir}/wav/**.wav`` holds clips; ``{data_dir}/lab/*.csv`` holds labels
  (compressed formats — flac/mp3/ogg/m4a — are also picked up, matching the
  loader's torchaudio-equivalent codec surface; label ids join by stem)
- a label CSV's split comes from 'train'/'test'/'devel' in its filename
- id column = first column (``.wav`` appended if missing); label column = the
  first column containing 'label' (case-insensitive), else the second column
- ALL label-CSV columns ride along into the metadata (the whisper reference
  keeps ``row.to_dict()`` — ``whisper_embeddings_large.py:155-157`` — and
  ``save_embeddings`` writes every non-layer column to the metadata CSV)
- clips named ``{split}_{id}`` join a CSV row whose id lacks the prefix
  (the reference's alt-filename fallback, ``whisper_embeddings_large.py:
  144-150``, mirrored from the walk direction)
- files without a CSV mapping fall back to split-by-filename-substring
- ``split != 'all'`` filters rows
"""

from __future__ import annotations

import os

import pandas as pd

from stutter_tpu.utils.logging import get_logger

logger = get_logger("extract.scanner")

_SPLITS = ("train", "test", "devel")

# formats the loader decodes: native RIFF parser (.wav) + libav extension
# (everything else; see audio/wavio.py:read_wav)
_AUDIO_EXTS = (".wav", ".flac", ".mp3", ".ogg", ".opus", ".m4a")


def _split_from_name(name: str) -> str:
    for s in _SPLITS:
        if s in name:
            return s
    return "unknown"


def _load_label_mapping(
    lab_dir: str, split: str
) -> tuple[dict[str, dict], dict[tuple[str, str], dict]]:
    """Returns (by_stem, by_split_stem).

    by_stem is last-CSV-wins (the reference's dict-overwrite behavior);
    by_split_stem keys (csv_split, stem) so the ``{split}_{id}`` prefix
    fallback can't cross-join splits that reuse bare ids (ComParE-style
    corpora number train/test/devel clips independently).
    """
    mapping: dict[str, dict] = {}
    by_split: dict[tuple[str, str], dict] = {}
    if not os.path.isdir(lab_dir):
        logger.warning("label directory not found: %s", lab_dir)
        return mapping, by_split
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
            # key by stem: CSV ids appear both bare and with .wav (reference
            # appends .wav when missing), and clips may be .flac/.mp3/...
            # Only strip a KNOWN audio extension — ids may contain dots.
            file_id = str(row[id_col])
            stem, ext = os.path.splitext(file_id)
            if ext.lower() not in _AUDIO_EXTS:
                stem = file_id
            # every CSV column rides along (reference whisper variant keeps
            # row.to_dict()); 'label'/'split' are set last so the detected
            # label column wins over any literal 'split' column
            entry = dict(row.to_dict())
            entry["label"] = row[label_col]
            entry["split"] = current_split
            mapping[stem] = entry
            by_split[(current_split, stem)] = entry
        logger.info("added %d label mappings from %s", len(df), csv_file)
    return mapping, by_split


def create_metadata_from_files(data_dir: str, split: str = "all") -> pd.DataFrame:
    """Scan a KSF-layout corpus into a DataFrame[filename, path, label, split]."""
    wav_dir = os.path.join(data_dir, "wav")
    lab_dir = os.path.join(data_dir, "lab")
    if not os.path.isdir(wav_dir):
        logger.error("WAV directory not found: %s", wav_dir)
        return pd.DataFrame()

    label_mapping, labels_by_split = _load_label_mapping(lab_dir, split)

    rows = []
    for root, _dirs, files in os.walk(wav_dir):
        for file in sorted(files):
            stem, ext = os.path.splitext(file)
            if ext.lower() not in _AUDIO_EXTS:
                continue
            mapped = label_mapping.get(stem)
            if mapped is None:
                # reference alt-filename fallback: CSV id '0001' labels clip
                # 'devel_0001.wav' (whisper_embeddings_large.py:144-150);
                # split-qualified so reused bare ids can't cross-join
                for s in _SPLITS:
                    if stem.startswith(f"{s}_"):
                        mapped = labels_by_split.get((s, stem[len(s) + 1:]))
                        break
            entry: dict = dict(mapped) if mapped is not None else {}
            # computed values win over CSV columns of the same name (the
            # reference overwrites row_dict['path'/'filename'] the same way)
            entry["filename"] = stem
            entry["path"] = os.path.join(root, file)
            if mapped is None:
                entry["split"] = _split_from_name(file)
            if split != "all" and entry.get("split", "unknown") != split:
                continue
            rows.append(entry)

    if not rows:
        logger.warning("no audio files found in %s for split %s", wav_dir, split)
    else:
        logger.info("found %d WAV files in %s", len(rows), wav_dir)
    return pd.DataFrame(rows)
