"""Synthetic KSF-layout corpora for tests and benchmarks (SURVEY.md §4 item 3).

Generates ``{root}/wav/*.wav`` + ``{root}/lab/{split}.csv`` with the
ComParE-22 KSF label layout the scanner expects, using tones+noise so decode,
resample, frontends and augmentation have non-degenerate signals to chew on.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from stutter_tpu.audio.wavio import write_wav

DEFAULT_LABELS = ("no_disfluency", "block", "prolongation", "sound_repetition")


def make_synthetic_corpus(
    root: str,
    n_per_split: dict[str, int] | None = None,
    sample_rate: int = 16000,
    duration_range: tuple[float, float] = (0.5, 3.0),
    labels: tuple[str, ...] = DEFAULT_LABELS,
    label_skew: float = 0.5,
    seed: int = 0,
) -> pd.DataFrame:
    """Write a tiny corpus; returns the ground-truth metadata DataFrame.

    label_skew concentrates mass on the first label so minority-class
    augmentation/SMOTE paths get exercised.
    """
    if n_per_split is None:
        n_per_split = {"train": 12, "test": 6, "devel": 6}
    rng = np.random.RandomState(seed)
    wav_dir = os.path.join(root, "wav")
    lab_dir = os.path.join(root, "lab")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    probs = np.full(len(labels), (1.0 - label_skew) / max(1, len(labels) - 1))
    probs[0] = label_skew

    rows = []
    for split, n in n_per_split.items():
        csv_rows = []
        for i in range(n):
            name = f"{split}_{i:04d}.wav"
            dur = rng.uniform(*duration_range)
            t = np.arange(int(dur * sample_rate)) / sample_rate
            f0 = rng.uniform(100, 600)
            x = (
                0.4 * np.sin(2 * np.pi * f0 * t)
                + 0.2 * np.sin(2 * np.pi * 2.3 * f0 * t)
                + 0.05 * rng.randn(len(t))
            ).astype(np.float32)
            x /= max(1.0, np.abs(x).max() * 1.05)
            write_wav(os.path.join(wav_dir, name), x, sample_rate)
            label = labels[rng.choice(len(labels), p=probs)]
            csv_rows.append({"filename": name, "label": label})
            rows.append({
                "filename": os.path.splitext(name)[0], "path": os.path.join(wav_dir, name),
                "label": label, "split": split, "duration": dur,
            })
        pd.DataFrame(csv_rows).to_csv(os.path.join(lab_dir, f"{split}.csv"), index=False)
    return pd.DataFrame(rows)
