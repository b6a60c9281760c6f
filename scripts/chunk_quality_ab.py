"""Chunk-policy quality A/B: embedding cosine + downstream accuracy impact.

VERDICT r4 missing #1 / next-round #1: the chunk long-file policy
(``--long_files chunk --max_length 12``) clears the 50x throughput bar on
>=20 s content but computes a DIFFERENT function from the reference's
full-clip forward (/root/reference/WavLM_embeddings.py:296-307) — no
cross-chunk attention, per-chunk masked-mean pooling combined by true frame
count. This script measures what that semantics change actually costs:

1. embedding fidelity — per-layer cosine distance chunk-vs-native on the
   SAME clips, same preset (so quantization is controlled out);
2. downstream impact — balanced accuracy of the reference's classifier
   stack trained/evaluated in all four (train-policy x eval-policy) cells,
   on a synthetic corpus whose labels are ACOUSTICALLY REAL (class-dependent
   f0 band + amplitude-modulation rate + burst events; the stock synthetic
   corpus assigns labels independent of the signal, which would make any
   accuracy comparison vacuous).

Run on the real TPU:

    python scripts/chunk_quality_ab.py --out artifacts/chunk_quality_r5.json

The decision rule (VERDICT r4 #1): delta <= 1e-2 cosine AND <= 1 pt
balanced accuracy -> chunk becomes the measured default for long files.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LABELS = ("no_disfluency", "block", "prolongation", "sound_repetition")


def make_labelled_long_corpus(root: str, n_train: int, n_test: int,
                              dur_range=(20.0, 30.0), sr: int = 16000,
                              seed: int = 0) -> None:
    """KSF-layout corpus of LONG clips whose labels are learnable from audio.

    Class c controls: fundamental band (overlapping ranges so the task is
    not trivial), AM rate, and the count of short noise-burst events
    scattered across the clip (global properties — both the native full-clip
    pooling and the chunked combination can in principle capture them)."""
    from stutter_tpu.audio.wavio import write_wav

    rng = np.random.RandomState(seed)
    wav_dir = os.path.join(root, "wav")
    lab_dir = os.path.join(root, "lab")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    # class centers overlap under the +/-25% jitter and the noise floor is
    # high enough to keep accuracy off the ceiling — at-ceiling cells
    # (0.95-1.0 on a 60-clip test, round-5 first run) cannot resolve a
    # <=1 pt criterion, so the task must have headroom in both directions
    f0_base = {0: 150.0, 1: 210.0, 2: 300.0, 3: 420.0}
    am_rate = {0: 2.5, 1: 4.5, 2: 7.5, 3: 12.0}
    n_bursts = {0: 2, 1: 5, 2: 10, 3: 16}

    for split, n in (("train", n_train), ("test", n_test)):
        csv_rows = []
        for i in range(n):
            c = i % len(LABELS)  # balanced
            dur = rng.uniform(*dur_range)
            t = np.arange(int(dur * sr)) / sr
            f0 = f0_base[c] * rng.uniform(0.8, 1.25)
            am = am_rate[c] * rng.uniform(0.85, 1.15)
            x = (0.35 * np.sin(2 * np.pi * f0 * t)
                 + 0.15 * np.sin(2 * np.pi * 2.1 * f0 * t))
            x *= 0.6 + 0.4 * np.sin(2 * np.pi * am * t + rng.uniform(0, 6.28))
            for _ in range(n_bursts[c]):
                pos = rng.randint(0, max(1, len(t) - sr // 5))
                x[pos:pos + sr // 5] += 0.3 * rng.randn(
                    min(sr // 5, len(t) - pos))
            x += 0.30 * rng.randn(len(t))
            x = (x / max(1.0, np.abs(x).max() * 1.05)).astype(np.float32)
            name = f"{split}_{i:04d}.wav"
            write_wav(os.path.join(wav_dir, name), x, sr)
            csv_rows.append({"filename": name, "label": LABELS[c]})
        pd.DataFrame(csv_rows).to_csv(
            os.path.join(lab_dir, f"{split}.csv"), index=False)


def extract(extractor, metadata, out_dir: str, policy: str,
            chunk_cap_s: float | None) -> float:
    """Run the extraction pipeline with the given long-file policy."""
    from stutter_tpu.extract import BucketBatcher, ExtractionPipeline

    batcher = BucketBatcher(
        frame_align=extractor.frame_align,
        max_length_s=chunk_cap_s if policy == "chunk" else None,
    )
    pipe = ExtractionPipeline(extractor, batcher=batcher,
                              long_file_policy="chunk" if policy == "chunk"
                              else "trim")
    t0 = time.perf_counter()
    pipe.run(metadata, out_dir, splits=["train", "test"])
    return time.perf_counter() - t0


def cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    num = np.sum(a * b, axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return 1.0 - num / np.maximum(den, 1e-30)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_train", type=int, default=240)
    ap.add_argument("--n_test", type=int, default=240)
    ap.add_argument("--presets", type=str, default="fast,turbo")
    ap.add_argument("--chunk_cap_s", type=float, default=12.0)
    ap.add_argument("--classifier", type=str, default="svm")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from stutter_tpu.cli.common import enable_compilation_cache, load_wavlm_model
    from stutter_tpu.extract import WavLMExtractor, create_metadata_from_files
    from stutter_tpu.extract.store import load_embeddings
    from stutter_tpu.train.classifiers import train_balanced_model
    from stutter_tpu.train.metrics import balanced_accuracy

    enable_compilation_cache()
    root = tempfile.mkdtemp(prefix="chunk_quality_")
    make_labelled_long_corpus(root, args.n_train, args.n_test)
    metadata = create_metadata_from_files(root, split="all")
    cfg, params = load_wavlm_model("microsoft/wavlm-large", True)

    result = {"metric": "chunk_vs_native_quality", "chunk_cap_s": args.chunk_cap_s,
              "n_train": args.n_train, "n_test": args.n_test, "presets": {}}

    for preset in args.presets.split(","):
        extractor = WavLMExtractor(cfg, params, preset=preset)
        stores = {}
        walls = {}
        for policy in ("native", "chunk"):
            out_dir = os.path.join(root, f"emb_{preset}_{policy}")
            walls[policy] = extract(extractor, metadata, out_dir, policy,
                                    args.chunk_cap_s)
            meta, layers = load_embeddings(out_dir, "wavlm",
                                           splits=("train", "test"))
            assert meta is not None and layers, (preset, policy)
            stores[policy] = (meta, layers)

        meta_n, lay_n = stores["native"]
        meta_c, lay_c = stores["chunk"]
        # align chunk rows to the native row order by (filename, split)
        key_n = list(zip(meta_n["filename"], meta_n["split"]))
        key_c = {k: i for i, k in
                 enumerate(zip(meta_c["filename"], meta_c["split"]))}
        order = np.array([key_c[k] for k in key_n])
        assert len(order) == len(meta_n)

        cos_stats = {}
        worst = 0.0
        for layer in sorted(lay_n):
            d = cosine_rows(lay_n[layer], lay_c[layer][order])
            cos_stats[layer] = {"mean": float(np.mean(d)),
                                "p95": float(np.percentile(d, 95)),
                                "max": float(np.max(d))}
            worst = max(worst, float(np.max(d)))

        # downstream: per layer, all four train-policy x eval-policy cells
        y_all = meta_n["label"].map({l: i for i, l in enumerate(LABELS)}).to_numpy()
        tr = (meta_n["split"] == "train").to_numpy()
        te = (meta_n["split"] == "test").to_numpy()
        downstream = {}
        for layer in sorted(lay_n):
            Xn, Xc = lay_n[layer], lay_c[layer][order]
            cells = {}
            for tr_name, Xtr in (("native", Xn), ("chunk", Xc)):
                model, res = train_balanced_model(
                    Xtr[tr], y_all[tr], Xn[te], y_all[te],
                    classifier_type=args.classifier,
                    class_names=list(LABELS), use_smote=False)
                cells[f"train_{tr_name}_eval_native"] = res["balanced_accuracy"]
                cells[f"train_{tr_name}_eval_chunk"] = balanced_accuracy(
                    y_all[te], model.predict(Xc[te]), n_classes=len(LABELS))
            downstream[layer] = {k: round(float(v), 4) for k, v in cells.items()}

        accs = [v for cell in downstream.values() for v in cell.values()]
        match = [cell["train_native_eval_native"] for cell in downstream.values()]
        cross = [cell[k] for cell in downstream.values()
                 for k in ("train_native_eval_chunk", "train_chunk_eval_native")]
        result["presets"][preset] = {
            "wall_s": {k: round(v, 1) for k, v in walls.items()},
            "cosine_by_layer": cos_stats,
            "worst_cosine": worst,
            "downstream_balanced_accuracy": downstream,
            "max_cross_policy_accuracy_drop": round(
                max(0.0, max(match) - min(cross)), 4),
            "all_accuracies_min_max": [round(min(accs), 4), round(max(accs), 4)],
        }
        print(f"[{preset}] worst cosine {worst:.2e}; "
              f"cells min/max {min(accs):.3f}/{max(accs):.3f}", flush=True)

    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
