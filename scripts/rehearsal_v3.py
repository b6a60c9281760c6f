"""Corpus-scale rehearsal v3 (round 5): v2 + a corpus-scale fine-tune stage.

VERDICT r4 next-round #4: the committed v2 artifact predates the r4
cross-file chunk batching and the L>=1008 threshold retune, and no round has
ever run BASELINE config[3] (end-to-end fine-tune) at corpus scale. v3
re-runs the v2 pipeline on the current tree and adds a bounded fine-tune:

  1. synthetic KSF corpus: 5,000 clips, 0.5-14 s (clips past --max_length 12
     exercise the 'chunk' long-file policy on BOTH extract and predict)
  2. cli.extract_wavlm  --preset turbo --long_files chunk   -> store emb/wavlm
  3. cli.extract_whisper --preset turbo --long_files chunk  -> store emb/whisper
  4. cli.train --model_type combined (fusion store, SMOTE, mlp head)
  5. cli.predict --model_type combined over the FULL corpus dir
  6. cli.finetune: UNFROZEN WavLM-Large end-to-end fine-tune, 2 epochs at
     effective batch 64 (b16 x K4 — the measured b16·K4 layer-remat corner),
     6 s clip cap (BASELINE config[3] at corpus scale)

Each stage runs the real CLI in a subprocess (what a user types), timed as
whole-run wall clock INCLUDING first-touch compiles — the honest pipeline
number, unlike bench.py's steady-state kernel number.

Run on the real TPU:  python scripts/rehearsal_v3.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_cli(stage: str, argv: list[str], timings: dict, timeout: float = 3600.0) -> str:
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-m"] + argv, cwd=REPO, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    dt = time.monotonic() - t0
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    print(f"[{stage}] {dt:.1f}s rc={proc.returncode}\n{tail}\n", flush=True)
    if proc.returncode != 0:
        raise SystemExit(f"{stage} failed (rc={proc.returncode})")
    timings[stage + "_s"] = round(dt, 1)
    return proc.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/rehearsal_v3")
    ap.add_argument("--n_train", type=int, default=4000)
    ap.add_argument("--n_eval", type=int, default=500, help="per devel/test split")
    ap.add_argument("--max_dur", type=float, default=14.0)
    ap.add_argument("--finetune_epochs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "rehearsal_v3_r5.json"))
    args = ap.parse_args()

    from stutter_tpu.audio.synthetic import make_synthetic_corpus

    timings: dict = {}
    if os.path.isdir(args.root):
        shutil.rmtree(args.root)
    corpus = os.path.join(args.root, "corpus")
    emb = os.path.join(args.root, "emb")
    results = os.path.join(args.root, "results")
    ft_results = os.path.join(args.root, "finetune")

    t0 = time.monotonic()
    meta = make_synthetic_corpus(
        corpus,
        n_per_split={"train": args.n_train, "devel": args.n_eval, "test": args.n_eval},
        duration_range=(0.5, args.max_dur),
        seed=1,
    )
    timings["corpus_gen_s"] = round(time.monotonic() - t0, 1)
    audio_s = float(meta["duration"].sum())
    n_long = int((meta["duration"] > 12.0).sum())
    print(f"[corpus] {len(meta)} clips, {audio_s:.0f} audio-s, "
          f"{n_long} clips past the 12 s cap (chunked)", flush=True)

    run_cli("extract_wavlm", [
        "stutter_tpu.cli.extract_wavlm", "--data_dir", corpus,
        "--output_dir", os.path.join(emb, "wavlm"),
        "--random_init", "--preset", "turbo",
        "--long_files", "chunk", "--max_length", "12",
    ], timings)
    run_cli("extract_whisper", [
        "stutter_tpu.cli.extract_whisper", "--data_dir", corpus,
        "--output_dir", os.path.join(emb, "whisper"),
        "--random_init", "--preset", "turbo", "--long_files", "chunk",
    ], timings)
    run_cli("train_combined", [
        "stutter_tpu.cli.train", "--embeddings_dir", emb,
        "--results_dir", results, "--model_type", "combined",
        "--classifier", "mlp", "--head_epochs", "60",
    ], timings)

    import glob as _glob

    models = sorted(_glob.glob(os.path.join(results, "**", "*_model.joblib"),
                               recursive=True))
    assert models, "trainer produced no model artifacts"
    clf = next((m for m in models if "combined_top" in m), models[0])

    pred_csv = os.path.join(args.root, "predictions.csv")
    run_cli("predict_combined", [
        "stutter_tpu.cli.predict", "--data_dir", corpus,
        "--classifier_model", clf, "--model_type", "combined",
        "--output", pred_csv, "--random_init", "--preset", "turbo",
        "--long_files", "chunk", "--max_length", "12",
    ], timings)

    # stage 6: BASELINE config[3] at corpus scale — unfrozen end-to-end
    # fine-tune over the 4,000 labeled train clips, effective batch 64
    # (b16 x K4, the measured layer-remat corner), 6 s cap. Train audio
    # accounting uses the CAPPED durations (what the step actually sees).
    run_cli("finetune_e2e", [
        "stutter_tpu.cli.finetune", "--data_dir", corpus,
        "--results_dir", ft_results, "--random_init",
        "--epochs", str(args.finetune_epochs), "--batch_size", "16",
        "--grad_accum", "4", "--max_length", "6",
    ], timings, timeout=7200.0)

    import pandas as pd

    preds = pd.read_csv(pred_csv)
    n_dropped = len(meta) - len(preds)
    assert n_dropped == 0, (len(preds), len(meta))
    ft_metrics = sorted(_glob.glob(os.path.join(ft_results, "**", "*.json"),
                                   recursive=True))
    train_meta = meta[meta["split"] == "train"]
    ft_audio_s = float(np.minimum(train_meta["duration"], 6.0).sum())
    extract_s = timings["extract_wavlm_s"] + timings["extract_whisper_s"]
    out = {
        "metric": "rehearsal_v3",
        "n_clips": int(len(meta)),
        "audio_seconds": round(audio_s, 1),
        "n_chunked_clips": n_long,
        "mean_clip_s": round(audio_s / len(meta), 2),
        **timings,
        "total_s": round(sum(timings.values()), 1),
        "extract_both_models_audio_s_per_s": round(2 * audio_s / extract_s, 1),
        "wavlm_whole_run_x_realtime": round(audio_s / timings["extract_wavlm_s"], 1),
        "whisper_whole_run_x_realtime": round(audio_s / timings["extract_whisper_s"], 1),
        "finetune_epochs": args.finetune_epochs,
        "finetune_train_audio_s_per_epoch": round(ft_audio_s, 1),
        "finetune_whole_run_x_realtime": round(
            args.finetune_epochs * ft_audio_s / timings["finetune_e2e_s"], 2),
        "finetune_artifacts": [os.path.relpath(p, args.root) for p in ft_metrics],
        "n_predictions": int(len(preds)),
        "n_dropped_rows": n_dropped,
        "prediction_columns": list(preds.columns),
        "device": "TPU v5e via tunnel (whole-run incl. first-touch compiles)",
    }
    print(json.dumps(out), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
