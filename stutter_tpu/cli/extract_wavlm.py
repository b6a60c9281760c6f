"""WavLM embedding extraction CLI (reference ``WavLM_embeddings.py`` parity).

Flag set mirrors the reference argparse (``WavLM_embeddings.py:27-53``):
--data_dir --output_dir --model_name --batch_size --split
--checkpoint_interval --device --resume --max_length --sample_rate,
plus TPU-build flags (--devices, --preset, --random_init, --audio_budget).

``--batch_size`` in the reference was only checkpoint granularity (every
forward was batch=1); here real device batches are sized by --audio_budget
(audio-seconds per batch) and --batch_size caps the per-bucket clip count.
"""

from __future__ import annotations

import argparse
import sys

from stutter_tpu.cli.common import add_mesh_args, build_mesh, load_wavlm_model
from stutter_tpu.utils.logging import setup_logging


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Extract WavLM embeddings for stuttering classification (TPU)"
    )
    parser.add_argument("--data_dir", type=str, required=True,
                        help="Base directory with KSF data (wav/ and lab/ subdirectories)")
    parser.add_argument("--output_dir", type=str, required=True,
                        help="Directory to save embeddings")
    parser.add_argument("--model_name", type=str, default="microsoft/wavlm-large",
                        choices=["microsoft/wavlm-base", "microsoft/wavlm-base-plus",
                                 "microsoft/wavlm-large", "microsoft/wavlm-large-v2"],
                        help="WavLM model name")
    parser.add_argument("--model_path", type=str, default=None,
                        help="Local checkpoint directory (overrides --model_name source)")
    parser.add_argument("--batch_size", type=int, default=128,
                        help="Max clips per device batch")
    parser.add_argument("--split", type=str, default="all",
                        choices=["train", "test", "devel", "all"])
    parser.add_argument("--checkpoint_interval", type=int, default=50,
                        help="Save a resume checkpoint every N files")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from latest checkpoint")
    parser.add_argument("--max_length", type=float, default=None,
                        help="Maximum audio length in seconds (longer files trimmed)")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--audio_budget", type=float, default=240.0,
                        help="Audio seconds per device batch")
    parser.add_argument("--random_init", action="store_true",
                        help="Skip checkpoint load; random weights (offline smoke runs)")
    parser.add_argument("--long_files", type=str, default="trim",
                        choices=["trim", "chunk"],
                        help="Files longer than the top bucket: trim (reference "
                             "behavior) or chunk+weighted-average")
    parser.add_argument("--verify_model", action="store_true",
                        help="Dummy-forward model verification before extraction "
                             "(the reference always does this; opt-in here since "
                             "it costs one extra compile)")
    add_mesh_args(parser)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    logger = setup_logging("wavlm_embedding")

    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WavLMExtractor,
        create_metadata_from_files,
    )

    mesh = build_mesh(args)
    cfg, params = load_wavlm_model(args.model_path or args.model_name, args.random_init)
    logger.info("model: %s (%d layers, hidden %d, stable_ln=%s)",
                args.model_name, cfg.num_hidden_layers, cfg.hidden_size,
                cfg.do_stable_layer_norm)

    metadata = create_metadata_from_files(args.data_dir, split=args.split)
    if len(metadata) == 0:
        logger.error("no files found under %s", args.data_dir)
        return 1
    if args.verify_model:  # after the cheap metadata check: verify compiles
        from stutter_tpu.models.verify import verify_wavlm

        verify_wavlm(params, cfg, model_name=args.model_path or args.model_name)

    extractor = WavLMExtractor(cfg, params, mesh=mesh, preset=args.preset)
    batcher = BucketBatcher(
        target_sr=args.sample_rate,
        audio_budget_s=args.audio_budget,
        max_batch=args.batch_size,
        batch_multiple=mesh.data_size if mesh else 1,
        max_length_s=args.max_length,
        frame_align=extractor.frame_align,
    )
    pipe = ExtractionPipeline(extractor, batcher=batcher,
                              checkpoint_interval=args.checkpoint_interval,
                              long_file_policy=args.long_files)
    splits = [args.split] if args.split != "all" else ["train", "test", "devel"]
    pipe.run(metadata, args.output_dir, splits=splits, resume=args.resume)
    logger.info("extraction complete -> %s", args.output_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
