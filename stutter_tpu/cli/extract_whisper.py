"""Whisper embedding extraction CLI (``whisper_embeddings_large.py`` parity).

Flags mirror the reference (``whisper_embeddings_large.py:27-45``). Reference
quirks intentionally NOT kept: the HF-cache nuking + ``force_download=True``
on every run (:424-438, re-downloads ~6 GB each time) — checkpoints load
normally here. Quirks kept for embedding parity: the 1-token decoder step
uses token id 0, and resume is unconditional (:496-506).
"""

from __future__ import annotations

import argparse
import sys

from stutter_tpu.cli.common import add_mesh_args, build_mesh, load_whisper_model
from stutter_tpu.utils.logging import setup_logging


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Extract Whisper encoder+decoder embeddings (TPU)"
    )
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--model_name", type=str, default="openai/whisper-large",
                        help="Whisper model name (any size) or local directory")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=16,
                        help="Clips per device batch (30 s mel each)")
    parser.add_argument("--split", type=str, default="all",
                        choices=["train", "test", "devel", "all"])
    parser.add_argument("--checkpoint_interval", type=int, default=50)
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--random_init", action="store_true")
    parser.add_argument("--long_files", type=str, default="trim",
                        choices=["trim", "chunk"],
                        help="Files longer than 30 s: trim (the reference's "
                             "processor pad/trim behavior) or chunk into 30 s "
                             "windows combined by true-mel-frame weighting")
    parser.add_argument("--verify_model", action="store_true",
                        help="Dummy-forward model verification before extraction")
    add_mesh_args(parser)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    logger = setup_logging("whisper_embedding")

    from stutter_tpu.extract import (
        BucketBatcher,
        ExtractionPipeline,
        WhisperExtractor,
        create_metadata_from_files,
    )

    mesh = build_mesh(args)
    cfg, params = load_whisper_model(args.model_path or args.model_name, args.random_init)
    logger.info("model: %s (%d enc / %d dec layers, d_model %d)",
                args.model_name, cfg.encoder_layers, cfg.decoder_layers, cfg.d_model)

    metadata = create_metadata_from_files(args.data_dir, split=args.split)
    if len(metadata) == 0:
        logger.error("no files found under %s", args.data_dir)
        return 1
    if args.verify_model:  # after the cheap metadata check: verify compiles
        from stutter_tpu.models.verify import verify_whisper

        verify_whisper(params, cfg, model_name=args.model_path or args.model_name)

    extractor = WhisperExtractor(cfg, params, mesh=mesh, preset=args.preset)
    batcher = BucketBatcher(
        target_sr=args.sample_rate,
        buckets_s=(30.0,),  # whisper contract: 30 s pad/trim
        audio_budget_s=30.0 * args.batch_size,
        max_batch=args.batch_size,
        batch_multiple=mesh.data_size if mesh else 1,
    )
    pipe = ExtractionPipeline(extractor, batcher=batcher,
                              checkpoint_interval=args.checkpoint_interval,
                              long_file_policy=args.long_files)
    splits = [args.split] if args.split != "all" else ["train", "test", "devel"]
    # whisper reference resumes unconditionally
    pipe.run(metadata, args.output_dir, splits=splits, resume=True)
    logger.info("extraction complete -> %s", args.output_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
