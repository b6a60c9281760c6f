"""Online embedding server CLI.

No reference equivalent — the deployment-facing entry point. Reads JSONL
requests ({"id": ..., "path": ...} or bare wav paths) from stdin or a file,
batches them with a latency deadline onto the same jit extraction programs
the batch pipeline uses, and writes JSONL responses to stdout (embeddings
inline) or .npy files under --output_dir (responses then carry file paths).

    echo '{"id": "a", "path": "/data/clip.wav"}' | \
      python -m stutter_tpu.cli.serve --model_type wavlm --random_init

With --http HOST:PORT the same batching loop serves a network endpoint
instead (serve/http.py): POST /embed with {"path": ...} JSON or raw wav
bytes; GET /stats, GET /healthz.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from stutter_tpu.cli.common import add_mesh_args, build_mesh
from stutter_tpu.utils.logging import setup_logging


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Online embedding server")
    parser.add_argument("--model_type", type=str, default="wavlm",
                        choices=["wavlm", "wavlm_large", "whisper",
                                 "whisper_large_fixed", "combined"])
    parser.add_argument("--model_name", type=str, default=None,
                        help="HF checkpoint path/name (default by model_type; "
                             "for 'combined' this names the WavLM part)")
    parser.add_argument("--whisper_model_name", type=str,
                        default="openai/whisper-large",
                        help="'combined' only: the Whisper part's checkpoint")
    parser.add_argument("--input", type=str, default="-",
                        help="JSONL request source ('-' = stdin)")
    parser.add_argument("--http", type=str, default=None, metavar="HOST:PORT",
                        help="Serve over HTTP instead of JSONL stdin/file "
                             "(POST /embed, GET /stats, GET /healthz)")
    parser.add_argument("--request_timeout_s", type=float, default=120.0,
                        help="HTTP mode: per-request deadline before a 422 timeout")
    parser.add_argument("--output_dir", type=str, default=None,
                        help="Write each clip's embeddings as .npy here instead "
                             "of inlining them in the response JSON")
    parser.add_argument("--max_wait_ms", type=float, default=250.0,
                        help="Max time the first queued request waits for batchmates")
    parser.add_argument("--max_clips", type=int, default=64,
                        help="Max clips gathered per serving round")
    parser.add_argument("--buckets", type=str, default=None,
                        help="Comma-separated bucket lengths in seconds "
                             "(default: the extractor's preference — 30 for "
                             "whisper/combined, multi-bucket for wavlm). Each "
                             "occupied bucket costs one device-program "
                             "compile; fewer buckets = fewer compiles, more "
                             "padding compute")
    parser.add_argument("--long_clip_policy", type=str, default="chunk",
                        choices=["trim", "chunk"],
                        help="Clips longer than the top bucket: 'chunk' embeds "
                             "length-weighted top-bucket chunks, 'trim' keeps "
                             "only the first bucket-length seconds")
    parser.add_argument("--classifier_model", type=str, default=None,
                        help="Path to a trained *_model.joblib (train CLI "
                             "artifact); responses then carry the predicted "
                             "stutter-class label + probabilities computed "
                             "from the layer the model was trained on")
    parser.add_argument("--warmup", action="store_true",
                        help="AOT-compile every bucket program before taking "
                             "traffic, so no request ever pays a first-of-"
                             "bucket XLA compile (compiles also land in the "
                             "persistent cache for future starts)")
    parser.add_argument("--random_init", action="store_true")
    add_mesh_args(parser)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    logger = setup_logging("serve")
    # validate the listen address BEFORE the model build — a bad --http must
    # not surface as an int() traceback after minutes of TPU compiles
    http_host = http_port = None
    if args.http:
        http_host, _, port_str = args.http.rpartition(":")
        if not port_str.isdigit():
            logger.error("--http expects HOST:PORT, got %r", args.http)
            return 2
        http_port = int(port_str)
    from stutter_tpu.cli.common import default_model_name, make_bucket_batcher
    from stutter_tpu.cli.train import build_extractor_for
    from stutter_tpu.serve import EmbeddingServer, jsonl_requests

    mesh = build_mesh(args)
    model_name = default_model_name(args.model_type, args.model_name)
    if args.model_type == "combined":
        # both backbones in one server: fusion-store column naming incl.
        # combined_top, so 'combined'-trained classifiers serve (serve/combined.py)
        from stutter_tpu.serve import CombinedExtractor

        extractor = CombinedExtractor(
            build_extractor_for("wavlm", model_name, args.random_init, mesh,
                                args.preset),
            build_extractor_for("whisper", args.whisper_model_name,
                                args.random_init, mesh, args.preset),
        )
    else:
        extractor = build_extractor_for(
            args.model_type, model_name, args.random_init, mesh, args.preset
        )
    if extractor is None:
        logger.error("unsupported model_type %s", args.model_type)
        return 1

    classifier = None
    if args.classifier_model:
        from stutter_tpu.serve import ServingClassifier

        classifier = ServingClassifier.load(args.classifier_model)

    buckets = (tuple(float(b) for b in args.buckets.split(",")) if args.buckets
               else None)
    server = EmbeddingServer(
        extractor,
        batcher=make_bucket_batcher(
            extractor, mesh, buckets_s=buckets,
            audio_budget_s=args.max_clips * 3.0, max_batch=args.max_clips,
        ),
        max_wait_s=args.max_wait_ms / 1e3,
        max_clips=args.max_clips,
        long_clip_policy=args.long_clip_policy,
        classifier=classifier,
    )
    if args.warmup:
        n = extractor.warmup(server.batcher)
        logger.info("warmup: %d bucket programs compiled; serving cold-start "
                    "latency is now steady-state", n)

    if args.http:
        from stutter_tpu.serve import HttpEmbeddingFrontend

        frontend = HttpEmbeddingFrontend(
            server, host=http_host or "127.0.0.1", port=http_port,
            request_timeout_s=args.request_timeout_s,
        )
        logger.info("HTTP serving (model=%s) on %s:%d", model_name,
                    frontend.host, frontend.port)
        try:
            frontend.serve_forever()
        finally:
            logger.info("final serving stats: %s", server.stats())
        return 0

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)

    out = sys.stdout

    def emit(resp):
        obj = {"id": resp.req_id, "path": resp.path, "ok": bool(resp.ok)}
        if resp.ok and resp.prediction is not None:
            obj["prediction"] = resp.prediction
            if resp.probs is not None:
                obj["probs"] = resp.probs
        if resp.ok and resp.error:  # embeddings shipped but classification failed
            obj["error"] = resp.error
        if not resp.ok:
            obj["error"] = resp.error
        elif args.output_dir:
            stem = os.path.splitext(os.path.basename(resp.path))[0]
            base = os.path.join(args.output_dir, f"{resp.req_id}_{stem}")
            dims = {np.asarray(v).shape[-1] for v in resp.embeddings.values()}
            if len(dims) == 1:
                fname = base + ".npy"
                np.save(fname, np.stack(list(resp.embeddings.values())))
            else:
                # ragged columns (combined: wavlm/whisper widths + the
                # hstacked combined_top) -> one npz keyed by column
                fname = base + ".npz"
                np.savez(fname, **{k: np.asarray(v, np.float32)
                                   for k, v in resp.embeddings.items()})
            obj["file"] = fname
            obj["columns"] = list(resp.embeddings.keys())
        else:
            obj["embeddings"] = {
                k: np.asarray(v, np.float32).tolist() for k, v in resp.embeddings.items()
            }
        out.write(json.dumps(obj) + "\n")
        out.flush()

    source = sys.stdin if args.input == "-" else open(args.input)
    try:
        logger.info("serving (model=%s, max_wait=%.0f ms, max_clips=%d)",
                    model_name, args.max_wait_ms, args.max_clips)
        server.serve(jsonl_requests(source), emit)
    finally:
        logger.info("final serving stats: %s", server.stats())
        if source is not sys.stdin:
            source.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
