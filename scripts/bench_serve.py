"""Online-serving latency benchmark on the real device.

Drives the EmbeddingServer with paced synthetic requests (uniform arrival
rate) after a compile warm-up pass, and reports request-latency percentiles
plus achieved throughput as one JSON line. This is the serving-side
counterpart of bench.py's batch-extraction numbers.

    python scripts/bench_serve.py --model_type wavlm_large --preset turbo \
        --rate 200 --n_requests 300 --max_wait_ms 25
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_type", default="wavlm_large",
                    choices=["wavlm", "wavlm_large", "whisper", "whisper_large_fixed"])
    ap.add_argument("--preset", default="turbo")
    ap.add_argument("--rate", type=float, default=100.0, help="requests/second")
    ap.add_argument("--n_requests", type=int, default=200)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    ap.add_argument("--max_clips", type=int, default=64)
    ap.add_argument("--n_clips", type=int, default=40, help="distinct synthetic clips")
    args = ap.parse_args()

    from stutter_tpu.audio.synthetic import make_synthetic_corpus
    from stutter_tpu.cli.common import enable_compilation_cache
    from stutter_tpu.cli.train import build_extractor_for
    from stutter_tpu.extract.batcher import DEFAULT_BUCKETS_S, BucketBatcher
    from stutter_tpu.serve import EmbeddingServer, Request

    enable_compilation_cache()
    root = tempfile.mkdtemp(prefix="bench_serve_")
    make_synthetic_corpus(root, n_per_split={"train": args.n_clips})
    paths = sorted(glob.glob(os.path.join(root, "wav", "*.wav")))

    model_name = ("microsoft/wavlm-large" if "wavlm" in args.model_type
                  else "openai/whisper-large")
    extractor = build_extractor_for(args.model_type, model_name, True, None, args.preset)
    server = EmbeddingServer(
        extractor,
        batcher=BucketBatcher(
            buckets_s=getattr(extractor, "preferred_buckets", None) or DEFAULT_BUCKETS_S,
            audio_budget_s=args.max_clips * 3.0, max_batch=args.max_clips,
            frame_align=getattr(extractor, "frame_align", None),
        ),
        max_wait_s=args.max_wait_ms / 1e3, max_clips=args.max_clips,
    )

    # warm-up: push every clip through once so each occupied bucket shape is
    # compiled before the measured run (first-touch through the remote
    # compile service is 30-300 s per shape and would swamp the percentiles)
    warm_fail = 0

    def count_fail(r):
        nonlocal warm_fail
        warm_fail += not r.ok

    t0 = time.monotonic()
    server.serve(iter([Request(f"w{i}", p) for i, p in enumerate(paths)]), count_fail)
    warm_s = time.monotonic() - t0
    assert warm_fail == 0, f"{warm_fail} warm-up failures"
    server.reset_stats()

    rs = np.random.RandomState(0)
    order = rs.randint(0, len(paths), size=args.n_requests)

    def paced():
        start = time.monotonic()
        for i in range(args.n_requests):
            target = start + i / args.rate
            now = time.monotonic()
            if target > now:
                time.sleep(target - now)
            yield Request(str(i), paths[order[i]])

    responses = []
    t0 = time.monotonic()
    server.serve(paced(), responses.append)
    wall = time.monotonic() - t0

    s = server.stats()
    ok = sum(r.ok for r in responses)
    print(json.dumps({
        "metric": "serving_latency",
        "model_type": args.model_type, "preset": args.preset,
        "offered_rate_rps": args.rate,
        "achieved_rps": round(len(responses) / wall, 2),
        "n_requests": args.n_requests, "ok": ok,
        "max_wait_ms": args.max_wait_ms,
        "p50_ms": round(s.get("p50_s", 0) * 1e3, 2),
        "p95_ms": round(s.get("p95_s", 0) * 1e3, 2),
        "max_ms": round(s.get("max_s", 0) * 1e3, 2),
        "rounds": s["rounds"],
        "warmup_s": round(warm_s, 1),
    }))


if __name__ == "__main__":
    main()
