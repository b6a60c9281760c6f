"""Tracing / profiling hooks (SURVEY.md §5 — the reference has none).

- ``trace(dir)``: jax.profiler trace context (view in TensorBoard/XProf)
- ``annotate(name)``: TraceAnnotation for pipeline stages
- ``StageTimer``: lightweight wall-clock per-stage accounting that reports the
  headline audio-sec/sec metric
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

from stutter_tpu.utils.logging import get_logger

logger = get_logger("profiling")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/jaxtrace'): ...``"""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulate wall time per named stage; report totals and rates."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, audio_seconds: float | None = None) -> dict:
        out = {
            name: {"seconds": round(t, 3), "calls": self.counts[name]}
            for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }
        if audio_seconds:
            wall = sum(self.totals.values())
            out["_throughput"] = {
                "audio_seconds": round(audio_seconds, 1),
                "wall_seconds": round(wall, 3),
                "audio_sec_per_sec": round(audio_seconds / wall, 2) if wall else None,
            }
        for name, stats in out.items():
            logger.info("stage %s: %s", name, stats)
        return out
