"""Latency-bounded online embedding serving over the extraction stack.

No reference equivalent (the reference is batch scripts only); this is the
deployment-facing entry the framework's batching design makes nearly free:
the same BucketBatcher static-shape buckets and the same jit extractor
programs (compiled once per bucket) serve interactive requests — the server
only adds a deadline-bounded gather so a lone request never waits for a
full batch.

Design:
- a reader thread drains the request source into a queue (so slow clients
  don't stall the device loop)
- the serving loop gathers requests until either `max_wait_s` passes since
  the FIRST queued request or `max_clips` are waiting, then groups them by
  length bucket, runs each bucket batch, and emits per-request results
- batches reuse the extractor's async submit/collect split: bucket i+1's
  host decode overlaps bucket i's device compute
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Callable, Iterable, Iterator

import numpy as np

from stutter_tpu.extract.batcher import BucketBatcher
from stutter_tpu.utils.logging import get_logger

logger = get_logger("serve.server")


@dataclasses.dataclass
class Request:
    req_id: str
    path: str


@dataclasses.dataclass
class Response:
    req_id: str
    path: str
    ok: bool
    embeddings: dict[str, np.ndarray] | None  # column -> [D] f32
    error: str | None = None
    # set when the server carries a ServingClassifier (serve/classify.py):
    # predicted class label + per-class probabilities (None when the
    # estimator has no predict_proba, e.g. SVC without probability=True)
    prediction: str | None = None
    probs: dict[str, float] | None = None


_STOP = object()


class EmbeddingServer:
    def __init__(
        self,
        extractor,
        batcher: BucketBatcher | None = None,
        max_wait_s: float = 0.25,
        max_clips: int = 64,
        stats_every: int = 20,
        long_clip_policy: str = "chunk",
        classifier=None,
    ):
        assert long_clip_policy in ("trim", "chunk")
        self.extractor = extractor
        # optional ServingClassifier (serve/classify.py): when set, every
        # successful response also carries prediction/probs computed from the
        # classifier's embedding column. Validated eagerly against the
        # extractor's column names so a layer/extractor mismatch fails at
        # startup, not per-request.
        self.classifier = classifier
        cols = getattr(extractor, "column_names", None)
        if classifier is not None and cols and classifier.layer not in cols:
            raise ValueError(
                f"classifier was trained on column '{classifier.layer}' but the "
                f"extractor serves columns {list(cols)}"
            )
        self.batcher = batcher or BucketBatcher(
            audio_budget_s=max_clips * 3.0, max_batch=max_clips,
        )
        self.max_wait_s = max_wait_s
        self.max_clips = max_clips
        # clips longer than the top bucket: 'chunk' embeds them via the
        # pipeline's chunked path (length-weighted combination — the right
        # serving semantic; first long clip pays that shape's compile),
        # 'trim' keeps the reference behavior of embedding the first
        # bucket-length seconds (WavLM_embeddings.py:112-117)
        self.long_clip_policy = long_clip_policy
        # per-request latency from arrival (queue pop) to response emit;
        # p50/p95 logged every `stats_every` rounds and kept on the server
        # for callers to scrape (stats())
        self.stats_every = stats_every
        # bounded: a long-running server must not grow one float per request
        # forever — the most recent window carries the same p50/p95 signal
        from collections import deque

        self._latencies: "deque[float]" = deque(maxlen=100_000)
        self._served = 0
        self._failed = 0
        self._rounds = 0
        # device-side accounting: time blocked in extractor.collect() plus
        # the chunked-path calls, and the audio-seconds they produced. The
        # end-to-end request latency is floored by whatever sits between
        # host and device (the dev tunnel adds ~1 s RTT), so p50/p95 alone
        # can't tell a server regression from transport noise —
        # device_s_per_audio_s can: it is pure serving-loop + device cost
        # per unit of work, independent of request pacing.
        self._collect_s = 0.0
        self._audio_s = 0.0

    def reset_stats(self) -> None:
        """Zero the counters (e.g. after compile warm-up, before measuring)."""
        self._latencies.clear()
        self._served, self._failed, self._rounds = 0, 0, 0
        self._collect_s, self._audio_s = 0.0, 0.0

    def stats(self) -> dict:
        """Volume counters since startup; latency percentiles over the most
        recent 100k requests (seconds)."""
        lat = np.asarray(self._latencies, np.float64)
        out = {"served": self._served, "failed": self._failed,
               "rounds": self._rounds,
               "device_collect_s": round(self._collect_s, 3),
               "audio_s_served": round(self._audio_s, 2)}
        if self._audio_s > 0:
            out["device_s_per_audio_s"] = round(self._collect_s / self._audio_s, 4)
        if len(lat):
            out.update(
                p50_s=float(np.percentile(lat, 50)),
                p95_s=float(np.percentile(lat, 95)),
                max_s=float(lat.max()),
            )
        return out

    # -- one gathered round ------------------------------------------------

    def _submit_round(self, reqs: list[Request]):
        """Host half of a round: probe/split, decode, and dispatch the device
        programs WITHOUT waiting for them. Returns the work handle consumed by
        _finish_round — splitting submit from finish lets the serve loop
        overlap round k's device compute with round k+1's gather + decode
        (measured: the sequential loop capped at ~100 audio-s/s because the
        single-core host decode serialized with the device)."""
        long_reqs: list[Request] = []
        durations: list[float | None] | None = None
        if self.long_clip_policy == "chunk":
            from stutter_tpu.audio.wavio import audio_info

            top_s = self.batcher.buckets_s[-1]
            short: list[Request] = []
            durations = []
            for r in reqs:
                try:
                    n, sr = audio_info(r.path)
                    dur = n / sr
                except Exception:  # noqa: BLE001 — normal path reports decode errors
                    dur = None
                if dur is not None and dur > top_s:
                    long_reqs.append(r)
                else:
                    short.append(r)
                    durations.append(dur)  # reused by assign_buckets below
            reqs = short
        paths = [r.path for r in reqs]
        assignment = self.batcher.assign_buckets(paths, durations=durations)
        pending = []  # (reqs_for_batch, batch, device handle | exception)
        for bucket_s, rows in assignment.items():
            for i in range(0, len(rows), self.batcher.batch_size_for(bucket_s)):
                chunk = rows[i : i + self.batcher.batch_size_for(bucket_s)]
                chunk_reqs = [reqs[r] for r in chunk]
                try:
                    batch = self.batcher._make_batch(paths, chunk, bucket_s)
                    pending.append((chunk_reqs, batch, self.extractor.submit(batch)))
                except Exception as e:  # noqa: BLE001
                    logger.exception("batch submit failed")
                    pending.append((chunk_reqs, None, e))
        return pending, long_reqs

    def _finish_round(self, work, emit: Callable[[Response], None],
                      emitted: set[str]):
        """Collect/classify/emit a submitted round. Every emit is recorded in
        `emitted` so a failure partway through (one bucket batch erroring)
        never re-answers requests that already got a response; per-batch
        try/except means one bad batch fails only its own requests."""
        pending, long_reqs = work
        for chunk_reqs, batch, handle in pending:
            try:
                if batch is None:
                    raise handle
                t_c = time.monotonic()
                cols = self.extractor.collect(handle)
                self._collect_s += time.monotonic() - t_c
                self._audio_s += (float(np.sum(batch.lengths[batch.ok]))
                                  / float(batch.sample_rate))
            except Exception as e:  # noqa: BLE001
                logger.exception("batch failed")
                for req in chunk_reqs:
                    emitted.add(req.req_id)
                    emit(Response(req.req_id, req.path, False, None,
                                  f"batch failed: {e}"))
                continue
            # classify the whole batch in one estimator call (not per request)
            preds: dict[int, tuple[str, dict | None]] = {}
            classify_err = None
            if self.classifier is not None:
                valid = [j for j in range(len(chunk_reqs)) if batch.ok[j]]
                try:
                    rows = np.asarray(cols[self.classifier.layer], np.float32)[valid]
                    labels, probs = self.classifier.predict_rows(rows)
                    preds = {j: (labels[i], probs[i] if probs else None)
                             for i, j in enumerate(valid)}
                except Exception as e:  # noqa: BLE001 — embeddings still ship
                    logger.exception("classification failed for batch")
                    classify_err = f"classification failed: {e}"
            for j, req in enumerate(chunk_reqs):
                emitted.add(req.req_id)
                if not batch.ok[j]:
                    emit(Response(req.req_id, req.path, False, None, "decode failed"))
                    continue
                label, probs_j = preds.get(j, (None, None))
                emit(Response(
                    req.req_id, req.path, True,
                    {name: np.asarray(col[j], np.float32) for name, col in cols.items()},
                    error=classify_err, prediction=label, probs=probs_j,
                ))
        for req in long_reqs:
            emitted.add(req.req_id)
            try:
                from stutter_tpu.extract.pipeline import chunked_embeddings

                t_c = time.monotonic()
                res = chunked_embeddings(self.extractor, self.batcher, req.path)
                self._collect_s += time.monotonic() - t_c
                if res is not None:
                    self._audio_s += res[2]
            except Exception as e:  # noqa: BLE001 — one bad clip must not kill the round
                logger.exception("chunked extraction failed for %s", req.path)
                emit(Response(req.req_id, req.path, False, None,
                              f"chunked extraction failed: {e}"))
                continue
            if res is None:
                emit(Response(req.req_id, req.path, False, None, "decode failed"))
            else:
                label, probs, classify_err = None, None, None
                if self.classifier is not None:
                    try:
                        label, probs = self.classifier.classify_embeddings(res[0])
                    except Exception as e:  # noqa: BLE001 — embeddings still ship
                        logger.exception("classification failed for %s", req.path)
                        classify_err = f"classification failed: {e}"
                emit(Response(req.req_id, req.path, True, res[0],
                              error=classify_err, prediction=label, probs=probs))

    # -- serving loop ------------------------------------------------------

    def _finish_pending(self, pending) -> None:
        """Finish a submitted round: collect, emit, guard double answers."""
        work, gathered, tracked_emit, emitted, t0 = pending
        try:
            self._finish_round(work, tracked_emit, emitted)
        except Exception as e:  # noqa: BLE001 — a bad round must not kill the server
            logger.exception("serving round failed")
            for r in gathered:
                if r.req_id not in emitted:  # never double-answer a request
                    tracked_emit(Response(r.req_id, r.path, False, None,
                                          f"round failed: {e}"))
        self._rounds += 1
        logger.info(
            "served %d clips in %.1f ms", len(gathered),
            (time.monotonic() - t0) * 1e3,
        )
        if self._rounds % self.stats_every == 0:
            logger.info("serving stats: %s", self.stats())

    def serve(self, requests: Iterable[Request], emit: Callable[[Response], None]):
        """Serve until `requests` is exhausted; blocks the calling thread.

        One round is kept in flight: round k's device programs execute while
        round k+1 gathers and decodes on the host (the same overlap the
        extraction pipeline gets from its prefetch thread). When the queue
        goes idle, the in-flight round is finished immediately, so light
        traffic never waits on a future round."""
        q: queue.Queue = queue.Queue()

        def reader():
            try:
                for r in requests:
                    q.put(r)
            finally:
                q.put(_STOP)

        t = threading.Thread(target=reader, daemon=True)
        t.start()

        done = False
        in_flight = None  # (work, gathered, tracked_emit, emitted, t0)
        while not done:
            if in_flight is not None:
                try:
                    first = q.get_nowait()
                except queue.Empty:
                    # idle queue: answer the in-flight round now rather than
                    # holding its responses hostage to future traffic
                    self._finish_pending(in_flight)
                    in_flight = None
                    continue
            else:
                first = q.get()
            if first is _STOP:
                break
            arrivals = {first.req_id: time.monotonic()}
            gathered = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(gathered) < self.max_clips:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is _STOP:
                    done = True
                    break
                arrivals[nxt.req_id] = time.monotonic()
                gathered.append(nxt)
            t0 = time.monotonic()

            def tracked_emit(resp: Response, _arr=arrivals, _t0=t0):
                self._latencies.append(
                    time.monotonic() - _arr.get(resp.req_id, _t0))
                if resp.ok:
                    self._served += 1
                else:
                    self._failed += 1
                emit(resp)

            emitted: set[str] = set()
            try:
                work = self._submit_round(gathered)
            except Exception as e:  # noqa: BLE001
                logger.exception("round submit failed")
                for r in gathered:
                    if r.req_id not in emitted:
                        tracked_emit(Response(r.req_id, r.path, False, None,
                                              f"round failed: {e}"))
                self._rounds += 1
                work = None
            # the new round's device work is queued; now drain the previous
            # round (its device time overlapped our gather + decode)
            if in_flight is not None:
                self._finish_pending(in_flight)
                in_flight = None
            if work is not None:
                in_flight = (work, gathered, tracked_emit, emitted, t0)
        if in_flight is not None:
            self._finish_pending(in_flight)
        t.join(timeout=1.0)


def jsonl_requests(lines: Iterable[str]) -> Iterator[Request]:
    """Parse JSONL requests: {"id": ..., "path": ...} (id optional)."""
    import json

    for n, line in enumerate(lines):
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
            yield Request(str(obj.get("id", n)), obj["path"])
        except Exception:  # noqa: BLE001
            # bare path lines are accepted too
            yield Request(str(n), line)
