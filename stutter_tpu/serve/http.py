"""HTTP frontend over the batching EmbeddingServer (stdlib only).

No reference equivalent (the reference is batch scripts only —
WavLM_embeddings.py:436-658). This turns the latency-bounded batching
server into a network service: each HTTP request blocks its own handler
thread until the serving loop answers it, so concurrent requests are
gathered into shared device batches exactly like JSONL ones.

Endpoints:
- ``POST /embed`` with a JSON body ``{"path": "/abs/clip.wav"}`` — embed a
  file already on the server's filesystem.
- ``POST /embed`` with raw audio bytes (any non-JSON content type) — the
  body is spooled to a temp file, embedded, and the temp file removed.
- ``GET /stats`` — the EmbeddingServer's latency/volume counters.
- ``GET /healthz`` — liveness probe.

Responses are JSON: ``{"id", "ok", "embeddings": {column: [floats]}}`` on
success; ``{"id", "ok": false, "error"}`` with status 422 on decode/batch
failure; 400 on malformed requests.
"""

from __future__ import annotations

import itertools
import json
import os
import queue
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Iterator

import numpy as np

from stutter_tpu.serve.server import EmbeddingServer, Request, Response
from stutter_tpu.utils.logging import get_logger

logger = get_logger("serve.http")

_MAX_BODY_BYTES = 64 * 1024 * 1024  # 64 MB ≈ 35 min of 16 kHz s16 mono


class _Waiter:
    __slots__ = ("event", "response")

    def __init__(self):
        self.event = threading.Event()
        self.response: Response | None = None


class HttpEmbeddingFrontend:
    """Bridges HTTP handler threads to one EmbeddingServer serving loop.

    The serving loop consumes a queue-backed request stream; each handler
    thread enqueues its Request and blocks on a per-request event that the
    loop's emit callback sets. Port 0 binds an ephemeral port (tests).
    """

    def __init__(
        self,
        server: EmbeddingServer,
        host: str = "127.0.0.1",
        port: int = 8000,
        request_timeout_s: float = 120.0,
    ):
        self.server = server
        self.request_timeout_s = request_timeout_s
        self._queue: queue.Queue = queue.Queue()
        self._stop = object()
        self._waiters: dict[str, _Waiter] = {}
        self._lock = threading.Lock()
        self._ids = itertools.count()
        self.httpd = ThreadingHTTPServer((host, port), _handler_class(self))
        self.host, self.port = self.httpd.server_address[0], self.httpd.server_address[1]
        self._serve_thread: threading.Thread | None = None
        self._http_thread: threading.Thread | None = None

    # -- serving-loop side -------------------------------------------------

    def _request_stream(self) -> Iterator[Request]:
        while True:
            r = self._queue.get()
            if r is self._stop:
                return
            yield r

    def _emit(self, resp: Response) -> None:
        with self._lock:
            waiter = self._waiters.pop(resp.req_id, None)
        if waiter is None:  # handler gave up (timeout) — drop the late answer
            logger.warning("dropping response for timed-out request %s", resp.req_id)
            return
        waiter.response = resp
        waiter.event.set()

    # -- handler side ------------------------------------------------------

    def submit(self, path: str) -> Response:
        """Enqueue one path and block until the serving loop answers."""
        req_id = f"h{next(self._ids)}"
        waiter = _Waiter()
        with self._lock:
            self._waiters[req_id] = waiter
        self._queue.put(Request(req_id, path))
        if not waiter.event.wait(self.request_timeout_s):
            with self._lock:
                self._waiters.pop(req_id, None)
            return Response(req_id, path, False, None,
                            f"timed out after {self.request_timeout_s:.0f}s")
        return waiter.response

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        self._serve_thread = threading.Thread(
            target=self.server.serve, args=(self._request_stream(), self._emit),
            daemon=True, name="embed-serving-loop",
        )
        self._serve_thread.start()
        self._http_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True, name="http-listener",
        )
        self._http_thread.start()
        logger.info("HTTP embedding server listening on %s:%d", self.host, self.port)

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self._queue.put(self._stop)
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=5.0)

    def serve_forever(self) -> None:
        """Blocking entry for the CLI; Ctrl-C shuts down cleanly."""
        self.start()
        try:
            while self._http_thread.is_alive():
                self._http_thread.join(timeout=0.5)
        except KeyboardInterrupt:
            logger.info("interrupt — shutting down")
        finally:
            self.shutdown()


def _handler_class(frontend: HttpEmbeddingFrontend):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, status: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_response(self, resp: Response) -> None:
            if resp.ok:
                obj = {
                    "id": resp.req_id, "ok": True,
                    "embeddings": {
                        k: np.asarray(v, np.float32).tolist()
                        for k, v in resp.embeddings.items()
                    },
                }
                if resp.prediction is not None:
                    obj["prediction"] = resp.prediction
                    if resp.probs is not None:
                        obj["probs"] = resp.probs
                if resp.error:  # ok but classification failed — surface it
                    obj["error"] = resp.error
                self._reply(200, obj)
            else:
                self._reply(422, {"id": resp.req_id, "ok": False, "error": resp.error})

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                self._reply(200, frontend.server.stats())
            else:
                self._reply(404, {"ok": False, "error": f"no such path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/embed":
                self._reply(404, {"ok": False, "error": f"no such path {self.path}"})
                return
            length = int(self.headers.get("Content-Length") or 0)
            if length <= 0 or length > _MAX_BODY_BYTES:
                # the unread body would desynchronize an HTTP/1.1 keep-alive
                # connection (the next request line parses mid-body) — drop
                # the connection after replying instead of draining >64 MB
                self.close_connection = True
                self._reply(400, {"ok": False,
                                  "error": f"body required (<= {_MAX_BODY_BYTES} bytes)"})
                return
            body = self.rfile.read(length)
            ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
            if ctype == "application/json":
                try:
                    path = json.loads(body)["path"]
                except Exception:  # noqa: BLE001
                    self._reply(400, {"ok": False,
                                      "error": 'JSON body must be {"path": ...}'})
                    return
                self._reply_response(frontend.submit(path))
            else:
                # raw audio bytes: spool to a temp file for the decode pool
                fd, tmp = tempfile.mkstemp(suffix=".wav", prefix="serve_http_")
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(body)
                    self._reply_response(frontend.submit(tmp))
                finally:
                    try:
                        os.unlink(tmp)
                    except OSError:
                        pass

        def log_message(self, fmt, *args):  # route access logs to our logger
            logger.debug("%s - %s", self.address_string(), fmt % args)

    return Handler
