"""Micro-batching HTTP serving front-end.

The reference has no serving path at all (SURVEY.md §1: "no serving
path"); the CLI's `-phase test` is its only inference surface.  This
module is the production-serving counterpart for the rebuilt framework:
a threaded HTTP server whose concurrent single-image requests are
coalesced into device batches — the TPU sees large batched `recognize`
calls (where it runs at tens of thousands of images/sec,
docs/performance.md) instead of batch-1 decodes.

Design:
- request threads decode bytes -> (32, W) luminance on the host (PIL
  releases the GIL, so ingest parallelizes) and enqueue
- one batcher thread drains the queue, groups by beam size, waits at
  most `batch_window_ms` to fill up to `max_batch` rows, and runs ONE
  `AttentionOCR.recognize` per group (mixed widths bucket internally)
- results flow back through per-request events

Run:  python -m aocr.serve -model_dir train/ -port 8000
POST /recognize     body = encoded image (PNG/JPEG/...); optional
                    ?beam_size=K.  -> {"text": ..., "score": ...}
GET  /healthz       -> {"status": "ok", ...}
GET  /stats         -> request/batch counters (batching effectiveness)
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from aocr import data
from aocr.api import AttentionOCR
from aocr.config import Config


class _Pending:
    __slots__ = ("image", "beam_size", "event", "text", "score", "error")

    def __init__(self, image: np.ndarray, beam_size: int):
        self.image = image
        self.beam_size = beam_size
        self.event = threading.Event()
        self.text: Optional[str] = None
        self.score: Optional[float] = None
        self.error: Optional[str] = None


class BatchingRecognizer:
    """Coalesce concurrent recognize() calls into device batches."""

    def __init__(self, ocr: AttentionOCR, max_batch: int = 64,
                 batch_window_ms: float = 5.0):
        self.ocr = ocr
        self.max_batch = max_batch
        self.window_s = batch_window_ms / 1000.0
        self.q: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "batched_rows": 0,
                      "errors": 0}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def submit(self, image: np.ndarray, beam_size: int,
               timeout_s: float = 30.0) -> _Pending:
        p = _Pending(image, beam_size)
        with self._lock:
            self.stats["requests"] += 1
        self.q.put(p)
        if not p.event.wait(timeout_s):
            p.error = "timeout"
        return p

    def _drain(self) -> list:
        """Block for one request, then collect until max_batch or the
        batching window closes."""
        try:
            first = self.q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self.q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            by_beam: dict = {}
            for p in batch:
                by_beam.setdefault(p.beam_size, []).append(p)
            for beam, group in by_beam.items():
                try:
                    words, scores = self.ocr.recognize(
                        [p.image for p in group], beam_size=beam)
                    for p, w, s in zip(group, words, scores):
                        p.text, p.score = w, float(s)
                except Exception as e:  # surface per-request, keep serving
                    with self._lock:
                        self.stats["errors"] += len(group)
                    for p in group:
                        p.error = f"{type(e).__name__}: {e}"
                with self._lock:
                    self.stats["batches"] += 1
                    self.stats["batched_rows"] += len(group)
                for p in group:
                    p.event.set()


def make_handler(recognizer: BatchingRecognizer, cfg: Config):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet; stats endpoint instead
            pass

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {"status": "ok",
                                 "model_params": True})
            elif self.path.startswith("/stats"):
                with recognizer._lock:
                    self._json(200, dict(recognizer.stats))
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if not self.path.startswith("/recognize"):
                self._json(404, {"error": "not found"})
                return
            beam = cfg.beam_size
            if "beam_size=" in self.path:
                try:
                    beam = int(self.path.split("beam_size=")[1]
                               .split("&")[0])
                except ValueError:
                    self._json(400, {"error": "bad beam_size"})
                    return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body"})
                return
            raw = self.rfile.read(length)
            img = data.load_and_preprocess(raw, cfg)
            if img is None:
                self._json(400, {"error": "cannot decode image"})
                return
            p = recognizer.submit(img, beam)
            if p.error is not None:
                self._json(500, {"error": p.error})
            else:
                self._json(200, {"text": p.text, "score": p.score})

    return Handler


def serve(model_dir: str, host: str = "0.0.0.0", port: int = 8000,
          max_batch: int = 64, batch_window_ms: float = 5.0,
          cfg: Optional[Config] = None,
          ready_event: Optional[threading.Event] = None,
          server_box: Optional[list] = None):
    ocr = AttentionOCR.load(model_dir, cfg=cfg)
    recognizer = BatchingRecognizer(ocr, max_batch, batch_window_ms)
    handler = make_handler(recognizer, ocr.cfg)
    httpd = ThreadingHTTPServer((host, port), handler)
    if server_box is not None:
        server_box.append((httpd, recognizer))
    print(f"serving {model_dir} on {host}:{httpd.server_address[1]} "
          f"(max_batch={max_batch}, window={batch_window_ms}ms)")
    if ready_event is not None:
        ready_event.set()
    try:
        httpd.serve_forever()
    finally:
        recognizer.close()


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="aocr.serve", description="micro-batching OCR HTTP server")
    p.add_argument("-model_dir", "--model_dir", required=True)
    p.add_argument("-host", "--host", default="0.0.0.0")
    p.add_argument("-port", "--port", type=int, default=8000)
    p.add_argument("-max_batch", "--max_batch", type=int, default=64)
    p.add_argument("-batch_window_ms", "--batch_window_ms", type=float,
                   default=5.0)
    p.add_argument("-beam_size", "--beam_size", type=int, default=None)
    args = p.parse_args(argv)
    cfg = Config(beam_size=args.beam_size) if args.beam_size else None
    serve(args.model_dir, args.host, args.port, args.max_batch,
          args.batch_window_ms, cfg)


if __name__ == "__main__":
    main()
