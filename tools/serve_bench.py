#!/usr/bin/env python3
"""Load-test the micro-batching HTTP server (aocr.serve) end to end.

Starts a server in-process (fresh random model unless -model_dir given),
fires N single-image requests from C concurrent client threads, and
reports request throughput plus the server's batching stats — the tool
behind the serving numbers in docs/performance.md.

Usage: python tools/serve_bench.py [-model_dir D] [-n 1024] [-c 64]
       [-batch_window_ms 20] [-max_batch 64]
"""

import argparse
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from PIL import Image

    from aocr import serve as serve_mod
    from aocr.api import AttentionOCR
    from aocr.config import Config

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-model_dir", "--model_dir", default=None)
    p.add_argument("-n", "--n", type=int, default=1024)
    p.add_argument("-c", "--c", type=int, default=64)
    p.add_argument("-max_batch", "--max_batch", type=int, default=64)
    p.add_argument("-batch_window_ms", "--batch_window_ms", type=float,
                   default=20.0)
    p.add_argument("-artifact", "--artifact", default=None,
                   help="load-test a frozen .aocrx artifact instead of a "
                        "checkpoint (aocr.serve -artifact path)")
    p.add_argument("-group", "--group", type=int, default=1,
                   help="images per request: 1 = POST /recognize, >1 = "
                        "POST /recognize_batch with this many rows")
    args = p.parse_args(argv)

    cfg = Config(input_feed=True, compute_dtype="bfloat16")
    model_dir = args.model_dir
    if model_dir is None and args.artifact is None:
        model_dir = tempfile.mkdtemp(prefix="serve_bench_")
        AttentionOCR.create(cfg).save(model_dir)
        print(f"# random-weight model in {model_dir}", file=sys.stderr)

    ready = threading.Event()
    box = []
    kwargs = dict(host="127.0.0.1", port=0, max_batch=args.max_batch,
                  batch_window_ms=args.batch_window_ms,
                  ready_event=ready, server_box=box)
    if args.artifact:
        kwargs["artifact"] = args.artifact  # cfg is frozen in the artifact
    else:
        kwargs.update(model_dir=model_dir, cfg=cfg)
    threading.Thread(
        target=serve_mod.serve, kwargs=kwargs, daemon=True,
    ).start()
    assert ready.wait(1800), "server did not start"
    httpd, rec = box[0]
    port = httpd.server_address[1]
    print(f"# server on :{port}, ladder {rec.ladder}", file=sys.stderr)

    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    Image.fromarray(
        rng.uniform(0, 255, (cfg.image_height, cfg.image_width))
        .astype(np.uint8)
    ).save(buf, format="PNG")
    body = buf.getvalue()

    if args.group > 1:
        import base64

        batch_body = json.dumps({"images": [
            base64.b64encode(body).decode()] * args.group}).encode()

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/recognize_batch",
                data=batch_body, method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())
    else:
        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/recognize", data=body,
                method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

    post()  # single-request smoke outside the timed window
    ok, errors = [], []
    lock = threading.Lock()

    def worker(k):
        for _ in range(k):
            try:
                r = post()
                with lock:
                    ok.append(r)
            except Exception as e:
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(args.n // args.c,))
               for _ in range(args.c)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    stats = rec.snapshot_stats()
    lat = stats.pop("latency_s", {})
    # graceful drain: refuse new work, flush the queue, then stop — the
    # SIGTERM path (serve._graceful) exercised end to end
    drained = rec.drain(timeout_s=30.0)
    httpd.shutdown()
    images = len(ok) * args.group
    print(f"{len(ok)} ok / {len(errors)} errors in {dt:.2f}s = "
          f"{len(ok) / dt:.0f} req/s ({images / dt:.0f} img/s at "
          f"group={args.group}); drained={drained}; "
          f"server stats: {stats}")
    if lat:
        print(f"latency p50={lat.get('p50')}s p90={lat.get('p90')}s "
              f"p99={lat.get('p99')}s max={lat.get('max')}s "
              f"(n={lat.get('count')})")
    if errors:
        print("sample errors:", errors[:3])
        return 1
    if not drained:
        print("WARNING: queue did not drain within 30s")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
