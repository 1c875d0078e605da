"""Micro-batching HTTP serving front-end (aocr.serve): concurrent
single-image requests must coalesce into device batches and return
correct transcripts."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from aocr.api import AttentionOCR
from aocr.config import Config
from tests import synth

CFG = Config(input_feed=True, encoder_num_hidden=16,
             target_embedding_size=8, max_decoder_l=8, image_width=32)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve_model"))
    AttentionOCR.create(CFG).save(d)

    from aocr import serve as serve_mod

    ready = threading.Event()
    box = []
    t = threading.Thread(
        target=serve_mod.serve,
        kwargs=dict(model_dir=d, host="127.0.0.1", port=0,
                    batch_window_ms=80.0, cfg=CFG, warmup_beams=(2,),
                    ready_event=ready, server_box=box),
        daemon=True,
    )
    t.start()
    assert ready.wait(60), "server did not start"
    httpd, recognizer = box[0]
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", recognizer
    httpd.shutdown()


def _png_bytes(word: str) -> bytes:
    from PIL import Image

    arr = synth.render_word(word, 32, 32).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_recognize_and_batching(server):
    base, recognizer = server
    words = ["ab", "cd", "ef", "gh", "ij", "kl"]
    bodies = [_png_bytes(w) for w in words]
    results = [None] * len(words)

    def post_one(i):
        results[i] = _post(f"{base}/recognize", bodies[i])

    threads = [threading.Thread(target=post_one, args=(i,))
               for i in range(len(words))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for status, payload in results:
        assert status == 200
        assert isinstance(payload["text"], str)
        assert payload["score"] <= 0.0
    # batching actually coalesced rows: every request went through a batch,
    # and with an 80 ms window the 6 concurrent posts needed fewer batches
    with recognizer._lock:
        stats = dict(recognizer.stats)
    assert stats["requests"] >= len(words)
    assert stats["batched_rows"] >= len(words)
    assert stats["batches"] < stats["batched_rows"]


def test_health_stats_and_errors(server):
    base, _ = server
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        assert r.status == 200 and json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
        assert "requests" in json.loads(r.read())
    # undecodable body -> 400
    req = urllib.request.Request(f"{base}/recognize", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # a warmed beam_size override answers; an un-warmed one is refused
    # (it would compile on the batcher thread and stall all traffic)
    status, payload = _post(f"{base}/recognize?beam_size=2",
                            _png_bytes("zz"))
    assert status == 200 and isinstance(payload["text"], str)
    req = urllib.request.Request(f"{base}/recognize?beam_size=7",
                                 data=_png_bytes("zz"), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e2:
        urllib.request.urlopen(req, timeout=30)
    assert e2.value.code == 400
    assert json.loads(e2.value.read())["allowed"] == [1, 2]