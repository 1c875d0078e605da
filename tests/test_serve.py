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
    stats = recognizer.snapshot_stats()
    assert stats["requests"] >= len(words)
    assert stats["batched_rows"] >= len(words)
    assert stats["batches"] < stats["batched_rows"]
    # latency percentiles accumulate (public accessor, no lock reaching)
    lat = stats["latency_s"]
    assert lat["count"] >= len(words)
    assert 0 <= lat["p50"] <= lat["p99"] <= lat["max"]


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

def test_stats_endpoint_has_percentiles(server):
    base, _ = server
    with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
        snap = json.loads(r.read())
    assert "latency_s" in snap and "p99" in snap["latency_s"]
    assert snap["draining"] is False


def test_graceful_drain_flushes_queue_then_rejects(tmp_path):
    """SIGTERM semantics (recognizer.drain): everything already queued is
    decoded and returned; new submits are refused."""
    from aocr.serve import BatchingRecognizer, QueueFull

    ocr = AttentionOCR.create(CFG)
    rec = BatchingRecognizer(ocr, max_batch=8, batch_window_ms=50.0,
                             request_timeout_s=120.0)
    try:
        rec.warmup([1])
        img = synth.render_word("ab", 32, 32).astype(np.float32)
        results = []
        threads = [
            threading.Thread(target=lambda: results.append(
                rec.submit(img, 1)))
            for _ in range(5)
        ]
        for t in threads:
            t.start()
        assert rec.drain(timeout_s=60.0), "queue did not drain"
        for t in threads:
            t.join(timeout=60)
        assert len(results) == 5
        assert all(p.error is None and isinstance(p.text, str)
                   for p in results)
        with pytest.raises(QueueFull):
            rec.submit(img, 1)
        assert rec.snapshot_stats()["draining"] is True
    finally:
        rec.close()


def test_serve_with_dictionary(tmp_path):
    """-dictionary FILE constrains every served transcript to the word
    list (the reference's -use_dictionary as a serving feature)."""
    from aocr import serve as serve_mod

    d = str(tmp_path / "model")
    AttentionOCR.create(CFG).save(d)
    dict_file = tmp_path / "dict.txt"
    dictionary = ["ab", "cd", "zz", "a", "c", "z"]
    dict_file.write_text("\n".join(dictionary) + "\n")

    ready = threading.Event()
    box = []
    t = threading.Thread(
        target=serve_mod.serve,
        kwargs=dict(model_dir=d, host="127.0.0.1", port=0,
                    batch_window_ms=20.0, cfg=CFG, warmup_beams=(2,),
                    ready_event=ready, server_box=box,
                    dictionary_path=str(dict_file)),
        daemon=True,
    )
    t.start()
    assert ready.wait(120), "server did not start"
    httpd, recognizer = box[0]
    port = httpd.server_address[1]
    try:
        for word in ("ab", "qq"):  # qq is out-of-dictionary on purpose
            for beam in ("", "?beam_size=2"):
                status, payload = _post(
                    f"http://127.0.0.1:{port}/recognize{beam}",
                    _png_bytes(word))
                assert status == 200
                assert payload["text"] in dictionary + [""], payload
    finally:
        httpd.shutdown()
        recognizer.close()


def test_width_ladder_under_keep_aspect_ratio():
    """-keep_aspect_ratio serving pads widths up to a fixed ladder so only
    pre-compiled shapes are ever decoded (no mid-traffic XLA compile)."""
    from aocr.serve import BatchingRecognizer

    cfg = CFG.replace(keep_aspect_ratio=True)
    ocr = AttentionOCR.create(cfg)
    rec = BatchingRecognizer(ocr, max_batch=4)
    try:
        ladder = rec.width_ladder
        assert ladder is not None and ladder[0] >= 8
        assert ladder[-1] == int(cfg.image_height * cfg.max_aspect_ratio)
        # strictly increasing, bounded fan-out
        assert all(a < b for a, b in zip(ladder, ladder[1:]))
        assert len(ladder) < 12
        img = np.zeros((32, 33), np.float32)
        padded = rec.pad_width(img)
        assert padded.shape[1] in ladder and padded.shape[1] >= 33
        # exact ladder width passes through unchanged
        img2 = np.zeros((32, ladder[1]), np.float32)
        assert rec.pad_width(img2) is img2
        # padding is background-colored (255 pre-normalization)
        assert (padded[:, 33:] == 255.0).all()
    finally:
        rec.close()


def test_fixed_width_has_no_ladder():
    from aocr.serve import BatchingRecognizer

    ocr = AttentionOCR.create(CFG)
    rec = BatchingRecognizer(ocr, max_batch=4)
    try:
        assert rec.width_ladder is None
        img = np.zeros((32, 33), np.float32)
        assert rec.pad_width(img) is img
    finally:
        rec.close()


def test_num_shards_serving(tmp_path):
    """-num_shards: the server's coalesced batches shard over the device
    mesh; transcripts must be identical to single-device serving."""
    d = str(tmp_path / "model")
    AttentionOCR.create(CFG).save(d)

    from aocr import serve as serve_mod

    ready = threading.Event()
    box = []
    t = threading.Thread(
        target=serve_mod.serve,
        kwargs=dict(model_dir=d, host="127.0.0.1", port=0,
                    batch_window_ms=60.0, cfg=CFG, ready_event=ready,
                    server_box=box, num_shards=4),
        daemon=True,
    )
    t.start()
    assert ready.wait(120), "sharded server did not start"
    httpd, recognizer = box[0]
    assert recognizer.ocr.num_shards == 4
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        words = ["ab", "cd", "ef"]
        expected, _ = recognizer.ocr.unshard().recognize(
            [synth.render_word(w, 32, 32).astype(np.float32)
             for w in words])
        recognizer.ocr.shard(4)
        results = [None] * len(words)

        def post_one(i):
            results[i] = _post(f"{base}/recognize", _png_bytes(words[i]))

        threads = [threading.Thread(target=post_one, args=(i,))
                   for i in range(len(words))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(60)
        assert all(r is not None for r in results), results
        assert len(results) == len(expected)
        for (status, payload), want in zip(results, expected):
            assert status == 200
            assert payload["text"] == want
    finally:
        httpd.shutdown()
        recognizer.close()


def test_serve_artifact(tmp_path):
    """-artifact serves a frozen .aocrx program: transcripts match the
    live model, the frozen beam size is enforced, and decode-mode knobs
    are rejected up front."""
    from aocr import export as export_lib
    from aocr import serve as serve_mod

    ocr = AttentionOCR.create(CFG)
    art = str(tmp_path / "m.aocrx")
    export_lib.export_recognizer(ocr, art)

    ready = threading.Event()
    box = []
    t = threading.Thread(
        target=serve_mod.serve,
        kwargs=dict(artifact=art, host="127.0.0.1", port=0,
                    batch_window_ms=20.0, ready_event=ready,
                    server_box=box),
        daemon=True,
    )
    t.start()
    assert ready.wait(120), "artifact server did not start"
    httpd, recognizer = box[0]
    port = httpd.server_address[1]
    try:
        status, payload = _post(f"http://127.0.0.1:{port}/recognize",
                                _png_bytes("ab"))
        assert status == 200
        img = synth.render_word("ab", 32, 32).astype(np.float32)
        want, _ = ocr.recognize(img[None])
        assert payload["text"] == want[0]
        # the artifact's frozen beam size is the only one served
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize?beam_size=5",
            data=_png_bytes("ab"), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        recognizer.close()
    # frozen-knob combinations fail fast
    with pytest.raises(ValueError, match="frozen into the artifact"):
        serve_mod.serve(artifact=art, dictionary_path="words.txt")
    with pytest.raises(ValueError, match="exactly one"):
        serve_mod.serve()


def test_pinned_artifact_skips_ladder_padding(tmp_path):
    """A pinned-batch artifact has ONE compiled device shape; the batcher
    must not ladder-pad request groups on top of the artifact's own
    chunking (pure wasted decode rows)."""
    from aocr import export as export_lib
    from aocr.export import ExportedRecognizer
    from aocr.serve import BatchingRecognizer, _ArtifactRecognizer

    ocr = AttentionOCR.create(CFG)
    art = str(tmp_path / "m.aocrx")
    export_lib.export_recognizer(ocr, art, batch=2)
    facade = _ArtifactRecognizer(ExportedRecognizer.load(art))
    assert facade.fixed_device_batch == 2
    rec = BatchingRecognizer(facade, max_batch=8, batch_window_ms=5.0,
                             fixed_device_batch=facade.fixed_device_batch)
    try:
        assert rec._pad_to(5) == 5  # no ladder padding
        assert rec.ladder == [2]  # warmup compiles exactly one shape
        rec.warmup([facade.beam_size])
        img = synth.render_word("ab", 32, 32).astype(np.float32)
        p = rec.submit(img, facade.beam_size)
        assert p.error is None and isinstance(p.text, str)
        assert rec.snapshot_stats()["padded_rows"] == 0
    finally:
        rec.close()


def test_multi_width_artifact_serving(tmp_path):
    """A keep_aspect_ratio model exports one program per width-ladder
    step; the batcher adopts the ARTIFACT'S ladder and mixed-width
    groups decode through the right programs."""
    from aocr import data as data_lib
    from aocr import export as export_lib
    from aocr.export import ExportedRecognizer
    from aocr.serve import BatchingRecognizer, _ArtifactRecognizer

    cfg = CFG.replace(keep_aspect_ratio=True, min_aspect_ratio=0.5,
                      max_aspect_ratio=1.0)
    ocr = AttentionOCR.create(cfg)
    ladder = data_lib.width_ladder(cfg)
    art = str(tmp_path / "mw.aocrx")
    export_lib.export_recognizer(ocr, art)  # defaults to the ladder
    facade = _ArtifactRecognizer(ExportedRecognizer.load(art))
    assert facade.serving_width_ladder == ladder
    assert facade.cfg.keep_aspect_ratio is True
    rec = BatchingRecognizer(facade, max_batch=8, batch_window_ms=30.0)
    try:
        assert rec.width_ladder == ladder
        rec.warmup([facade.beam_size])
        imgs = [synth.render_word("ab", 32, 18).astype(np.float32),
                synth.render_word("cd", 32, 32).astype(np.float32)]
        results = []
        threads = [threading.Thread(
            target=lambda im=im: results.append(rec.submit(
                rec.pad_width(im), facade.beam_size))) for im in imgs]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 2
        assert all(p.error is None and isinstance(p.text, str)
                   for p in results)
    finally:
        rec.close()


def test_recognize_batch_endpoint(server):
    """POST /recognize_batch decodes many images in ONE request/device
    batch, results in input order; malformed bodies get 400."""
    import base64

    base, recognizer = server
    words = ["ab", "cd", "ef"]
    body = json.dumps({"images": [
        base64.b64encode(_png_bytes(w)).decode() for w in words
    ]}).encode()
    before = recognizer.snapshot_stats()["batches"]
    status, payload = _post(f"{base}/recognize_batch", body)
    assert status == 200
    results = payload["results"]
    assert len(results) == 3
    # input order: each row matches the single-image endpoint's answer
    for w, r in zip(words, results):
        s_one, p_one = _post(f"{base}/recognize", _png_bytes(w))
        assert s_one == 200 and r["text"] == p_one["text"]
    # the three rows coalesced (1 or 2 batches, not 3 single-row ones)
    after_batch_rows = recognizer.snapshot_stats()
    assert after_batch_rows["batches"] >= before + 1
    # malformed body
    req = urllib.request.Request(f"{base}/recognize_batch",
                                 data=b"junk", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
