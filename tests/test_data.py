import os

import numpy as np
import pytest

from aocr import data, vocab
from aocr.config import Config
from tests import synth


@pytest.fixture
def cfg():
    return Config(batch_size=4, seed=0)


def test_load_and_preprocess_npy(tmp_path, cfg):
    img = np.random.RandomState(0).uniform(0, 255, (32, 100)).astype(np.float32)
    p = tmp_path / "x.npy"
    np.save(p, img)
    out = data.load_and_preprocess(str(p), cfg)
    assert out.shape == (32, 100)
    np.testing.assert_allclose(out, img, rtol=1e-5)


def test_load_and_preprocess_resizes(tmp_path, cfg):
    img = np.random.RandomState(0).uniform(0, 255, (64, 300)).astype(np.float32)
    p = tmp_path / "x.npy"
    np.save(p, img)
    out = data.load_and_preprocess(str(p), cfg)
    # width hard-coded to 100 (reference data_gen.lua:78)
    assert out.shape == (32, 100)


def test_keep_aspect_ratio(tmp_path):
    cfg = Config(keep_aspect_ratio=True)
    img = np.zeros((32, 64), np.float32)
    p = tmp_path / "x.npy"
    np.save(p, img)
    out = data.load_and_preprocess(str(p), cfg)
    assert out.shape == (32, 64)  # aspect 2.0 * 32 = 64
    # clamping at max_aspect_ratio 10 -> width 320
    img2 = np.zeros((10, 1000), np.float32)
    p2 = tmp_path / "y.npy"
    np.save(p2, img2)
    out2 = data.load_and_preprocess(str(p2), cfg)
    assert out2.shape == (32, 320)


def test_snap_width_ladder(tmp_path):
    """-snap_width_ladder: aspect-resized widths background-pad UP to the
    shared serving/export ladder (same treatment as serve.pad_width), so
    natural-width corpora compile one program per ladder step, not one
    per distinct word width."""
    cfg = Config(keep_aspect_ratio=True, snap_width_ladder=True).validate()
    ladder = data.width_ladder(cfg)
    img = np.full((32, 70), 13.0, np.float32)  # aspect width 70
    p = tmp_path / "x.npy"
    np.save(p, img)
    out = data.load_and_preprocess(str(p), cfg)
    step = min(s for s in ladder if s >= 70)
    assert out.shape == (32, step)
    np.testing.assert_allclose(out[:, :70], img, rtol=1e-5)
    assert (out[:, 70:] == 255.0).all()  # background padding, not stretch
    # exact ladder width: untouched
    img2 = np.full((32, ladder[2]), 9.0, np.float32)
    p2 = tmp_path / "y.npy"
    np.save(p2, img2)
    assert data.load_and_preprocess(str(p2), cfg).shape == (32, ladder[2])
    # geometry produces ONLY ladder widths across a spread of aspects
    for w in (17, 33, 100, 201, 319):
        np.save(p, np.zeros((32, w), np.float32))
        assert data.load_and_preprocess(str(p), cfg).shape[1] in ladder
    # composition guard: host-side padding can't ride device preprocess
    with pytest.raises(AssertionError):
        Config(keep_aspect_ratio=True, snap_width_ladder=True,
               device_preprocess=True).validate()


def test_decode_error_returns_none(tmp_path, cfg):
    p = tmp_path / "bad.png"
    p.write_bytes(b"not an image")
    assert data.load_and_preprocess(str(p), cfg) is None


def test_batching_full_and_partial(tmp_path, cfg):
    labels = ["ab", "cde", "f", "gh", "ij", "kl", "mn", "op", "qr"]  # 9 items
    synth.make_dataset(str(tmp_path), labels)
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    assert gen.size() == 9
    batches = list(gen.epoch(4))
    # 2 full batches of 4 + 1 partial flush of 1 (reference
    # data_gen.lua:96,125-153)
    assert [b.images.shape[0] for b in batches] == [4, 4, 1]
    assert batches[0].images.shape[1:] == (32, 100, 1)
    # epoch reset: next call starts a fresh sweep
    batches2 = list(gen.epoch(4))
    assert [b.images.shape[0] for b in batches2] == [4, 4, 1]


def test_batch_payload(tmp_path, cfg):
    synth.make_dataset(str(tmp_path), ["ab", "wxyz"])
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    b = gen.next_batch(2)
    assert b.targets.shape == b.targets_eval.shape == (2, 5)
    assert b.targets[0, 0] == vocab.GO
    assert b.num_nonzeros == 8  # (2+1) + (4+1)
    assert len(b.img_paths) == 2
    # images carry the rendered content
    assert b.images.dtype == np.float32
    assert 0 <= b.images.min() and b.images.max() <= 255


def test_corrupt_image_skipped(tmp_path, cfg):
    synth.make_dataset(str(tmp_path), ["ab", "cd"])
    with open(os.path.join(str(tmp_path), "images/bad.npy"), "wb") as f:
        f.write(b"junk")
    with open(os.path.join(str(tmp_path), "train.txt"), "a") as f:
        f.write("images/bad.npy zz\n")
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    batches = list(gen.epoch(4))
    assert sum(b.images.shape[0] for b in batches) == 2  # bad entry skipped


def test_width_bucketing(tmp_path):
    cfg = Config(keep_aspect_ratio=True, batch_size=2, seed=0)
    # two widths: 64 (aspect 2) and 96 (aspect 3)
    for i, (h, w, label) in enumerate(
        [(32, 64, "aa"), (32, 96, "bb"), (32, 64, "cc"), (32, 96, "dd")]
    ):
        np.save(os.path.join(str(tmp_path), f"{i}.npy"), np.zeros((h, w), np.float32))
    with open(os.path.join(str(tmp_path), "train.txt"), "w") as f:
        for i, label in enumerate(["aa", "bb", "cc", "dd"]):
            f.write(f"{i}.npy {label}\n")
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    batches = list(gen.epoch(2))
    widths = sorted(b.images.shape[2] for b in batches)
    assert widths == [64, 96]
    for b in batches:
        assert b.images.shape[0] == 2  # same-width items batched together


def test_shuffle_deterministic(tmp_path, cfg):
    synth.make_dataset(str(tmp_path), [f"w{i}" for i in range(10)])
    g1 = data.DataGen(str(tmp_path), "train.txt", cfg)
    g2 = data.DataGen(str(tmp_path), "train.txt", cfg)
    g1.shuffle()
    g2.shuffle()
    assert [l[0] for l in g1.lines] == [l[0] for l in g2.lines]


def test_overlong_label_truncated(tmp_path):
    """Fair max-target-length cap (reference open TODO README.md:12): labels
    longer than max_decoder_l-1 are truncated instead of crashing."""
    cfg = Config(batch_size=2, max_decoder_l=5, seed=0)
    synth.make_dataset(str(tmp_path), ["abcdefghij", "xy"])
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    b = gen.next_batch(2)
    assert b.targets.shape[1] <= cfg.max_decoder_l
    # first label truncated to 4 chars
    from aocr import vocab as v
    row = [int(t) for t in b.targets_eval[0]]
    decoded = v.decode(row)
    assert decoded == "abcd"


def test_prefetched_preserves_batches(tmp_path, cfg):
    synth.make_dataset(str(tmp_path), [f"w{i}" for i in range(9)])
    g1 = data.DataGen(str(tmp_path), "train.txt", cfg)
    g2 = data.DataGen(str(tmp_path), "train.txt", cfg)
    plain = list(g1.epoch(4))
    pre = list(data.prefetched(g2.epoch(4), depth=2))
    assert len(plain) == len(pre)
    for a, b in zip(plain, pre):
        np.testing.assert_array_equal(a.images, b.images)
        np.testing.assert_array_equal(a.targets, b.targets)
    # depth 0 passthrough
    assert len(list(data.prefetched(g1.epoch(4), 0))) == len(plain)


def test_prefetched_propagates_errors(tmp_path, cfg):
    def boom():
        yield 1
        raise RuntimeError("worker died")
    it = data.prefetched(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_cache_disabled_redecodes(tmp_path):
    cfg = Config(batch_size=2, cache_images=False, seed=0)
    synth.make_dataset(str(tmp_path), ["ab", "cd"])
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    b1 = list(gen.epoch(2))
    b2 = list(gen.epoch(2))
    np.testing.assert_array_equal(b1[0].images, b2[0].images)
    # no ndarrays held in the manifest records
    assert not any(isinstance(r[2], np.ndarray) for r in gen.lines)


def test_shard_partitions_manifest(tmp_path, cfg):
    synth.make_dataset(str(tmp_path), [f"w{i}" for i in range(10)])
    gens = [data.DataGen(str(tmp_path), "train.txt", cfg).shard(i, 3)
            for i in range(3)]
    sizes = [g.size() for g in gens]
    assert sum(sizes) == 10 and sizes == [4, 3, 3]
    all_paths = sorted(p for g in gens for p, *_ in g.lines)
    full = data.DataGen(str(tmp_path), "train.txt", cfg)
    assert all_paths == sorted(p for p, *_ in full.lines)


def test_transient_decode_failure_retried(tmp_path, cfg):
    """A decode failure is retried next sweep (reference per-epoch pcall),
    so a file that appears later is picked up."""
    synth.make_dataset(str(tmp_path), ["ab"])
    bad = os.path.join(str(tmp_path), "late.npy")
    with open(bad, "wb") as f:
        f.write(b"junk")
    with open(os.path.join(str(tmp_path), "train.txt"), "a") as f:
        f.write("late.npy cd\n")
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    assert sum(b.images.shape[0] for b in gen.epoch(4)) == 1  # bad skipped
    np.save(bad, np.zeros((32, 100), np.float32))  # file becomes valid
    assert sum(b.images.shape[0] for b in gen.epoch(4)) == 2  # retried


def test_close_releases_pool(tmp_path, cfg):
    synth.make_dataset(str(tmp_path), ["ab"])
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    assert gen._pool is not None
    gen.close()
    assert gen._pool is None
    gen.close()  # idempotent


def test_prefetched_early_abandon_is_safe(tmp_path, cfg):
    """Breaking out of a prefetched epoch must not leave a worker mutating
    the DataGen; a fresh full epoch afterwards sees every sample once."""
    synth.make_dataset(str(tmp_path), [f"w{i}" for i in range(9)])
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    it = data.prefetched(gen.epoch(2), depth=2)
    next(it)
    it.close()  # abandon mid-epoch; joins the worker
    gen.cursor = 0
    gen.buffer.clear()
    total = sum(b.images.shape[0] for b in gen.epoch(9))
    assert total == 9


def test_pad_targets_fixed_length(tmp_path):
    """-pad_targets pads every batch's targets to max_decoder_l: ONE
    compiled train program regardless of the batch's word-length mix
    (without it, targets pad to the per-batch max)."""
    from aocr.config import Config

    d = str(tmp_path)
    synth.make_dataset(d, ["ab", "cdef", "g", "hi"], "t.txt", width=32)
    cfg = Config(data_base_dir=d, data_path="t.txt", image_width=32,
                 max_decoder_l=12, pad_targets=True, cache_images=False)
    gen = data.DataGen(d, "t.txt", cfg)
    b = gen.next_batch(4)
    assert b.targets.shape == (4, 12)
    assert b.targets_eval.shape == (4, 12)
    # default behavior unchanged: batch-max padding
    cfg2 = cfg.replace(pad_targets=False)
    gen2 = data.DataGen(d, "t.txt", cfg2)
    b2 = gen2.next_batch(4)
    assert b2.targets.shape[1] == 5  # 'cdef' -> GO+4 = 5 columns


def test_malformed_npy_skipped(tmp_path, cfg):
    """A .npy with the wrong rank must be SKIPPED (pcall-skip contract),
    not crash the epoch — in both host- and device-preprocess modes."""
    synth.make_dataset(str(tmp_path), ["ab"])
    np.save(os.path.join(str(tmp_path), "vec.npy"),
            np.zeros((512,), np.float32))
    np.save(os.path.join(str(tmp_path), "batch4d.npy"),
            np.zeros((2, 32, 100, 1), np.float32))
    with open(os.path.join(str(tmp_path), "train.txt"), "a") as f:
        f.write("vec.npy cd\nbatch4d.npy ef\n")
    gen = data.DataGen(str(tmp_path), "train.txt", cfg)
    assert sum(b.images.shape[0] for b in gen.epoch(4)) == 1
    gen_dev = data.DataGen(str(tmp_path), "train.txt",
                           cfg.replace(device_preprocess=True))
    assert sum(b.rows for b in gen_dev.epoch(4)) == 1


def test_oov_labels_skipped_at_manifest_load(tmp_path, cfg):
    """Out-of-vocab labels are skipped ONCE at manifest load (not
    image-decoded and discarded every sweep) and reported through the
    injected logger."""
    synth.make_dataset(str(tmp_path), ["ab", "cd"])
    with open(os.path.join(str(tmp_path), "train.txt"), "a") as f:
        f.write("x.png ÜBER\ny.png w!rd\n")
    logged = []
    gen = data.DataGen(str(tmp_path), "train.txt", cfg, log=logged.append)
    assert gen.size() == 2  # the two valid rows only
    assert any("out-of-vocab" in m for m in logged)


def test_truncation_logged_at_manifest_load(tmp_path):
    cfg = Config(batch_size=2, max_decoder_l=5, image_width=32)
    synth.make_dataset(str(tmp_path), ["abcdefghij", "xy"])
    logged = []
    gen = data.DataGen(str(tmp_path), "train.txt", cfg, log=logged.append)
    assert any("truncat" in m for m in logged)
    b = gen.next_batch(2)
    row = [int(t) for t in b.targets_eval[0]]
    assert vocab.decode(row) == "abcd"


def test_prefetched_close_waits_for_worker():
    """Closing a prefetched() iterator early must not return while the
    worker thread is still inside the underlying generator — a later
    epoch over the same DataGen would race a live concurrent mutator."""
    import threading
    import time

    before = set(threading.enumerate())

    def slow_gen():
        yield 0
        time.sleep(1.5)  # worker is IN here when the consumer closes
        yield 1

    it = data.prefetched(slow_gen(), depth=1)
    assert next(it) == 0
    time.sleep(0.1)  # let the worker enter the sleep
    it.close()  # must block until the worker thread is dead
    extra = [t for t in threading.enumerate()
             if t not in before and t.is_alive()]
    assert not extra, f"worker still alive after close: {extra}"
