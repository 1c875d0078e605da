"""Independent-origin validation of the t7 reader (VERDICT r2 item 1).

Until r2, `aocr.t7`'s reader was validated only against bytes its own
writer produced — a shared reader/writer misunderstanding of the format
would pass every test and break on the first real checkpoint.  This file
breaks that circularity two ways:

1. BYTE-GOLDEN streams: small objects hand-packed with `struct.pack`
   directly from the public grammar (torch7 File.lua), with the expected
   byte sequence written out literally in the test.  The reader must
   parse them; the writer must REPRODUCE them byte-for-byte (for the
   canonical subset it emits).
2. GRAMMAR-VARIANT streams via tests/t7_golden.GoldenWriter — an
   independent serializer that produces records the aocr writer cannot:
   versionless legacy classes, CudaTensors, getParameters-style shared
   flat storages with strided views, function records, 4-byte-long
   (32-bit platform) streams — including a COMPLETE reference-layout
   checkpoint that must import and decode identically to the
   aocr-writer fixture validated against the PyTorch oracle.
"""

import io
import struct

import numpy as np
import pytest

from aocr import t7, torch_import, vocab
from tests import t7_golden, torch_fixture

# ---------------------------------------------------------------- helpers

I = lambda v: struct.pack("<i", v)
Q = lambda v: struct.pack("<q", v)
D = lambda v: struct.pack("<d", v)
S = lambda s: I(len(s)) + s.encode()


def read_bytes(raw: bytes, **kw):
    return t7._Reader(io.BytesIO(raw), **kw).read_object()


def write_bytes(obj) -> bytes:
    buf = io.BytesIO()
    t7._Writer(buf).write_object(obj)
    return buf.getvalue()


# ------------------------------------------------------------ byte-golden


def test_golden_primitives_bytes():
    """Literal byte sequences from the grammar; reader parses them and the
    writer reproduces them exactly."""
    cases = [
        (None, I(0)),
        (True, I(5) + I(1)),
        (False, I(5) + I(0)),
        (3.5, I(1) + D(3.5)),
        ("hi", I(2) + S("hi")),
    ]
    for obj, raw in cases:
        assert read_bytes(raw) == obj or (obj is None and
                                          read_bytes(raw) is None)
        assert write_bytes(obj) == raw, f"writer bytes differ for {obj!r}"


def test_golden_array_table_bytes():
    """Lua array {7.0, 'x'}: TABLE idx=1, 2 pairs, number keys 1..2."""
    raw = (I(3) + I(1) + I(2)
           + I(1) + D(1.0) + I(1) + D(7.0)
           + I(1) + D(2.0) + I(2) + S("x"))
    assert read_bytes(raw) == [7.0, "x"]
    assert write_bytes([7.0, "x"]) == raw


def test_golden_float_tensor_bytes():
    """torch.FloatTensor({1,2,3}): TORCH idx=1, 'V 1', class, ndim=1,
    size/stride longs, 1-based offset, then its FloatStorage at idx=2."""
    raw = (I(4) + I(1) + S("V 1") + S("torch.FloatTensor")
           + I(1) + Q(3) + Q(1) + Q(1)
           + I(4) + I(2) + S("V 1") + S("torch.FloatStorage")
           + Q(3) + struct.pack("<3f", 1, 2, 3))
    arr = read_bytes(raw)
    np.testing.assert_array_equal(arr, np.array([1, 2, 3], np.float32))
    assert arr.dtype == np.float32
    assert write_bytes(np.array([1, 2, 3], np.float32)) == raw


def test_golden_checkpoint_skeleton_bytes():
    """The exact 4-element layout model.lua:724 writes:
    { {5 modules...}, config, global_step, optim_state } — hand-packed
    with a stand-in single module to keep the bytes reviewable."""
    lin = (I(4) + I(3) + S("V 1") + S("nn.Linear")  # module at heap 3
           + I(3) + I(4) + I(1)                     # fields table, 1 pair
           + I(2) + S("weight")
           + I(4) + I(5) + S("V 1") + S("torch.DoubleTensor")
           + I(2) + Q(1) + Q(2) + Q(2) + Q(1) + Q(1)
           + I(4) + I(6) + S("V 1") + S("torch.DoubleStorage")
           + Q(2) + struct.pack("<2d", 0.25, -0.5))
    raw = (I(3) + I(1) + I(4)                       # root table, 4 pairs
           + I(1) + D(1.0)                          # [1] = modules list
           + I(3) + I(2) + I(1) + I(1) + D(1.0) + lin
           + I(1) + D(2.0)                          # [2] = config
           + I(3) + I(7) + I(1)
           + I(2) + S("encoder_num_hidden") + I(1) + D(16.0)
           + I(1) + D(3.0) + I(1) + D(123.0)        # [3] = global_step
           + I(1) + D(4.0)                          # [4] = optim_state
           + I(3) + I(8) + I(1)
           + I(2) + S("learningRate") + I(1) + D(0.05))
    root = read_bytes(raw)
    assert isinstance(root, list) and len(root) == 4
    modules, config, step, optim_state = root
    assert modules[0].torch_typename == "nn.Linear"
    np.testing.assert_array_equal(modules[0]["weight"],
                                  [[0.25, -0.5]])
    assert config["encoder_num_hidden"] == 16.0
    assert step == 123.0
    assert optim_state["learningRate"] == 0.05


# ------------------------------------------------------- grammar variants


def test_versionless_legacy_class(tmp_path):
    """Pre-2015 streams carry no 'V 1' tag: the first rawstring IS the
    classname.  (Also: a classname merely starting with 'V ' must not be
    eaten as a version tag — torch matches ^V (number)$.)"""
    p = str(tmp_path / "legacy.t7")
    t7_golden.save(p, {"w": np.arange(4, dtype=np.float32)},
                   legacy_classes=True)
    back = t7.load(p)
    np.testing.assert_array_equal(back["w"], [0, 1, 2, 3])

    raw = (I(4) + I(1) + S("V x") + I(3) + I(2) + I(0))
    obj = read_bytes(raw)
    assert obj.torch_typename == "V x"  # classname, not a version tag


def test_cuda_tensor_reads_as_float32(tmp_path):
    """GPU checkpoints serialize torch.CudaTensor/CudaStorage with f32
    payloads; the reference casts them to double on load (model.lua:55-59)
    — we read them as f32 arrays."""
    p = str(tmp_path / "cuda.t7")
    t7_golden.save(p, [np.float32([[1.5, -2.5]])], cuda=True)
    back = t7.load(p)
    np.testing.assert_array_equal(back[0], [[1.5, -2.5]])
    assert back[0].dtype == np.float32


def test_long_size_4_stream(tmp_path):
    """32-bit torch builds write C longs as 4 bytes (sizes/strides/offsets
    and storage lengths)."""
    p = str(tmp_path / "long4.t7")
    arr = np.arange(6, dtype=np.float64).reshape(2, 3)
    t7_golden.save(p, {"t": arr, "n": 9.0}, long_size=4)
    back = t7.load(p, long_size=4)
    np.testing.assert_array_equal(back["t"], arr)
    assert back["n"] == 9.0


def test_long_size_4_longtensor_elements(tmp_path):
    """LongStorage ELEMENTS are also C longs (4 bytes on 32-bit builds),
    not just the structural sizes/strides — an 8-wide read would misparse
    the values and desync everything after the tensor."""
    p = str(tmp_path / "long4el.t7")
    idx = np.asarray([3, 1, 2, 70000], dtype=np.int64)
    t7_golden.save(p, {"idx": idx, "after": 5.0}, long_size=4)
    back = t7.load(p, long_size=4)
    np.testing.assert_array_equal(back["idx"], idx)
    assert back["idx"].dtype == np.int64
    assert back["after"] == 5.0  # stream stayed in sync past the tensor


def test_function_records_skipped_and_memoized(tmp_path):
    """Serialized closures (TYPE_FUNCTION/RECUR/LEGACY_RECUR): bytecode is
    opaque and skipped, upvalues consumed, heap index honored on repeats."""
    fn = t7_golden.Function(upvalues={"captured": 3.0})
    for typeid in (t7_golden.TYPE_FUNCTION,
                   t7_golden.TYPE_LEGACY_RECUR_FUNCTION,
                   t7_golden.TYPE_RECUR_FUNCTION):
        fn.typeid = typeid
        p = str(tmp_path / f"fn{typeid}.t7")
        t7_golden.save(p, [fn, fn, 5.0])
        back = t7.load(p)
        assert back[0] is None and back[1] is None and back[2] == 5.0


def test_shared_flat_storage_views(tmp_path):
    """getParameters-style layout: several tensors as strided views into
    one storage (written once, referenced by heap index)."""
    flat = t7_golden.Storage(np.arange(12, dtype=np.float32))
    w = t7_golden.View(flat, (2, 3), (3, 1), 0)     # rows 0..5
    b = t7_golden.View(flat, (3,), (1,), 6)         # 6,7,8
    col = t7_golden.View(flat, (2,), (3,), 1)       # strided column: 1,4
    p = str(tmp_path / "views.t7")
    t7_golden.save(p, {"w": w, "b": b, "col": col})
    back = t7.load(p)
    np.testing.assert_array_equal(back["w"], [[0, 1, 2], [3, 4, 5]])
    np.testing.assert_array_equal(back["b"], [6, 7, 8])
    np.testing.assert_array_equal(back["col"], [1, 4])


def test_cyclic_table(tmp_path):
    """Lua tables may be cyclic (module.output referencing a parent);
    the heap memo must resolve the cycle."""
    t = {"x": 1.0}
    t["self"] = t
    p = str(tmp_path / "cycle.t7")
    t7_golden.save(p, t)
    back = t7.load(p)
    assert back["x"] == 1.0 and back["self"] is back


# ------------------------------------- full checkpoint, independent bytes

ENC_H, EMB, VOCAB = 32, 8, 39


def _golden_checkpoint(path: str, w, **writer_kw):
    """The exact model.lua:724 object tree, serialized by the INDEPENDENT
    writer with every module group's weight/bias flattened into one shared
    group storage (the getParameters on-disk layout)."""
    cnn = torch_fixture.build_cnn_sequential(w)
    enc_fw = torch_fixture.build_lstm_gmodule(w["encoder_fw"],
                                              "encoder-fw", True)
    enc_bw = torch_fixture.build_lstm_gmodule(w["encoder_bw"],
                                              "encoder-bw", True)
    dec = torch_fixture.build_lstm_gmodule(
        w["decoder"]["layers"], "decoder", True,
        lookup=w["decoder"]["embedding"],
        attn={"w_a": w["decoder"]["w_a"], "w_c": w["decoder"]["w_c"]},
    )
    proj = torch_fixture._plain("nn.Sequential", modules=[
        torch_fixture._linear_obj(w["projector"]),
        torch_fixture._plain("nn.LogSoftMax")])
    groups = [cnn, enc_fw, enc_bw, dec, proj]
    for g in groups:  # one flat storage per group, modules hold views
        t7_golden.flatten_group_params([g])
    config = {"encoder_num_hidden": float(ENC_H),
              "decoder_num_layers": 2.0,
              "target_vocab_size": float(VOCAB),
              "target_embedding_size": float(EMB),
              "input_feed": True, "dropout": 0.0,
              "max_encoder_l": 80.0, "max_decoder_l": 50.0,
              "batch_size": 4.0, "prealloc": True,
              "encoder_num_layers": 1.0}
    optim_state = {"learningRate": 0.05, "evalCounter": 123.0}
    t7_golden.save(path, [groups, config, 123.0, optim_state], **writer_kw)


@pytest.mark.parametrize("writer_kw", [
    {},                                        # canonical 64-bit stream
    {"legacy_classes": True, "cuda": True},    # old GPU checkpoint
    {"long_size": 4},                          # 32-bit platform stream
], ids=["canonical", "legacy-cuda", "long4"])
def test_independent_checkpoint_imports_identically(tmp_path, writer_kw):
    """An independent-origin byte stream (shared flat storages, optional
    legacy/cuda/32-bit variants) must import leaf-identically to the
    aocr-writer fixture — which the oracle-parity tests validate against
    PyTorch f64 — and greedy-decode to the same transcripts."""
    import jax
    import jax.numpy as jnp

    from aocr import decode
    from aocr.config import Config
    from tests import synth

    rng = np.random.RandomState(20260817)
    w = torch_fixture.make_weights(rng, ENC_H, EMB, VOCAB)

    ref_p = str(tmp_path / "writer.t7")
    torch_fixture.save_reference_checkpoint(
        ref_p, w, enc_h=ENC_H, emb=EMB, vocab=VOCAB, global_step=123,
        learning_rate=0.05)
    ref = torch_import.import_checkpoint(ref_p)

    gold_p = str(tmp_path / "golden.t7")
    _golden_checkpoint(gold_p, w, **writer_kw)
    got = torch_import.import_checkpoint(
        gold_p, long_size=writer_kw.get("long_size", 8))

    assert got["global_step"] == 123
    assert got["optim_state"]["learning_rate"] == 0.05
    from jax.tree_util import tree_leaves_with_path

    ref_leaves = tree_leaves_with_path(
        {"params": ref["params"], "stats": ref["batch_stats"]})
    got_tree = {"params": got["params"], "stats": got["batch_stats"]}
    got_leaves = dict(tree_leaves_with_path(got_tree))
    assert len(ref_leaves) == len(got_leaves)
    for path, leaf in ref_leaves:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(got_leaves[path]),
            err_msg=f"leaf mismatch at {path}")

    # and the imported model actually decodes: transcripts equal the
    # oracle-validated import's transcripts
    cfg = Config(input_feed=True, encoder_num_hidden=ENC_H,
                 target_embedding_size=EMB, max_decoder_l=8,
                 image_width=32).validate()
    params = jax.tree.map(jnp.asarray, got["params"])
    stats = jax.tree.map(jnp.asarray, got["batch_stats"])
    images = (np.stack([synth.render_word(s, 32, 32)
                        for s in ["ab", "c1d", "xyz"]])
              [..., None].astype(np.float32))
    labels, _ = decode.beam_decode(params, stats, jnp.asarray(images), cfg,
                                   beam_size=1, max_len=8)
    rparams = jax.tree.map(jnp.asarray, ref["params"])
    rstats = jax.tree.map(jnp.asarray, ref["batch_stats"])
    rlabels, _ = decode.beam_decode(rparams, rstats, jnp.asarray(images),
                                    cfg, beam_size=1, max_len=8)
    got_words = [vocab.decode(r) for r in np.asarray(labels)]
    want_words = [vocab.decode(r) for r in np.asarray(rlabels)]
    assert got_words == want_words


# ----------------------------------------- hostile / corrupt stream safety


def _tensor_stream(size, stride, offset1, data, ndim=None):
    """Hand-pack a FloatTensor record (grammar in tests/t7_golden.py) with
    arbitrary — possibly inconsistent — geometry."""
    nd = len(size) if ndim is None else ndim
    b = I(4) + I(1) + S("V 1") + S("torch.FloatTensor")
    b += I(nd)
    for s in size:
        b += Q(s)
    for s in stride:
        b += Q(s)
    b += Q(offset1)
    b += I(4) + I(2) + S("V 1") + S("torch.FloatStorage")
    b += Q(len(data)) + np.asarray(data, "<f4").tobytes()
    return b


def test_tensor_geometry_validated():
    """size/stride/offset come from an untrusted stream; a view outside the
    storage must raise — NOT read arbitrary process memory via as_strided —
    and absurd element counts must raise instead of materializing."""
    data = [0.0, 1.0, 2.0, 3.0]
    # sanity: a valid record round-trips
    np.testing.assert_array_equal(
        read_bytes(_tensor_stream([4], [1], 1, data)), data)
    # negative stride, in-bounds: a legal reversed view
    np.testing.assert_array_equal(
        read_bytes(_tensor_stream([4], [-1], 4, data)), data[::-1])
    bad = [
        _tensor_stream([4], [2], 1, data),           # reaches index 6 of 4
        _tensor_stream([4], [1], 3, data),           # tail past the end
        _tensor_stream([4], [1], 0, data),           # 0 -> offset -1
        _tensor_stream([4], [-2], 4, data),          # reaches index -3
        _tensor_stream([1 << 20, 1 << 20], [0, 0], 1, data),  # memory bomb
        _tensor_stream([-3], [1], 1, data),          # negative dim
        _tensor_stream([], [], 1, data, ndim=-2),    # negative ndim
    ]
    for raw in bad:
        with pytest.raises(ValueError):
            read_bytes(raw)


def _fuzz_base() -> bytes:
    flat = t7_golden.Storage(np.arange(6, dtype=np.float32))
    obj = {
        "version": 2.0,
        "model": t7_golden.TorchObject("nn.Linear", {
            "weight": t7_golden.View(flat, (2, 3), (3, 1), 0),
            "bias": t7_golden.View(flat, (3,), (1,), 3),
        }),
        "opts": {"lr": 0.1, "name": "aocr", "flag": True},
    }
    buf = io.BytesIO()
    t7_golden.GoldenWriter(buf).emit(obj)
    return buf.getvalue()


_ALLOWED = (EOFError, ValueError, TypeError, RecursionError)


def test_fuzz_truncation_never_hangs_or_crashes():
    """Every truncation of a valid stream must raise cleanly (EOFError or a
    parse error) — never hang, segfault, or silently return garbage past
    the cut."""
    raw = _fuzz_base()
    assert len(raw) > 50
    for cut in range(len(raw)):
        with pytest.raises(_ALLOWED):
            read_bytes(raw[:cut])


def test_fuzz_byte_mutations_bounded_failure():
    """Seeded single-byte mutations: the reader either parses (mutations in
    payload bytes are legal) or raises from a bounded exception set —
    never an unbounded allocation, OOB read, or hang."""
    raw = bytearray(_fuzz_base())
    rng = np.random.RandomState(0)
    for _ in range(600):
        pos = int(rng.randint(len(raw)))
        val = int(rng.randint(256))
        orig = raw[pos]
        raw[pos] = val
        try:
            read_bytes(bytes(raw))
        except _ALLOWED:
            pass
        finally:
            raw[pos] = orig
