"""Serialized inference artifacts (StableHLO export).

The reference deploys by shipping the Lua model code next to a t7
checkpoint (`/root/reference/src/train.lua` + `model.lua:720-725`) — the
serving host must run the exact model-building code.  This module removes
that coupling the JAX way: `export_recognizer` lowers the ENTIRE decode
program (CNN + bi-LSTM encoder + greedy/beam attention decode, optionally
trie-constrained) to StableHLO via `jax.export` and packs it with the
weights, the dictionary table, and the vocab codec into one self-contained
`.aocrx` zip.  `ExportedRecognizer.load` runs it with no model code, no
Config, and no tracing — the program is replayed, not rebuilt, so an
artifact's numerics are frozen at export time.

Design notes (TPU-first):

- The batch dimension is exported SYMBOLICALLY by default
  (`jax.export.symbolic_shape`), so one artifact serves any batch size;
  `batch=<int>` pins it instead (the loader then pads partial batches).
- The exported program uses the portable XLA decode path
  (`use_pallas=False`): Mosaic kernel custom-calls carry much narrower
  version-compatibility guarantees than pure StableHLO, and an artifact's
  whole point is surviving environment changes.  Export with
  `use_pallas=True` on a TPU host to freeze the fused kernels instead.
- `platforms=("cpu", "tpu")` by default: lowering is platform-parametric,
  so a CPU-only build box can produce artifacts that run on TPU servers.
- Weights live in the artifact as plain npz members (the checkpoint v2
  scheme — no pickle anywhere), NOT baked into the program as constants:
  constant-folding 30M parameters into StableHLO would bloat the module
  and defeat weight-only updates (re-export with new weights reuses the
  cached lowering).
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from aocr import vocab
from aocr.checkpoint import _flatten, _unflatten

FORMAT = "aocrx"
FORMAT_VERSION = 1
_META_MEMBER = "__meta__.json"


def _program_member(width: int) -> str:
    return f"__program__.w{int(width)}.bin"


def _write_artifact(path: str, meta: dict, programs: dict,
                    arrays: dict) -> None:
    """Single home for the .aocrx zip layout (export_recognizer and
    update_weights must emit byte-compatible artifacts)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED,
                         allowZip64=True) as z:
        z.writestr(_META_MEMBER, json.dumps(meta))
        for w, program in programs.items():
            z.writestr(_program_member(w), program)
        for name, arr in arrays.items():
            buf = io.BytesIO()
            np.lib.format.write_array(buf, np.ascontiguousarray(arr),
                                      allow_pickle=False)
            z.writestr(name + ".npy", buf.getvalue())


def _canonicalize(tree):
    """Round-trip a pytree through the checkpoint flatten/unflatten so the
    export-time treedef (dicts + lists of np arrays) is bit-identical to
    what the loader reconstructs — a tuple-vs-list mismatch would make
    `Exported.call` reject the loader's weights."""
    arrays: dict = {}
    skel = _flatten(tree, "t", arrays)
    return _unflatten(skel, {k: np.asarray(v) for k, v in arrays.items()})


def export_recognizer(
    ocr,
    path: str,
    *,
    beam_size: Optional[int] = None,
    max_len: Optional[int] = None,
    batch: Union[str, int] = "poly",
    platforms: Sequence[str] = ("cpu", "tpu"),
    use_pallas: bool = False,
    widths: Optional[Sequence[int]] = None,
) -> str:
    """Export an `AttentionOCR`'s decode program to a `.aocrx` artifact.

    `ocr` supplies the weights, geometry, and (if `ocr.use_dictionary()`
    was called) the trie constraint, all of which are frozen into the
    artifact.  `beam_size`/`max_len` default to the model config.
    `batch="poly"` exports a symbolic batch dimension; an int pins it.
    `widths` exports one program per image width — for keep_aspect_ratio
    models it defaults to the serving width ladder (data.width_ladder),
    so the artifact accepts every clamped-aspect width; fixed-width
    models export the single configured width.  Returns `path`.
    """
    import jax
    from jax import export as jax_export

    from aocr import data, decode
    from aocr.config import GEOMETRY_FIELDS

    cfg = ocr.cfg.replace(use_pallas=use_pallas)
    disabled_checks: tuple = ()
    if use_pallas:
        # Mosaic kernels lower to `tpu_custom_call`, which jax.export
        # rejects by default (custom calls carry no stability guarantee —
        # exactly the trade the caller opts into here), and they only
        # lower for the tpu platform.
        platforms = ("tpu",)
        disabled_checks = (
            jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),)
    K = min(beam_size or cfg.beam_size, cfg.target_vocab_size)
    T = max_len or cfg.max_decoder_l
    trie = ocr.dictionary_table
    use_trie = trie is not None
    if widths is None:
        widths = (data.width_ladder(cfg) if cfg.keep_aspect_ratio
                  else [cfg.image_width])
    widths = sorted({int(w) for w in widths})
    if not widths or widths[0] < 1:
        raise ValueError(f"bad widths {widths}")

    params = _canonicalize(ocr.params)
    batch_stats = _canonicalize(ocr.batch_stats)

    if use_trie:
        def fn(p, bs, images, trie_table):
            return decode.beam_decode(p, bs, images, cfg, beam_size=K,
                                      max_len=T, trie_table=trie_table,
                                      use_trie=True)
    else:
        def fn(p, bs, images):
            return decode.beam_decode(p, bs, images, cfg, beam_size=K,
                                      max_len=T)

    if batch == "poly":
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch)
        if b < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
    spec = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), t)
    programs = {}
    for w in widths:
        img_spec = jax.ShapeDtypeStruct(
            (b, cfg.image_height, w, 1), np.float32)
        args = [spec(params), spec(batch_stats), img_spec]
        if use_trie:
            args.append(spec(np.asarray(trie)))
        programs[w] = jax_export.export(
            jax.jit(fn), platforms=tuple(platforms),
            disabled_checks=disabled_checks)(*args)

    arrays: dict = {}
    skeleton = {"params": _flatten(params, "params", arrays),
                "batch_stats": _flatten(batch_stats, "batch_stats", arrays)}
    if use_trie:
        skeleton["trie"] = _flatten(np.asarray(trie), "trie", arrays)
    meta = {
        "format": FORMAT,
        "version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "beam_size": K,
        "max_len": T,
        "use_dictionary": use_trie,
        "use_pallas": use_pallas,
        "batch": "poly" if batch == "poly" else b,
        "widths": widths,
        "geometry": {k: getattr(cfg, k) for k in GEOMETRY_FIELDS},
        "compute_dtype": cfg.compute_dtype,
        # codec spec so even a non-aocr consumer can map ids -> text
        "vocab": {
            "pad": vocab.PAD, "go": vocab.GO, "eos": vocab.EOS,
            "id_to_char": {
                str(i): vocab.id_to_char(i)
                for i in range(vocab.NUM_SPECIAL, vocab.VOCAB_SIZE)
            },
        },
        "skeleton": skeleton,
    }
    _write_artifact(path, meta,
                    {w: e.serialize() for w, e in programs.items()},
                    arrays)
    return path


def update_weights(src_path: str, ocr, out_path: str) -> str:
    """Weight-only re-export: write a new artifact that reuses `src_path`'s
    already-lowered program with `ocr`'s weights (and dictionary table).
    This is why weights are npz members instead of program constants — a
    fine-tuned checkpoint redeploys without retracing or relowering.
    Every leaf must match the source artifact's shape/dtype exactly."""
    with zipfile.ZipFile(src_path, "r") as z:
        meta = json.loads(z.read(_META_MEMBER).decode())
        if meta.get("format") != FORMAT:
            raise ValueError(f"{src_path} is not an {FORMAT} artifact")
        programs = {w: z.read(_program_member(w))
                    for w in meta.get("widths",
                                      [meta["geometry"]["image_width"]])}
        old = {info.filename[:-4]: np.lib.format.read_array(
                   io.BytesIO(z.read(info)), allow_pickle=False)
               for info in z.infolist() if info.filename.endswith(".npy")}
    trie = ocr.dictionary_table
    if meta["use_dictionary"] != (trie is not None):
        raise ValueError(
            "dictionary presence must match the source artifact "
            f"(source use_dictionary={meta['use_dictionary']}) — the trie "
            "is a program input with a fixed shape")
    arrays: dict = {}
    _flatten(_canonicalize(ocr.params), "params", arrays)
    _flatten(_canonicalize(ocr.batch_stats), "batch_stats", arrays)
    if trie is not None:
        _flatten(np.asarray(trie), "trie", arrays)
    if set(arrays) != set(old):
        raise ValueError(
            "weight tree mismatch vs the source artifact: "
            f"missing={sorted(set(old) - set(arrays))[:3]} "
            f"extra={sorted(set(arrays) - set(old))[:3]}")
    for name, arr in arrays.items():
        if arr.shape != old[name].shape or arr.dtype != old[name].dtype:
            raise ValueError(
                f"{name}: {arr.shape}/{arr.dtype} does not match the "
                f"exported {old[name].shape}/{old[name].dtype}")
    _write_artifact(out_path, meta, programs, arrays)
    return out_path


class ExportedRecognizer:
    """Run a `.aocrx` artifact: deserialized StableHLO + packed weights.

    No model code executes — `recognize` replays the exported program.
    """

    def __init__(self, programs, params, batch_stats, trie, meta):
        self._programs = programs  # {width: jax.export.Exported}
        self._params = params
        self._batch_stats = batch_stats
        self._trie = trie
        self.meta = meta

    @property
    def widths(self) -> List[int]:
        """Image widths the artifact has programs for (ascending)."""
        return sorted(self._programs)

    @classmethod
    def load(cls, path: str) -> "ExportedRecognizer":
        from jax import export as jax_export

        with zipfile.ZipFile(path, "r") as z:
            meta = json.loads(z.read(_META_MEMBER).decode())
            if meta.get("format") != FORMAT:
                raise ValueError(f"{path} is not an {FORMAT} artifact")
            if meta.get("version", 0) > FORMAT_VERSION:
                raise ValueError(
                    f"{path} has {FORMAT} version {meta['version']}; this "
                    f"build reads up to {FORMAT_VERSION}")
            widths = meta.get("widths", [meta["geometry"]["image_width"]])
            programs = {int(w): jax_export.deserialize(
                            bytearray(z.read(_program_member(w))))
                        for w in widths}
            arrays = {}
            for info in z.infolist():
                if info.filename.endswith(".npy"):
                    buf = io.BytesIO(z.read(info))
                    arrays[info.filename[:-4]] = np.lib.format.read_array(
                        buf, allow_pickle=False)
        skel = meta["skeleton"]
        params = _unflatten(skel["params"], arrays)
        batch_stats = _unflatten(skel["batch_stats"], arrays)
        trie = (_unflatten(skel["trie"], arrays)
                if meta["use_dictionary"] else None)
        return cls(programs, params, batch_stats, trie, meta)

    # ------------------------------------------------------------ running

    def preprocess_config(self):
        """Geometry `Config` for turning raw images into program inputs.
        A single-width artifact forces keep_aspect_ratio off (every image
        resizes to the one exported width); a multi-width artifact keeps
        the model's aspect-preserving preprocessing — widths then pad UP
        to the exported ladder.  Shared by path ingest here and by
        `aocr.serve -artifact` HTTP ingest."""
        from aocr.config import Config

        g = dict(self.meta["geometry"])
        if len(self._programs) == 1:
            g["keep_aspect_ratio"] = False
            g["image_width"] = self.widths[0]
        else:
            # a custom -widths ladder may be narrower than the model's
            # aspect bound: clamp so ingest RESIZES wide images into the
            # exported range instead of producing a width _pad_width must
            # reject (which would 500 a whole coalesced serving batch)
            top_ar = self.widths[-1] / g["image_height"]
            g["max_aspect_ratio"] = min(g["max_aspect_ratio"], top_ar)
            g["min_aspect_ratio"] = min(g["min_aspect_ratio"],
                                        g["max_aspect_ratio"])
        return Config(**g)

    def _pad_width(self, img: np.ndarray) -> np.ndarray:
        """Pad an (H, W, 1) image's width up to the next exported width
        with the background value (255 pre-normalization)."""
        w = img.shape[1]
        for step in self.widths:
            if w <= step:
                if w == step:
                    return img
                return np.pad(img, ((0, 0), (0, step - w), (0, 0)),
                              constant_values=255.0)
        raise ValueError(
            f"image width {w} exceeds the widest exported program "
            f"({self.widths[-1]}); re-export with wider -widths")

    def recognize(
        self,
        images: Union[np.ndarray, Sequence[str]],
    ) -> Tuple[List[str], np.ndarray]:
        """Decode a stacked (B, H, W[, 1]) float batch, a bare path, a
        list of image paths, or a list of (H, W[, 1]) arrays (widths may
        mix — rows pad up to the exported width ladder and bucket per
        program).  Returns (transcripts, best-beam log-prob scores) in
        input order."""
        from aocr import data

        arrs = data.images_to_arrays(images, self.preprocess_config())
        n = len(arrs)
        if n == 0:
            # symbolic dims are constrained >= 1; short-circuit instead
            return [], np.empty((0,), np.float32)
        arrs = [self._pad_width(a) for a in arrs]
        words: List[Optional[str]] = [None] * n
        scores = np.empty((n,), np.float32)
        by_width: dict = {}
        for i, a in enumerate(arrs):
            by_width.setdefault(a.shape[1], []).append(i)
        for w, idx in sorted(by_width.items()):
            lab, sc = self._decode_width(w, np.stack([arrs[i] for i in idx]))
            for j, i in enumerate(idx):
                words[i] = vocab.decode(lab[j])
                scores[i] = sc[j]
        return words, scores

    def _decode_width(self, width: int, images: np.ndarray):
        n = images.shape[0]
        fixed = self.meta["batch"]
        if fixed != "poly":
            # pinned-batch artifact: chunk, padding the tail by repeating
            # the last row (sliced off after the fetch)
            labels_l, scores_l = [], []
            for lo in range(0, n, fixed):
                chunk = images[lo:lo + fixed]
                real = chunk.shape[0]
                if real < fixed:
                    pad = np.repeat(chunk[-1:], fixed - real, axis=0)
                    chunk = np.concatenate([chunk, pad])
                lab, sc = self._call(width, chunk)
                labels_l.append(np.asarray(lab)[:real])
                scores_l.append(np.asarray(sc)[:real])
            return np.concatenate(labels_l), np.concatenate(scores_l)
        lab, sc = self._call(width, images)
        return np.asarray(lab), np.asarray(sc)

    def _call(self, width: int, images: np.ndarray):
        args = [self._params, self._batch_stats, images]
        if self._trie is not None:
            args.append(self._trie)
        return self._programs[width].call(*args)


def main(argv: Optional[Sequence[str]] = None) -> int:
    """CLI: `python -m aocr.export -model_dir train/ -out model.aocrx`."""
    import argparse

    from aocr.api import AttentionOCR

    ap = argparse.ArgumentParser(
        prog="aocr.export",
        description="Export a checkpoint to a self-contained .aocrx "
                    "inference artifact (StableHLO + weights)")
    ap.add_argument("-model_dir", required=True,
                    help="checkpoint dir (or file) to export")
    ap.add_argument("-out", required=True, help="output .aocrx path")
    ap.add_argument("-beam_size", type=int, default=None)
    ap.add_argument("-max_len", type=int, default=None)
    ap.add_argument("-batch", default="poly",
                    help='"poly" (any batch size) or a fixed int')
    ap.add_argument("-platforms", default="cpu,tpu",
                    help="comma-separated lowering targets")
    ap.add_argument("-use_pallas", action="store_true",
                    help="freeze the fused TPU kernels into the artifact "
                         "(TPU-only artifact; narrower forward compat)")
    ap.add_argument("-widths", default=None,
                    help="comma-separated image widths to export programs "
                         "for (default: the width ladder for "
                         "keep_aspect_ratio models, else the one "
                         "configured width)")
    ap.add_argument("-dictionary_path", default=None,
                    help="constrain decoding to this word list")
    ap.add_argument("-allow_digit_prefix", action="store_true")
    ap.add_argument("-update_from", default=None,
                    help="source .aocrx whose lowered program is reused "
                         "(weight-only re-export: no retracing)")
    args = ap.parse_args(argv)

    ocr = AttentionOCR.load(args.model_dir)
    if args.dictionary_path:
        from aocr.utils import trie as trie_lib

        # load_dictionary caches the built DAWG next to the word list
        ocr.set_dictionary_table(trie_lib.load_dictionary(
            args.dictionary_path, args.allow_digit_prefix))
    import os
    if args.update_from:
        update_weights(args.update_from, ocr, args.out)
        size = os.path.getsize(args.out) / 1e6
        print(f"wrote {args.out} ({size:.1f} MB, program reused from "
              f"{args.update_from})")
        return 0
    batch = args.batch if args.batch == "poly" else int(args.batch)
    widths = ([int(w) for w in args.widths.split(",")]
              if args.widths else None)
    export_recognizer(
        ocr, args.out, beam_size=args.beam_size, max_len=args.max_len,
        batch=batch, platforms=tuple(args.platforms.split(",")),
        use_pallas=args.use_pallas, widths=widths)
    size = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size:.1f} MB, platforms="
          f"{args.platforms}, batch={batch})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
