"""End-to-end demo on synthetic word images.

Generates a small rendered-word dataset, trains the flagship model for a few
minutes, evaluates with greedy and dictionary-constrained beam search, and
writes the HTML results gallery — the whole framework surface in one script.

    python examples/synthetic_demo.py [--workdir DIR] [--words N] [--epochs N]

On a TPU v5e this reaches >99% exact match in ~5 minutes; on CPU use
--words 64 --epochs 30 for a quick smoke run.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="demo_workdir")
    p.add_argument("--words", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--augment", action="store_true",
                   help="train with on-device augmentation (-augment)")
    p.add_argument("--mode", choices=["stripes", "font"], default="stripes",
                   help="word renderer: stripe code or PIL DejaVu glyphs")
    p.add_argument("--extra", default="",
                   help="extra aocr.train flags, space-separated (e.g. "
                        "'-prefetch 0 -decode_workers 0' for dev-tunnel "
                        "runs, see CLAUDE.md)")
    args = p.parse_args(argv)

    from aocr.train import main as aocr_main
    from tests import synth

    os.makedirs(args.workdir, exist_ok=True)
    rng = random.Random(0)
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = sorted({
        "".join(rng.choice(chars) for _ in range(rng.randint(3, 8)))
        for _ in range(args.words)
    })
    import numpy as np

    kw = dict(mode=args.mode,
              render_rng=(np.random.RandomState(0)
                          if args.mode == "font" else None))
    synth.make_dataset(args.workdir, words, "train.txt", **kw)
    synth.make_dataset(args.workdir, words[:256], "val.txt", **kw)
    with open(os.path.join(args.workdir, "dict.txt"), "w") as f:
        f.write("\n".join(words))
    print(f"dataset: {len(words)} words in {args.workdir}")

    common = [
        "-data_base_dir", args.workdir,
        "-data_path", "train.txt",
        "-val_data_path", "val.txt",
        "-model_dir", os.path.join(args.workdir, "model"),
        "-batch_size", str(args.batch_size),
        "-input_feed",
    ] + (args.extra.split() if args.extra else [])

    print("=== training ===")
    aocr_main(common + (["-augment"] if args.augment else []) + [
        "-phase", "train",
        "-log_path", os.path.join(args.workdir, "train.log"),
        "-num_epochs", str(args.epochs),
        "-steps_per_checkpoint", "512",
        "-num_batches_val", "4",
        "-learning_rate", "0.2",
        "-learning_rate_min", "0.01",
        "-lr_decay", "0.7",
    ])

    print("=== greedy evaluation ===")
    aocr_main(common + [
        "-phase", "test", "-load_model", "-visualize",
        "-log_path", os.path.join(args.workdir, "test.log"),
        "-output_dir", os.path.join(args.workdir, "results"),
    ])

    print("=== beam-5 + dictionary evaluation ===")
    aocr_main(common + [
        "-phase", "test", "-load_model",
        "-log_path", os.path.join(args.workdir, "test_beam.log"),
        "-beam_size", "5",
        "-use_dictionary",
        "-dictionary_path", os.path.join(args.workdir, "dict.txt"),
    ])

    from aocr.visualizer import generate_html

    html = generate_html.generate(
        os.path.join(args.workdir, "results"), args.workdir
    )
    print(f"gallery: {html}")

    print("=== deployment artifact ===")
    from aocr import export as export_lib
    from aocr.api import AttentionOCR

    art = os.path.join(args.workdir, "model.aocrx")
    ocr = AttentionOCR.load(os.path.join(args.workdir, "model"))
    export_lib.export_recognizer(ocr, art)
    rec = export_lib.ExportedRecognizer.load(art)
    sample = [os.path.join(args.workdir, line.split()[0])
              for line in open(os.path.join(args.workdir, "val.txt"))][:8]
    texts, _ = rec.recognize(sample)
    live, _ = ocr.recognize(sample)
    match = sum(a == b for a, b in zip(texts, live))
    print(f"artifact: {art} ({os.path.getsize(art) / 1e6:.1f} MB); "
          f"replayed {len(sample)} val images, {match}/{len(sample)} "
          f"match the live model: {texts}")


if __name__ == "__main__":
    main()
