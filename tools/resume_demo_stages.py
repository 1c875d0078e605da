"""Resume the synthetic_demo battery from an existing trained checkpoint.

Runs only the post-training stages of examples/synthetic_demo.py (greedy
test, beam-5 + dictionary test, HTML gallery, .aocrx export replay)
against a workdir whose model/ already holds a checkpoint — used when a
long training run completed but the evaluation stages were interrupted
(e.g. a dev-tunnel wedge killed the driver process).

    python tools/resume_demo_stages.py WORKDIR [--extra "FLAGS"]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("workdir")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--extra", default="-prefetch 0 -decode_workers 0")
    args = p.parse_args(argv)

    from aocr.train import main as aocr_main

    common = [
        "-data_base_dir", args.workdir,
        "-data_path", "train.txt",
        "-val_data_path", "val.txt",
        "-model_dir", os.path.join(args.workdir, "model"),
        "-batch_size", str(args.batch_size),
        "-input_feed",
    ] + (args.extra.split() if args.extra else [])

    print("=== greedy evaluation ===", flush=True)
    aocr_main(common + [
        "-phase", "test", "-load_model", "-visualize",
        "-log_path", os.path.join(args.workdir, "test.log"),
        "-output_dir", os.path.join(args.workdir, "results"),
    ])

    print("=== beam-5 + dictionary evaluation ===", flush=True)
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
    print(f"gallery: {html}", flush=True)

    print("=== deployment artifact ===", flush=True)
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
          f"match the live model: {texts}", flush=True)


if __name__ == "__main__":
    main()
