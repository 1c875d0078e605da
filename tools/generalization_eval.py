#!/usr/bin/env python3
"""Unseen-lexicon generalization experiment (VERDICT r2 missing #2).

Every accuracy reported through r2 came from clean renders where train and
eval words share one generator and largely one lexicon.  This experiment
measures what the reference's real use-case needs (a large lexicon over
noisy crops, src/visualizer/freq.pkl):

  1. sample lexicon A (train) and a DISJOINT lexicon B (eval)
  2. train on `copies` independently-distorted renders per word of A
     (affine jitter + shear + Gaussian noise + blur, tests/synth.distort)
  3. evaluate on distorted renders of UNSEEN words B, four ways:
     greedy / beam-5, each with and without -use_dictionary (the
     dictionary holds A union B — the realistic setting where the target
     word is in the lexicon but was never trained on)

Writes results to stdout; paste the table into docs/performance.md.

Usage: python tools/generalization_eval.py [workdir]
  env: AOCR_GEN_WORDS_A (default 2000), AOCR_GEN_WORDS_B (500),
       AOCR_GEN_EPOCHS (default 150), AOCR_GEN_COPIES (3),
       AOCR_GEN_PHASE (all | train | test — train resumes from the last
       checkpoint, so long runs can be chunked),
       AOCR_GEN_MODE (stripes | font — font = PIL DejaVu glyph renders,
       blur ON by default; VERDICT r4 #2),
       AOCR_GEN_BLUR (override the per-mode blur default),
       AOCR_GEN_VARWIDTH=1 (font mode only: render every word at its
       natural aspect-preserving width and train/eval with
       -keep_aspect_ratio — the reference's variable-width regime,
       exercising the width-ladder bucketing end to end)
"""

import os
import re
import string
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sample_lexicons(rng, n_a, n_b):
    chars = string.ascii_lowercase + string.digits
    words = set()
    while len(words) < n_a + n_b:
        n = rng.randint(3, 9)
        words.add("".join(rng.choice(list(chars), size=n)))
    words = sorted(words)
    rng.shuffle(words)
    return words[:n_a], words[n_a:n_a + n_b]


def run_phase(args):
    from aocr.train import main

    main(args)


def last_metrics(log_path):
    txt = open(log_path).read()
    accs = re.findall(r"Number of samples \d+ - Accuracy = ([\d.]+)", txt)
    cers = re.findall(
        r"Character error rate \(normalized edit distance\) = ([\d.]+)",
        txt)
    if not accs or not cers:
        # a failed/format-drifted test phase must name its log, not
        # IndexError after hours of training
        raise RuntimeError(
            f"no accuracy/CER lines found in {log_path} — the test phase "
            f"failed or train.py's log format changed (see that log)")
    return float(accs[-1]), float(cers[-1])


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="aocr_gen_")
    n_a = int(os.environ.get("AOCR_GEN_WORDS_A", 2000))
    n_b = int(os.environ.get("AOCR_GEN_WORDS_B", 500))
    epochs = int(os.environ.get("AOCR_GEN_EPOCHS", 150))
    copies = int(os.environ.get("AOCR_GEN_COPIES", 3))
    phase = os.environ.get("AOCR_GEN_PHASE", "all")
    # AOCR_GEN_MODE=font runs the whole experiment on PIL DejaVu glyph
    # renders (VERDICT r4 #2) instead of the stripe code; blur then
    # defaults ON (real glyphs survive it; the stripe code does not).
    mode = os.environ.get("AOCR_GEN_MODE", "stripes")
    assert mode in ("stripes", "font"), mode
    varwidth = bool(int(os.environ.get("AOCR_GEN_VARWIDTH", "0")))
    assert not (varwidth and mode != "font"), "VARWIDTH needs MODE=font"
    rng = np.random.RandomState(20260817)

    from tests import synth

    lex_a, lex_b = sample_lexicons(rng, n_a, n_b)
    assert not set(lex_a) & set(lex_b)
    print(f"workdir {work}: |A|={len(lex_a)} train words, "
          f"|B|={len(lex_b)} unseen eval words, {copies} distorted "
          f"copies each", flush=True)

    # dict.txt is written last: its presence marks a complete dataset build
    # blur-free by default: the 3x3 box blur all but erases the
    # striped-band glyph code at stripe period 2 — realistic degradation
    # for these synthetic renders is jitter+shear+noise (set
    # AOCR_GEN_BLUR=1 for the harsher variant)
    blur_default = "1" if mode == "font" else "0"
    dk = {"blur": bool(int(os.environ.get("AOCR_GEN_BLUR", blur_default)))}
    kw = dict(distort_kwargs=dk, mode=mode,
              render_rng=rng if mode == "font" else None,
              natural_width=varwidth)
    if not os.path.exists(os.path.join(work, "dict.txt")):
        synth.make_dataset(work, lex_a, "train.txt", distort_rng=rng,
                           copies=copies, **kw)
        # held-out distortions of A words drive LR decay
        synth.make_dataset(work, lex_a[:300], "val.txt", distort_rng=rng,
                           **kw)
        synth.make_dataset(work, lex_b, "test_b.txt", distort_rng=rng,
                           **kw)
        with open(os.path.join(work, "dict.txt"), "w") as f:
            f.write("\n".join(sorted(lex_a + lex_b)) + "\n")

    mdir = os.path.join(work, "model")
    common = [
        "-data_base_dir", work, "-model_dir", mdir,
        "-batch_size", "256", "-input_feed",
        "-compute_dtype", "bfloat16",
        # one compiled program per phase: pad every batch's targets to
        # max_decoder_l (words are <= 8 chars) — without this, every
        # distinct batch-max word length compiles its own program
        "-pad_targets", "-max_decoder_l", "9",
    ] + (["-keep_aspect_ratio", "-snap_width_ladder"] if varwidth else []) + (
        os.environ.get("AOCR_GEN_EXTRA", "").split() or [])
    if phase in ("all", "train"):
        print(f"training {epochs} epochs ...", flush=True)
        run_phase(common + [
            "-phase", "train", "-data_path", "train.txt",
            "-val_data_path", "val.txt", "-num_epochs", str(epochs),
            "-steps_per_checkpoint", "400", "-load_model",
            "-log_path", os.path.join(work, "train_log.txt"),
            "-num_batches_val", "4",
        ])
    if phase == "train":
        return

    rows = []
    for name, extra in [
        ("greedy", []),
        ("beam5", ["-beam_size", "5"]),
        ("greedy+dict", ["-use_dictionary", "-dictionary_path",
                         os.path.join(work, "dict.txt")]),
        ("beam5+dict", ["-beam_size", "5", "-use_dictionary",
                        "-dictionary_path", os.path.join(work, "dict.txt")]),
    ]:
        log = os.path.join(work, f"test_{name}.txt")
        run_phase(common + [
            "-phase", "test", "-load_model", "-data_path", "test_b.txt",
            "-log_path", log,
        ] + extra)
        acc, cer = last_metrics(log)
        rows.append((name, acc, cer))
        print(f"UNSEEN-B {name}: exact-match {acc:.4f}  CER {cer:.4f}",
              flush=True)

    print("\n| decode | exact-match (unseen lexicon B) | CER |", flush=True)
    print("|---|---|---|", flush=True)
    for name, acc, cer in rows:
        print(f"| {name} | {acc * 100:.2f}% | {cer * 100:.3f}% |",
              flush=True)


if __name__ == "__main__":
    main()
