#!/usr/bin/env python3
"""Train-step roofline accounting: aggregate a trace_step listing into
model stages (via the HLO join) and compare each stage's measured time to
its algorithmic-FLOP roofline at v5e bf16 peak — the training analog of
performance.md's "Beam-5 roofline accounting".

Usage:
  python tools/trace_step.py 400 full 400 > /tmp/trace.log   # on TPU
  XLA_FLAGS=--xla_dump_to=/tmp/hlo python tools/dump_hlo.py 400
  python tools/train_roofline.py /tmp/trace.log /tmp/hlo/train_step_0.opt.txt

Fusion numbering shifts between the traced program (which threads a
carry probe) and the dump_hlo program (bench's exact step), so the join
is shape-verified (trace_attrib.lookup: candidate names at +/-1..3 must
carry the trace row's output shape+layout).  That join is what proved
clip@5/group effectively free: XLA fuses each gradient's squared-norm
reduce (optim.clip_grads_by_group) INTO the producing wgrad emitter, so
"clip cost" rides in the producer rows.

Reference hot loop this accounts for: src/train.lua:160-208 +
src/model/model.lua:284-700 (step -> forward -> backward -> clip -> sgd).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from trace_attrib import (  # noqa: E402
    describe, lookup, parse_hlo, parse_trace_shapes)

PEAK_TF = 197.0  # v5e bf16 dense peak, TFLOP/s
HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s


def stage_of(name, opname, src, line=""):
    f = src.split(":")[0]
    bwd = "transpose(jvp" in opname
    pallas = "pallas_call" in opname
    if f == "mm.py":
        # the shared matmul gate serves every subsystem — route by the
        # stacked time axis in the result shape (L=24 encoder, T=11
        # decoder; anything else is the projector).
        if re.search(r"\[24,\d+,", line):
            return ("encoder bwd" if bwd else "encoder fwd")
        if re.search(r"\[11,\d+,", line):
            return ("decoder bwd" if bwd else "decoder fwd")
        return "projector/loss"
    if f == "tf_fwd.py":
        return "decoder fwd"
    if f == "conv1_pool.py":
        return "cnn fwd"
    if f == "decoder.py":
        return ("decoder bwd" if (bwd or pallas) else "decoder fwd")
    if f == "lstm_fwd.py":
        return "encoder fwd"
    if f == "lstm.py":
        return ("encoder bwd" if (bwd or pallas) else "encoder fwd")
    if f == "cnn.py":
        return ("cnn bwd" if (bwd or pallas) else "cnn fwd")
    if f in ("head.py", "loss.py", "mm.py"):
        return "projector/loss"
    if f in ("optim.py", "train_step.py"):
        return "optimizer"
    if name.startswith("select_and_scatter"):
        return "cnn bwd"  # pool backward emitters carry no metadata
    if f:
        return "other"
    return "glue"  # pads/copies/slices/converts with no HLO metadata


def model_flops(B, T=11, W=100):
    """Algorithmic fwd FLOPs per step (TF), from the shipped geometry."""
    # CNN (models/cnn.py _CONV_DEFS at 32xW input; pools halve H, and W
    # twice).  2*H*W*kh*kw*Cin*Cout per conv.
    convs = [
        (32, W, 3, 3, 1, 64), (16, W // 2, 3, 3, 64, 128),
        (8, W // 4, 3, 3, 128, 256), (8, W // 4, 3, 3, 256, 256),
        (4, W // 4, 3, 3, 256, 512), (4, W // 4, 3, 3, 512, 512),
        (1, W // 4 - 1, 2, 2, 512, 512),
    ]
    cnn = sum(2 * h * w * kh * kw * ci * co for h, w, kh, kw, ci, co
              in convs) * B
    # Encoder: 2 dirs x L steps, gates (D_in=512 + H=512) -> 4H=2048.
    L = W // 4 - 1
    enc = 2 * L * 2 * (512 + 512) * 4 * 512 * B
    # Decoder: T steps, layer1 (emb 128 + [attn;h] 2048) -> 4096,
    # layer2 2048 -> 4096, attention (w_a H^2, scores/context 2*L*H, w_c
    # 2H*H), projector H x vp=128.
    H = 1024
    dec = T * B * (2 * (128 + 2048) * 4 * H + 2 * 2048 * 4 * H
                   + 2 * H * H + 4 * L * H + 2 * 2 * H * H
                   + 2 * H * 128)
    return {k: v / 1e12 for k, v in
            dict(cnn=cnn, encoder=enc, decoder=dec).items()}


def main():
    trace_log, hlo_txt = sys.argv[1], sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 400
    ops = parse_hlo(hlo_txt)
    agg, total = {}, 0.0
    for name, shape, ms, _x in parse_trace_shapes(trace_log):
        per = ms / steps
        total += per
        line = lookup(ops, name, shape)
        _k, opname, src, _e, _s = describe(line) if line else ("",) * 5
        s = stage_of(name, opname, src, line)
        agg[s] = agg.get(s, 0.0) + per

    fl = model_flops(B)
    # bwd = 2x fwd FLOPs (wgrad + dgrad); conv1 dgrad is DCE'd (images
    # are not differentiated) but is <0.3% of the CNN total.
    stages = [
        ("cnn fwd", fl["cnn"]), ("cnn bwd", 2 * fl["cnn"]),
        ("encoder fwd", fl["encoder"]), ("encoder bwd", 2 * fl["encoder"]),
        ("decoder fwd", fl["decoder"]), ("decoder bwd", 2 * fl["decoder"]),
        ("projector/loss", None), ("optimizer", None),
        ("glue", None), ("other", None),
    ]
    print("%-16s %9s %9s %12s %7s" % (
        "stage", "meas ms", "TFLOP", "roofline ms", "% roof"))
    tot_fl = 0.0
    for s, tf in stages:
        ms = agg.pop(s, 0.0)
        if tf is not None:
            tot_fl += tf
            roof = tf / PEAK_TF * 1e3
            pct = "%6.0f%%" % (100 * roof / ms) if ms else "      -"
            print("%-16s %9.3f %9.4f %12.2f %s" % (s, ms, tf, roof, pct))
        else:
            print("%-16s %9.3f %9s %12s %7s" % (s, ms, "-", "-", "-"))
    for s, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        print("%-16s %9.3f" % ("?" + s, ms))
    roof = tot_fl / PEAK_TF * 1e3
    print("%-16s %9.3f %9.4f %12.2f %6.0f%%" % (
        "TOTAL", total, tot_fl, roof, 100 * roof / total))
    # optimizer bandwidth floor: ~30M params, f32 read+write of params +
    # momentum + grad read = ~5 passes.
    print("# optimizer bandwidth floor ~%.2f ms (30M params x 5 f32 "
          "passes / %d GB/s)" % (30e6 * 4 * 5 / HBM_GBS / 1e6, HBM_GBS))


if __name__ == "__main__":
    main()
