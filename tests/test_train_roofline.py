"""tools/train_roofline.py: the shape-verified trace<->HLO join and the
stage bucketing that the train-step roofline accounting table
(docs/performance.md) is built from.

The join must NOT trust fusion numbers: the traced program threads a
carry probe, so its fusion numbering is shifted against the dump_hlo
program — an exact name hit can be a DIFFERENT op (observed on-chip:
the trace's fusion.184 was conv5's dgrad, the dump's fusion.184 a tiny
weight convert).  Only a name candidate whose dump line carries the
trace row's output shape+layout may match.
"""

import sys

import pytest

sys.path.insert(0, "tools")

import train_roofline as tr  # noqa: E402

HLO = """
  %fusion.183 = bf16[400,4,25,256]{3,0,2,1:T(8,128)(2,1)} fusion(%a), kind=kOutput, metadata={op_name="jit(f)/transpose(jvp())/conv_general_dilated" source_file="/root/repo/aocr/models/cnn.py" source_line=473}
  %fusion.184 = bf16[3,3,256,512]{3,2,1,0:T(8,128)(2,1)} fusion(%b), kind=kLoop, metadata={op_name="jit(f)/jvp()/convert_element_type" source_file="/root/repo/aocr/models/cnn.py" source_line=468}
  %fusion.27 = bf16[24,400,2048]{2,1,0:T(8,128)(2,1)} fusion(%c), kind=kOutput, metadata={op_name="jit(f)/jvp()/dot_general" source_file="/root/repo/aocr/ops/mm.py" source_line=26}
"""

TRACE = """
== /device:TPU:0 [XLA Ops] (total 4.00 ms across 3 events) ==
  fusion.184 bf16[400,4,25,256]{3,0,2,1:T(8,128)(2,1)}    3.000 ms  x3      50.0%
  fusion.27 bf16[24,400,2048]{2,1,0:T(8,128)(2,1)}    0.600 ms  x3      10.0%
  pad.10 bf16[16,50,64,512]{3,2,1,0:T(8,128)(2,1)}    0.300 ms  x3       5.0%
"""


@pytest.fixture()
def files(tmp_path):
    hp = tmp_path / "hlo.txt"
    tp = tmp_path / "trace.log"
    hp.write_text(HLO)
    tp.write_text(TRACE)
    return str(tp), str(hp)


def test_shape_verified_lookup_rejects_wrong_exact_hit(files):
    _, hp = files
    ops = tr.parse_hlo(hp)
    # exact name "fusion.184" exists in the dump but with a DIFFERENT
    # shape — the join must fall through to the off-by-one neighbor
    # whose line carries the trace shape.
    line = tr.lookup(ops, "fusion.184",
                     "bf16[400,4,25,256]{3,0,2,1:T(8,128)(2,1)}")
    assert "fusion.183" in line
    assert "conv_general_dilated" in line


def test_parse_trace_shapes(files):
    tp, _ = files
    rows = tr.parse_trace_shapes(tp)
    assert rows[0] == ("fusion.184",
                       "bf16[400,4,25,256]{3,0,2,1:T(8,128)(2,1)}",
                       3.0, 3)
    assert len(rows) == 3


def test_stage_bucketing(files):
    tp, hp = files
    ops = tr.parse_hlo(hp)
    agg = {}
    for name, shape, ms, _x in tr.parse_trace_shapes(tp):
        line = tr.lookup(ops, name, shape)
        _k, opname, src, _e, _s = (tr.describe(line) if line
                                   else ("",) * 5)
        s = tr.stage_of(name, opname, src, line)
        agg[s] = agg.get(s, 0.0) + ms / 3
    # conv dgrad -> cnn bwd; mm.py with a 24-leading-axis shape routes to
    # the ENCODER (not projector); the metadata-less pad -> glue
    assert agg == pytest.approx(
        {"cnn bwd": 1.0, "encoder fwd": 0.2, "glue": 0.1})


def test_model_flops_consistent_with_bench_accounting():
    fl = tr.model_flops(400)
    total = fl["cnn"] + fl["encoder"] + fl["decoder"]
    # fwd+bwd = 3x fwd; bench.py's train MFU accounting and the measured
    # ~71% MFU at ~16 ms imply ~2.27 TFLOP/step at B=400
    assert 3 * total == pytest.approx(2.267, rel=0.02)
