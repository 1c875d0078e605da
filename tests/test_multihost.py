"""Multi-host lockstep machinery (VERDICT r1 item 5 / advisor medium).

Layers:
1. pure-logic tests of the lockstep generator and shard/batch math with an
   injected sync (simulating uneven hosts without multiple processes)
2. a single-process CLI run with -multihost (lockstep path active,
   trivial sync) asserting fixed shapes and correct accounting
3. a REAL 2-process jax.distributed CPU run (subprocesses coordinating
   over localhost) training on uneven manifest shards
"""

import os
import subprocess
import sys
import textwrap

import pytest

from aocr.parallel import multihost
from tests import synth

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_batch_size():
    assert multihost.local_batch_size(400, 4) == 100
    assert multihost.local_batch_size(10, 3) == 3
    with pytest.raises(AssertionError):
        multihost.local_batch_size(2, 4)


def test_lockstep_uneven_hosts():
    """Two simulated hosts with 3 vs 5 batches: the short host must emit
    exactly 2 dummies, both must see identical global counts, and both
    stop together."""
    batches_a = [("a", i) for i in range(3)]
    batches_b = [("b", i) for i in range(5)]
    nnz_rows = lambda b: (7, 2)  # every real batch: 7 tokens, 2 rows
    dummy = lambda: ("dummy", -1)

    # Scripted allreduce: precompute each round's global sums (both
    # hosts' have/nnz/rows added) — what a real blocking allreduce would
    # return to both hosts.
    rounds = []
    for i in range(6):  # max(3,5) + final all-done round
        ha = 1 if i < 3 else 0
        hb = 1 if i < 5 else 0
        rounds.append((ha + hb, 7 * (ha + hb), 2 * (ha + hb)))

    def make_scripted_sync():
        state = {"i": 0}

        def sync(*counts):
            out = rounds[state["i"]]
            state["i"] += 1
            return out
        return sync

    out_a = list(multihost.lockstep(iter(batches_a), dummy, nnz_rows,
                                    sync=make_scripted_sync()))
    out_b = list(multihost.lockstep(iter(batches_b), dummy, nnz_rows,
                                    sync=make_scripted_sync()))
    # both hosts perform 5 steps then stop on the all-done round
    assert len(out_a) == 5 and len(out_b) == 5
    # host a: 3 real + 2 dummies; host b: 5 real
    assert [real for _, real, _, _ in out_a] == [True] * 3 + [False] * 2
    assert [real for _, real, _, _ in out_b] == [True] * 5
    assert out_a[3][0] == ("dummy", -1)
    # global counts identical across hosts per round
    for ra, rb in zip(out_a, out_b):
        assert ra[2:] == rb[2:]
    # rounds 0-2: both hosts real (14 tokens, 4 rows); 3-4: only b (7, 2)
    assert out_a[0][2:] == (14, 4) and out_a[4][2:] == (7, 2)


def test_lockstep_single_process_passthrough():
    """With the real sync on one process, lockstep is a passthrough."""
    batches = [1, 2, 3]
    out = list(multihost.lockstep(
        iter(batches), lambda: 0, lambda b: (b * 10, 1)))
    assert [b for b, _, _, _ in out] == [1, 2, 3]
    assert all(real for _, real, _, _ in out)
    assert [nnz for _, _, nnz, _ in out] == [10, 20, 30]


def test_multihost_cli_single_process(tmp_path):
    """-multihost on one process: lockstep path active (fixed target
    shapes, rows padded to local_bs, process-0 save) — the full CLI round
    trip must work and reach a checkpoint."""
    from aocr import checkpoint
    from aocr.train import main

    d = str(tmp_path)
    labels = ["ab", "cd", "ef", "gh", "ij"]  # 5 rows: partial batches
    synth.make_dataset(d, labels, "train.txt", width=32)
    synth.make_dataset(d, labels, "val.txt", width=32)
    main([
        "-data_base_dir", d, "-data_path", "train.txt",
        "-val_data_path", "val.txt",
        "-model_dir", os.path.join(d, "model"),
        "-log_path", os.path.join(d, "log.txt"),
        "-batch_size", "4", "-num_batches_val", "1",
        "-encoder_num_hidden", "16", "-target_embedding_size", "8",
        "-max_decoder_l", "8", "-image_width", "32", "-input_feed",
        "-num_shards", "2", "-multihost",
        "-phase", "train", "-num_epochs", "1", "-steps_per_checkpoint", "2",
    ])
    log = open(os.path.join(d, "log.txt")).read()
    assert "Multi-host lockstep: process 0/1, 4 rows/host/step" in log
    assert checkpoint.try_load_final(os.path.join(d, "model")) is not None


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; workdir = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 virtual CPU devices per process
    from aocr.train import main
    main([
        "-data_base_dir", workdir, "-data_path", "train.txt",
        "-val_data_path", "val.txt",
        "-model_dir", os.path.join(workdir, "model"),
        "-log_path", os.path.join(workdir, f"log{pid}.txt"),
        "-batch_size", "4", "-num_batches_val", "1",
        "-encoder_num_hidden", "16", "-target_embedding_size", "8",
        "-max_decoder_l", "8", "-image_width", "32", "-input_feed",
        "-multihost",
        "-phase", "train", "-num_epochs", "1",
        "-steps_per_checkpoint", "2",
    ] + sys.argv[4:])
    print(f"WORKER{pid} DONE")
""")


def test_two_process_distributed_train(tmp_path):
    """REAL multi-process run: 2 jax.distributed CPU processes (2 virtual
    devices each) train over a 4-wide data mesh with UNEVEN manifest
    shards (7 rows -> 4 + 3), forcing the lockstep dummy-batch drain."""
    d = str(tmp_path)
    labels = ["ab", "cd", "ef", "gh", "ij", "kl", "mn"]  # 7 rows: uneven
    synth.make_dataset(d, labels, "train.txt", width=32)
    synth.make_dataset(d, labels[:4], "val.txt", width=32)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORM_NAME", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = ROOT
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port, d,
             "-num_shards", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=ROOT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out (lockstep deadlock?)\n"
                    + "\n".join(o or "" for o in outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i} DONE" in out
    # only process 0 writes checkpoints
    from aocr import checkpoint

    assert checkpoint.try_load_final(os.path.join(d, "model")) is not None
    log0 = open(os.path.join(d, "log0.txt")).read()
    log1 = open(os.path.join(d, "log1.txt")).read()
    assert "Multi-host lockstep: process 0/2, 2 rows/host/step" in log0
    assert "Multi-host lockstep: process 1/2, 2 rows/host/step" in log1
    # both hosts saw the same global val accuracy line
    import re

    acc0 = re.findall(r"Val Accuracy = ([\d.]+)", log0)
    acc1 = re.findall(r"Val Accuracy = ([\d.]+)", log1)
    assert acc0 and acc0 == acc1


def test_two_process_distributed_tp_train(tmp_path):
    """Multi-host DP x TP: 2 jax.distributed processes over a (2, 2)
    (data, model) mesh — TP pairs land within one process, DP crosses
    hosts.  Validates the r2 assert lift: GSPMD TP training + the flat
    4-device eval mesh both compose with -multihost."""
    d = str(tmp_path)
    labels = ["ab", "cd", "ef", "gh", "ij", "kl", "mn"]  # uneven shards
    synth.make_dataset(d, labels, "train.txt", width=32)
    synth.make_dataset(d, labels[:4], "val.txt", width=32)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORM_NAME", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = ROOT
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port, d,
             "-num_shards", "2", "-num_model_shards", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=ROOT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed TP workers timed out\n"
                    + "\n".join(o or "" for o in outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"TP worker {i} failed:\n{out}"
        assert f"WORKER{i} DONE" in out
    from aocr import checkpoint

    assert checkpoint.try_load_final(os.path.join(d, "model")) is not None
    log0 = open(os.path.join(d, "log0.txt")).read()
    log1 = open(os.path.join(d, "log1.txt")).read()
    assert "DP x TP training over a 2x2 (data, model) mesh" in log0
    assert "Sharded evaluation over 4 devices" in log0
    import re

    acc0 = re.findall(r"Val Accuracy = ([\d.]+)", log0)
    acc1 = re.findall(r"Val Accuracy = ([\d.]+)", log1)
    assert acc0 and acc0 == acc1
