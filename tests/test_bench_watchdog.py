"""The bench.py stall guard: a wedged device RPC must get its child
process killed and respawned (bounded attempts), then fail honestly —
never hang the driver's unattended round-end bench run or emit a stale
JSON line.

The dev-tunnel failure mode being defended against: a single dispatch
blocks forever in native code with the process alive at ~0 CPU (CLAUDE.md
"Environment gotchas"); only a fresh process recovers.  The guard is a
supervisor PROCESS (heartbeat file + kill/respawn), not an in-process
thread — host threads running alongside jit dispatch are themselves a
documented tunnel-wedge trigger, so the measuring child stays
thread-free.

Child stand-ins here touch the heartbeat file directly (the same channel
`bench._tick()` uses — pinned by test__tick_touches_heartbeat) instead of
importing bench, so the tight stall windows race child logic, not numpy
import time.
"""

import os
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _runner(tmp_path, child_body: str) -> str:
    """A supervisor entry whose child is a stand-in for bench's measuring
    process: `bench._supervise([...child...])` in the parent, the child
    body in a second script."""
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(f"""
        import os, sys, time
        {child_body}
    """))
    runner = tmp_path / "runner.py"
    runner.write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import bench
        bench._supervise([sys.executable, {str(child)!r}])
        print("unsupervised fallthrough", flush=True)
    """))
    return str(runner)


def _env(**kw):
    env = dict(os.environ, **{k: str(v) for k, v in kw.items()})
    # neutralize EVERY inherited bench knob: a developer shell with
    # AOCR_BENCH_WATCHDOG=0 exported must not flip these tests
    for k in ("AOCR_BENCH_ATTEMPT", "AOCR_BENCH_SUPERVISED",
              "AOCR_BENCH_WATCHDOG", "AOCR_BENCH_HEARTBEAT"):
        env.pop(k, None)
    env.update({k: str(v) for k, v in kw.items()})
    return env


def test_supervisor_kills_wedged_child_then_gives_up(tmp_path):
    runner = _runner(tmp_path, """
        print("attempt", os.environ.get("AOCR_BENCH_ATTEMPT", "?"),
              flush=True)
        time.sleep(300)  # wedged: never ticks
    """)
    proc = subprocess.run(
        [sys.executable, runner],
        capture_output=True, text=True, timeout=120,
        env=_env(AOCR_BENCH_STALL_S=8, AOCR_BENCH_MAX_ATTEMPTS=3),
    )
    lines = proc.stdout.strip().splitlines()
    # one line per attempt: each respawn bumped the counter
    assert lines[:3] == ["attempt 1", "attempt 2", "attempt 3"]
    # the give-up path still honors the one-JSON-line contract, with an
    # explicit error naming the stall (environment failure, not a crash)
    import json

    final = json.loads(lines[3])
    assert final["value"] == 0 and "TPU unreachable" in final["error"]
    assert len(lines) == 4
    assert proc.returncode == 1
    assert "giving up" in proc.stderr
    assert "killing wedged child" in proc.stderr


def test_supervisor_quiet_while_progress_ticks(tmp_path):
    """A child that keeps ticking the heartbeat is never killed; its exit
    code and stdout propagate."""
    runner = _runner(tmp_path, """
        hb = os.environ["AOCR_BENCH_HEARTBEAT"]
        for _ in range(10):
            time.sleep(0.5)
            os.utime(hb, None)  # what bench._tick() does
        print("done", flush=True)
    """)
    proc = subprocess.run(
        [sys.executable, runner],
        capture_output=True, text=True, timeout=120,
        env=_env(AOCR_BENCH_STALL_S=15, AOCR_BENCH_MAX_ATTEMPTS=2),
    )
    assert proc.returncode == 0
    assert proc.stdout.strip() == "done"
    assert "killing" not in proc.stderr


def test_supervisor_propagates_crash_without_retry(tmp_path):
    """A child that CRASHES (vs wedges) is not retried — retrying would
    mask real bugs behind the attempt budget."""
    runner = _runner(tmp_path, """
        print("attempt", os.environ.get("AOCR_BENCH_ATTEMPT", "?"),
              flush=True)
        sys.exit(7)
    """)
    proc = subprocess.run(
        [sys.executable, runner],
        capture_output=True, text=True, timeout=120,
        env=_env(AOCR_BENCH_STALL_S=30, AOCR_BENCH_MAX_ATTEMPTS=3),
    )
    assert proc.stdout.split() == ["attempt", "1"]
    assert proc.returncode == 7


def test_supervisor_default_argv_respawns_self(tmp_path):
    """With no child_argv, _supervise respawns `[sys.executable] + sys.argv`
    — the path production bench.py uses; flags must survive the respawn."""
    script = tmp_path / "selfsup.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        sys.path.insert(0, {REPO!r})
        import bench
        bench._supervise()  # parent: supervises; child: returns
        print("args", " ".join(sys.argv[1:]),
              "attempt", os.environ.get("AOCR_BENCH_ATTEMPT", "?"),
              flush=True)
    """))
    proc = subprocess.run(
        [sys.executable, str(script), "--flag", "x1"],
        capture_output=True, text=True, timeout=120,
        env=_env(AOCR_BENCH_STALL_S=30, AOCR_BENCH_MAX_ATTEMPTS=2),
    )
    assert proc.returncode == 0
    assert proc.stdout.strip() == "args --flag x1 attempt 1"


def test_supervisor_disabled(tmp_path):
    """AOCR_BENCH_WATCHDOG=0: _supervise returns and the caller proceeds
    inline (no child, no threads)."""
    runner = _runner(tmp_path, "pass")
    proc = subprocess.run(
        [sys.executable, runner],
        capture_output=True, text=True, timeout=60,
        env=_env(AOCR_BENCH_WATCHDOG=0, AOCR_BENCH_STALL_S=1),
    )
    assert proc.returncode == 0
    assert proc.stdout.strip() == "unsupervised fallthrough"


def test__tick_touches_heartbeat(tmp_path):
    """bench._tick's progress channel IS the heartbeat file mtime (what the
    stand-in children above emulate)."""
    import bench

    hb = tmp_path / "hb"
    hb.write_text("")
    past = time.time() - 1000
    os.utime(hb, (past, past))
    old = os.environ.get("AOCR_BENCH_HEARTBEAT")
    os.environ["AOCR_BENCH_HEARTBEAT"] = str(hb)
    try:
        bench._tick()
    finally:
        if old is None:
            del os.environ["AOCR_BENCH_HEARTBEAT"]
        else:
            os.environ["AOCR_BENCH_HEARTBEAT"] = old
    assert os.stat(hb).st_mtime > past + 500


def test_measuring_child_spawns_no_threads(tmp_path):
    """The measuring (supervised) process must stay thread-free: _tick is
    a file touch, and _supervise returns immediately under
    AOCR_BENCH_SUPERVISED."""
    script = tmp_path / "check.py"
    script.write_text(textwrap.dedent(f"""
        import sys, threading
        sys.path.insert(0, {REPO!r})
        import bench
        bench._supervise()
        bench._tick()
        assert threading.active_count() == 1, threading.enumerate()
        print("thread-free", flush=True)
    """))
    env = dict(os.environ, AOCR_BENCH_SUPERVISED="1")
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert proc.returncode == 0
    assert proc.stdout.strip() == "thread-free"


def test_supervisor_done_marker_is_success_not_stall(tmp_path):
    """A child that printed its JSON line and then wedged in teardown
    (the tunnel's known failure mode) must read as SUCCESS: no retry,
    no value-0 error line, exit 0."""
    runner = _runner(tmp_path, """
        hb = os.environ["AOCR_BENCH_HEARTBEAT"]
        print('{"metric": "m", "value": 1}', flush=True)
        open(hb + ".done", "w").close()
        time.sleep(300)  # wedged in teardown
    """)
    proc = subprocess.run(
        [sys.executable, runner],
        capture_output=True, text=True, timeout=120,
        env=_env(AOCR_BENCH_STALL_S=6, AOCR_BENCH_MAX_ATTEMPTS=3),
    )
    assert proc.returncode == 0
    lines = proc.stdout.strip().splitlines()
    assert lines == ['{"metric": "m", "value": 1}']
    assert "wedged in teardown" in proc.stderr
    assert "giving up" not in proc.stderr
