"""The bench.py stall watchdog: a wedged device RPC must re-exec the
process (bounded attempts), then fail honestly — never hang the driver's
unattended round-end bench run or emit a stale JSON line.

The dev-tunnel failure mode being defended against: a single dispatch
blocks forever in native code with the process alive at ~0 CPU (CLAUDE.md
"Environment gotchas"); only a fresh process recovers.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stall_script(tmp_path):
    """A stand-in for a wedged bench: starts the real watchdog, reports its
    attempt number, then blocks forever (no _tick)."""
    script = tmp_path / "stall.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys, time
        sys.path.insert(0, {REPO!r})
        import bench
        bench._start_watchdog()
        print("attempt", os.environ.get("AOCR_BENCH_ATTEMPT", "1"),
              flush=True)
        time.sleep(300)
    """))
    return str(script)


def test_watchdog_reexecs_then_gives_up(tmp_path):
    env = dict(
        os.environ,
        AOCR_BENCH_STALL_S="2",
        AOCR_BENCH_MAX_ATTEMPTS="3",
    )
    env.pop("AOCR_BENCH_ATTEMPT", None)
    proc = subprocess.run(
        [sys.executable, _stall_script(tmp_path)],
        capture_output=True, text=True, timeout=60, env=env,
    )
    # one line per attempt: the re-exec preserved argv and bumped the counter
    assert proc.stdout.split() == [
        "attempt", "1", "attempt", "2", "attempt", "3"]
    assert proc.returncode == 1
    assert "giving up" in proc.stderr
    assert "re-exec" in proc.stderr


def test_watchdog_quiet_while_progress_ticks(tmp_path):
    """A process that keeps ticking is never re-exec'd and exits cleanly."""
    script = tmp_path / "ticks.py"
    script.write_text(textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {REPO!r})
        import bench
        bench._start_watchdog()
        for _ in range(8):
            time.sleep(0.5)
            bench._tick()
        print("done", flush=True)
    """))
    env = dict(os.environ, AOCR_BENCH_STALL_S="2", AOCR_BENCH_MAX_ATTEMPTS="2")
    env.pop("AOCR_BENCH_ATTEMPT", None)
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert proc.returncode == 0
    assert proc.stdout.strip() == "done"
    assert "re-exec" not in proc.stderr


def test_watchdog_disabled(tmp_path):
    env = dict(os.environ, AOCR_BENCH_WATCHDOG="0", AOCR_BENCH_STALL_S="1")
    script = tmp_path / "off.py"
    script.write_text(textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {REPO!r})
        import bench
        bench._start_watchdog()
        time.sleep(3)
        print("survived", flush=True)
    """))
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert proc.returncode == 0
    assert proc.stdout.strip() == "survived"
