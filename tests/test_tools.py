"""Bitrot guard for the tools/ scripts and console entry points: each must
import and print a usable help/usage screen without touching a device."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORM_NAME="cpu")


@pytest.mark.parametrize("tool", [
    "tools/import_torch.py",
    "tools/serve_bench.py",
])
def test_tool_help(tool):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, tool), "--help"],
        capture_output=True, text=True, timeout=120, env=ENV, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-500:]
    assert "usage" in r.stdout.lower()


@pytest.mark.parametrize("tool", [
    "tools/ab_pallas.py",
    "tools/profile_train.py",
    "tools/xplane_top.py",
    "tools/device_timing.py",
])
def test_tool_imports(tool):
    """Scripts without argparse must at least import cleanly."""
    mod = tool.replace("/", ".")[:-3]
    r = subprocess.run(
        [sys.executable, "-c", f"import {mod}; print('ok')"],
        capture_output=True, text=True, timeout=120, env=ENV, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-500:]


def test_console_script_entry():
    """pyproject's aocr-import-torch = aocr.torch_import:_cli must resolve."""
    from aocr.torch_import import _cli  # noqa: F401

    assert callable(_cli)


def test_serve_module_cli_help():
    r = subprocess.run(
        [sys.executable, "-m", "aocr.serve", "--help"],
        capture_output=True, text=True, timeout=120, env=ENV, cwd=ROOT)
    assert r.returncode == 0 and "model_dir" in r.stdout
