"""`JAX_PLATFORM_NAME=cpu` must keep every aocr entry point off the TPU
plugin entirely.

On this stack, JAX_PLATFORM_NAME only selects the *default* backend —
plugin discovery still initializes the axon TPU client, so a dead tunnel
blocks even pure-CPU runs (and the plugin ignores the JAX_PLATFORMS env
var).  aocr/__init__.py mirrors an explicit `cpu` into the jax_platforms
config before any backend is touched, the same trick tests/conftest.py
uses.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, **env_overrides):
    env = dict(os.environ)
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, env=env, cwd=REPO,
    )


def test_cpu_env_confines_jax_to_cpu():
    proc = _run(
        "import aocr, jax; ds = jax.devices(); "
        "print([d.platform for d in ds])",
        JAX_PLATFORM_NAME="cpu",
    )
    assert proc.returncode == 0, proc.stderr
    assert "cpu" in proc.stdout
    assert "axon" not in proc.stdout.lower()


def test_no_env_leaves_platform_selection_alone():
    # reading the config attribute does not initialize any backend; with no
    # env var set, importing aocr must leave whatever default this stack
    # ships (e.g. 'axon,cpu') untouched
    base = _run("import jax; print(repr(jax.config.jax_platforms))")
    assert base.returncode == 0, base.stderr
    proc = _run("import aocr, jax; print(repr(jax.config.jax_platforms))")
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == base.stdout.strip()
