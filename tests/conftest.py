"""Test environment: force JAX onto CPU with 8 virtual devices so sharding
tests can exercise a multi-chip mesh without TPU hardware.

Note: on this stack the axon TPU plugin ignores the `JAX_PLATFORMS` env var;
`JAX_PLATFORM_NAME` (and jax.config jax_platforms) do work.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is jit-compile-dominated
# (~26 min cold), and XLA:CPU programs cache fine — repeat runs of a
# compile-heavy file measured ~2x faster (31 -> 14 s for one full
# train-step compile).  Keyed by HLO hash, so source changes miss
# naturally; delete the directory to force cold compiles.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --- smoke tier (VERDICT r4 ask #7) ----------------------------------------
# `pytest -m smoke` runs a <5-min subset: the pure-unit files, one
# interpret-mode Pallas kernel file (tf_fwd covers the whole-scan forward
# kernel + its ragged-block handling), and the CLI integration file (train/
# resume/checkpoint through the real argv surface).  Measured wall time:
# ~1.5 min warm-cache, ~4 min cold (compile-dominated).  The full ~26-min
# suite remains the round gate.
_SMOKE_MODULES = {
    "test_vocab", "test_trie", "test_loss", "test_tiling", "test_optim",
    "test_eval", "test_data", "test_tf_fwd", "test_cli", "test_synth_font",
    "test_train_roofline",
}
# Known-slow outliers excluded from smoke even inside smoke modules.
_SMOKE_EXCLUDE = {"test_synth90k_scale_dictionary"}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast subset (pytest -m smoke, <5 min)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__.rsplit(".", 1)[-1] in _SMOKE_MODULES
                and item.originalname not in _SMOKE_EXCLUDE
                and item.name.split("[")[0] not in _SMOKE_EXCLUDE):
            item.add_marker(pytest.mark.smoke)
# ----------------------------------------------------------------------------


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
