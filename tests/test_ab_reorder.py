"""tools/ab_reorder.py: the beam parent-reorder isolation kernel.

The microbench's timing claim (performance.md, whole-beam-loop section)
is only meaningful if every variant computes the SAME gather — pin the
`selects` (shipped formulation) and `fma` (one-hot multiply-accumulate)
step bodies element-equal in interpret mode, and the no-gather baseline
genuinely different (otherwise the subtraction measures nothing).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

import ab_reorder as ar  # noqa: E402


@pytest.fixture()
def tiny(monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(ar, "S", 3)
    monkeypatch.setattr(ar, "BT", 8)
    monkeypatch.setattr(ar, "H", 64)
    ar.build.cache_clear()
    rng = np.random.RandomState(0)
    B = 16
    seed = jnp.asarray(
        rng.uniform(0.1, 0.9, (B, ar.K * ar.H)).astype(np.float32))
    return B, seed


def test_select_and_fma_variants_agree(tiny):
    B, seed = tiny
    out = {v: np.asarray(ar.build(v, B, interpret=True)(seed))
           for v in ("none", "selects", "fma")}
    assert np.array_equal(out["selects"], out["fma"])
    # the gather must actually permute state (the baseline subtraction
    # would otherwise measure a no-op); the SUM is permutation-invariant
    # by construction, so compare elementwise
    assert not np.array_equal(out["selects"], out["none"])
    np.testing.assert_allclose(out["selects"].sum(), out["none"].sum(),
                               rtol=1e-6)
