"""Batch-tile selection for the Pallas backward kernels (ops/pallas/tiling)."""

import jax.numpy as jnp

from aocr.ops.pallas import lstm_bwd, tf_bwd, tiling


def test_small_batch_untouched():
    bt, pad = tiling.pick_bt(8, lambda b: 10**12, 128)
    assert (bt, pad) == (8, 0)
    bt, pad = tiling.pick_bt(100, lambda b: 10**12, 128)
    assert (bt, pad) == (100, 0)


def test_legacy_fallback_when_nothing_fits():
    # Estimate too large at every candidate above the legacy tile.
    bt, pad = tiling.pick_bt(400, lambda b: 10**12, 128)
    assert (bt, pad) == (128, 112)  # 400 -> 512, the old behavior


def test_minimal_padding_when_fits():
    # Constant small estimate: the single-row tile wins with zero padding.
    bt, pad = tiling.pick_bt(400, lambda b: 0, 128)
    assert (bt, pad) == (400, 0)


def test_tile_shrinks_until_estimate_fits():
    budget = (tiling.VMEM_BUDGET - tiling.MARGIN) / tiling.CALIBRATION
    # Estimate linear in bt, sized so one row is too big but two fit.
    per_row = budget / 250

    bt, pad = tiling.pick_bt(400, lambda b: int(per_row * b), 128)
    assert bt == 200 and pad == 0
    assert per_row * 400 > budget and per_row * 200 <= budget


def test_sublane_rounding():
    # 500 rows over 2 tiles -> 250 -> rounded up to 256 (multiple of 8).
    bt, pad = tiling.pick_bt(500, lambda b: 0 if b <= 256 else 10**12, 128)
    assert bt == 256 and pad == 12 and bt % 8 == 0


def test_bench_shapes_avoid_28pct_padding():
    """The B=400 train shapes must no longer pad to 512 in either kernel."""
    H, L, T, nl = 1024, 24, 11, 2
    item = jnp.dtype(jnp.bfloat16).itemsize
    bt, pad = tiling.pick_bt(
        400, lambda b: tf_bwd.vmem_bytes(L, H, T, nl, True, item, b),
        tf_bwd.B_TILE)
    assert (400 + pad) < 512 and (400 + pad) % bt == 0
    bt2, pad2 = tiling.pick_bt(
        400, lambda b: lstm_bwd.vmem_bytes(512, item, b), lstm_bwd.B_TILE)
    assert (400 + pad2) < 512 and (400 + pad2) % bt2 == 0
