"""Batch-tile selection shared by the Pallas backward-recurrence kernels.

The backward kernels grid over (batch tiles, timesteps).  A fixed tile of
128 rows pads B=400 to 512 — 28% of the kernel's matmul work spent on
padding rows.  `pick_bt` instead tries 1, 2, 3, ... grid rows and takes
the largest per-row tile whose VMEM estimate fits, so the padded batch
hugs the real one (400 -> 408 at three rows of 136).

Calibration: Mosaic's real scoped-VMEM allocation measured 77.8 MB against
a 67.3 MB naive buffer sum for the decoder kernel at bt=128 (grid-pipelined
streams double-buffer, plus alignment) — so candidates above the legacy
tile must clear the budget with a 1.25x margin on the estimate.
"""

from __future__ import annotations

from typing import Callable, Tuple

# Single source for the per-kernel hardware constants: every pallas
# module imports these, so retuning for another TPU generation is ONE
# edit and a kernel's fits() gate can never disagree with its
# pallas_call vmem_limit_bytes.
B_TILE = 128
LANE = 128
VMEM_BUDGET = 100 * 1024 * 1024  # headroom under the ~128 MB v5e VMEM
MARGIN = 16 * 1024 * 1024
CALIBRATION = 1.25


def pick_bt(
    B0: int,
    estimate: Callable[[int], int],
    b_tile: int,
) -> Tuple[int, int]:
    """Choose (bt, pad) minimizing padded batch size.

    estimate(bt) -> naive VMEM byte count at that tile.  Candidates larger
    than the legacy `b_tile` are accepted only when the calibrated estimate
    fits; otherwise falls back to the legacy fixed-tile behavior (whose
    feasibility the kernel's fits() gate already asserted).
    """
    n = 1
    while True:
        bt = -(-B0 // n)
        if bt > 8:
            bt = -(-bt // 8) * 8  # sublane multiple keeps rows unmasked
        if bt <= b_tile:
            break
        if estimate(bt) * CALIBRATION <= VMEM_BUDGET - MARGIN:
            return bt, bt * n - B0
        n += 1
    if B0 <= b_tile:
        return B0, 0
    return b_tile, (-B0) % b_tile
