"""Gap-fill kernels: resample irregular points onto a regular grid.

north_rule: "downsamples through a retention ladder with linear/locf
gap-fill". The reference's only missing-value mechanic is `?` -> NaN at
parse (/root/reference/t2f/data/reader.py:167); the engine generalizes it
to grid resampling, implemented as vectorized numpy per series — no
per-row Python, no relational as-of join needed (SURVEY.md §2.3).

Grid: every multiple of ``step_ms`` inside [ts[0], ts[-1]] — both fill
methods are total on that range (locf always has a predecessor, linear
always brackets), which keeps the SQL oracle simple (ASOF JOIN / lag-lead
interpolation over generate_series).

  linear: np.interp at grid instants.
  locf:   last observation carried forward (value of the latest sample
          with sample_ts <= grid_ts).
"""

from __future__ import annotations

import numpy as np

__all__ = ["gapfill_grid"]


def gapfill_grid(
    ts_ms: np.ndarray,
    vals: np.ndarray,
    step_ms: int,
    method: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Resample one sorted series onto the regular grid. Returns
    (grid_ts_ms, grid_vals); empty arrays when no grid point fits."""
    if method not in ("linear", "locf"):
        raise ValueError(f"unknown fill method {method!r}")
    if len(ts_ms) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    first = -(-ts_ms[0] // step_ms)  # ceil
    last = ts_ms[-1] // step_ms  # floor
    if last < first:
        return np.empty(0, dtype=np.int64), np.empty(0)
    grid = np.arange(first, last + 1, dtype=np.int64) * step_ms
    if method == "linear":
        filled = np.interp(grid, ts_ms.astype(np.float64), vals)
    else:  # locf
        idx = np.searchsorted(ts_ms, grid, side="right") - 1
        filled = vals[idx]
    return grid, filled
