"""Mergeable quantile sketches for algebraic tier maintenance.

The exact ladder computes every tier's holistic stats (quantiles,
autocorrelation) from raw points — bit-exact, one pass, but a coarse
tier can then only be UPDATED by re-reading raw points of the touched
chunk (ContinuousRollup's re-roll). This module is the documented
approximate alternative for continuous maintenance at 100 TB: each fine
window carries a fixed-size mergeable sketch, and coarser tiers fold
finer sketches without ever touching raw data again.

Sketch = equi-width histogram (min, max, nbins counts) — the simplest
sketch with a hard error bound, best stated in RANK terms: the
estimate's empirical rank is off by at most the mass of its containing
bin (≈ n/nbins for non-degenerate data; the equivalent value-error is
one bin width plus the local order-statistic gap, which matters only
for windows with few points relative to nbins). Merging
rebins each input histogram into the union range assuming uniform mass
within a bin (the standard histogram-join rule). All operations are
vectorized across many windows at once (no per-row Python, matching the
kernel posture), and the binary layout is a plain float64 vector so it
round-trips through an `array<double>` Spark column.

Layout per sketch (float64 vector, length nbins + 3):
  [0] = count, [1] = min, [2] = max, [3:] = per-bin counts.
"""

from __future__ import annotations

import numpy as np


def build_sketches(
    mat: np.ndarray, counts: np.ndarray, nbins: int = 64
) -> np.ndarray:
    """One histogram sketch per NaN-padded window row -> (k, nbins+3)."""
    k, w = mat.shape
    out = np.zeros((k, nbins + 3))
    if w == 0:
        return out
    lo = np.nanmin(mat, axis=1)
    hi = np.nanmax(mat, axis=1)
    out[:, 0] = counts
    out[:, 1] = lo
    out[:, 2] = hi
    span = hi - lo
    span = np.where(span > 0, span, 1.0)
    filled = np.where(np.isnan(mat), lo[:, None], mat)
    b = ((filled - lo[:, None]) / span[:, None] * nbins).astype(np.int64)
    b = np.clip(b, 0, nbins - 1)
    b = np.where(np.isnan(mat), -1, b)
    rows = np.repeat(np.arange(k), w)
    flat = b.ravel()
    valid = flat >= 0
    np.add.at(out[:, 3:], (rows[valid], flat[valid]), 1.0)
    return out


def merge_sketches(
    sk: np.ndarray, group_of: np.ndarray, n_groups: int
) -> np.ndarray:
    """Fold sketches into their target group (fine tier -> coarse tier)
    fully vectorized: each input bin's mass is split between the two
    covering output bins proportionally (uniform-within-bin rule)."""
    nbins = sk.shape[1] - 3
    out = np.zeros((n_groups, nbins + 3))
    np.add.at(out[:, 0], group_of, sk[:, 0])
    # union range per group (ignore empty sketches)
    lo = np.full(n_groups, np.inf)
    hi = np.full(n_groups, -np.inf)
    nonempty = sk[:, 0] > 0
    np.minimum.at(lo, group_of[nonempty], sk[nonempty, 1])
    np.maximum.at(hi, group_of[nonempty], sk[nonempty, 2])
    lo = np.where(np.isfinite(lo), lo, 0.0)
    hi = np.where(np.isfinite(hi), hi, 0.0)
    out[:, 1] = lo
    out[:, 2] = hi
    gspan = np.where(hi - lo > 0, hi - lo, 1.0)

    # input bin edges mapped into the group's bin coordinate system
    k = len(sk)
    ispan = np.where(sk[:, 2] - sk[:, 1] > 0, sk[:, 2] - sk[:, 1], 1.0)
    edges = np.arange(nbins + 1)[None, :] / nbins  # (1, nbins+1)
    src_lo = sk[:, 1][:, None] + edges[:, :-1] * ispan[:, None]
    src_hi = sk[:, 1][:, None] + edges[:, 1:] * ispan[:, None]
    g = group_of
    tgt_lo = (src_lo - lo[g][:, None]) / gspan[g][:, None] * nbins
    tgt_hi = (src_hi - lo[g][:, None]) / gspan[g][:, None] * nbins
    # each source bin spans [tgt_lo, tgt_hi); split its mass across the
    # covered integer target bins. With a 2x bin ratio bound the span
    # covers at most ~nbins positions; iterate over the bounded overlap
    # width (vectorized across all (window, bin) cells per step).
    mass = sk[:, 3:]
    width = np.maximum(tgt_hi - tgt_lo, 1e-12)
    first = np.floor(tgt_lo).astype(np.int64)
    last = np.ceil(tgt_hi).astype(np.int64) - 1
    max_cover = int(np.max(last - first, initial=0)) + 1
    rows = np.repeat(np.arange(k), nbins)
    gg = g[rows]
    f_flat = np.clip(first.ravel(), 0, nbins - 1)
    for step in range(max_cover):
        tb = f_flat + step
        in_range = tb < nbins
        seg_lo = np.maximum(tgt_lo.ravel(), tb)
        seg_hi = np.minimum(tgt_hi.ravel(), tb + 1)
        frac = np.clip(seg_hi - seg_lo, 0.0, None) / width.ravel()
        m = mass.ravel() * frac
        sel = in_range & (m > 0)
        np.add.at(out[:, 3:], (gg[sel], np.clip(tb[sel], 0, nbins - 1)), m[sel])
    return out


def sketch_quantile(sk: np.ndarray, q: float) -> np.ndarray:
    """Quantile estimate per sketch row via linear interpolation within
    the containing bin; |error| <= (max - min) / nbins."""
    nbins = sk.shape[1] - 3
    cnt = sk[:, 0]
    lo, hi = sk[:, 1], sk[:, 2]
    cum = np.cumsum(sk[:, 3:], axis=1)
    target = q * cnt
    idx = np.minimum(
        (cum < target[:, None]).sum(axis=1), nbins - 1
    )
    rows = np.arange(len(sk))
    prev = np.where(idx > 0, cum[rows, np.maximum(idx - 1, 0)], 0.0)
    inbin = np.maximum(sk[rows, 3 + idx], 1e-12)
    frac = np.clip((target - prev) / inbin, 0.0, 1.0)
    width = (hi - lo) / nbins
    est = lo + (idx + frac) * width
    return np.where(cnt > 0, est, np.nan)
