"""Vectorized kernels vs independent scalar oracle (tests/scalar_oracle.py).

Window shapes cover the hazards from SURVEY.md §7.5: tiny windows (n=1,2,3),
constant series (zero variance), negative/zero crossings, integer-valued
token data (binned-entropy edge collisions), and ragged pow2-bucket padding.
"""

from __future__ import annotations

import numpy as np
import pytest

from time2feat_spark.functions.kernels import ROLLUP_FEATURES
from time2feat_spark.operators.rollup import stats_ragged

from hypothesis import given, settings, strategies as st

from scalar_oracle import all_features

RNG = np.random.default_rng(42)

WINDOWS = [
    np.array([5.0]),
    np.array([1.0, 1.0]),
    np.array([3.0, 3.0, 3.0, 3.0]),  # constant
    np.array([1.0, -2.0, 3.0, -4.0, 5.0]),  # crossings
    np.array([0.0, 0.0, 1.0, 0.0, -1.0, 0.0]),  # zeros on the boundary
    RNG.standard_normal(17),
    RNG.standard_normal(60) * 100,
    np.floor(RNG.uniform(0, 50257, 64)),  # token-like integers
    np.floor(RNG.uniform(0, 10, 200)),  # heavy duplicates
    np.concatenate([np.arange(30.0), np.full(30, 7.0)]),  # trend + plateau
    RNG.standard_normal(2048),
]


def _vectorized(win: np.ndarray) -> dict[str, float]:
    flat = win.astype(np.float64)
    st = stats_ragged(flat, np.array([0]), np.array([len(flat)]), ROLLUP_FEATURES)
    return {k: float(v[0]) for k, v in st.items()}


@pytest.mark.parametrize("idx", range(len(WINDOWS)))
def test_against_scalar_oracle(idx):
    win = WINDOWS[idx]
    got = _vectorized(win)
    want = all_features(win, ROLLUP_FEATURES)
    for name, w in want.items():
        g = got[name]
        if np.isnan(w):
            assert np.isnan(g), f"{name}: got {g}, want NaN (win {idx})"
        else:
            assert g == pytest.approx(w, rel=1e-10, abs=1e-12), (
                f"{name}: got {g!r}, want {w!r} (win {idx})"
            )


def test_batch_equals_single():
    """A window's stats must not depend on which batch it is computed in
    (pow2-bucket padding => fixed reduction tree)."""
    wins = [RNG.standard_normal(n) for n in (3, 60, 61, 100, 1000, 2048)]
    flat = np.concatenate(wins)
    offs = np.cumsum([0] + [len(w) for w in wins])
    batched = stats_ragged(flat, offs[:-1], offs[1:], ROLLUP_FEATURES)
    for i, w in enumerate(wins):
        solo = stats_ragged(
            w, np.array([0]), np.array([len(w)]), ROLLUP_FEATURES
        )
        for name in batched:
            b, s = batched[name][i], solo[name][0]
            assert (np.isnan(b) and np.isnan(s)) or b == s, (
                f"{name} differs batched vs solo for window {i}: {b} != {s}"
            )


def test_shuffled_batch_order_invariance():
    """Reordering windows within a batch must not change any value."""
    wins = [RNG.standard_normal(n) for n in (10, 33, 512, 7, 90)]
    flat = np.concatenate(wins)
    offs = np.cumsum([0] + [len(w) for w in wins])
    a = stats_ragged(flat, offs[:-1], offs[1:], ROLLUP_FEATURES)
    perm = np.array([3, 0, 4, 2, 1])
    b = stats_ragged(flat, offs[:-1][perm], offs[1:][perm], ROLLUP_FEATURES)
    for name in a:
        x, y = a[name][perm], b[name]
        both_nan = np.isnan(x) & np.isnan(y)
        assert np.all(both_nan | (x == y)), name


EXOTIC = [
    "q33", "q07", "autocorr_lag7", "autocorr_lag12", "c3_lag2",
    "time_reversal_asymmetry_lag3", "number_peaks_5",
    "ratio_beyond_r0_5_sigma", "ratio_beyond_r2_sigma", "binned_entropy_5",
    "index_mass_quantile_25", "value_count_7",
    "large_standard_deviation_r05", "symmetry_looking_r10",
    "change_q_0_6_1_var", "change_q_2_6_0_median", "fft_coeff_abs_7",
    # round-2 registry additions (VERDICT r01 missing item 3)
    "fft_coeff_real_4", "fft_coeff_imag_4", "fft_coeff_angle_4",
    "number_crossing_m1", "number_crossing_p2", "range_count_m1_p1",
    "count_above_t0", "count_below_tm1", "mean_n_absolute_max_3",
    "spkt_welch_coeff_2", "fourier_entropy_10",
]


@pytest.mark.parametrize("idx", [5, 6, 8, 10])
def test_parametric_feature_names(idx):
    """Any grid cell of the tsfresh parameter space is requestable by
    name (selective re-extraction, SURVEY.md §3.3) — not just the default
    subset."""
    win = WINDOWS[idx]
    got = _vectorized_features(win, EXOTIC)
    want = all_features(win, EXOTIC)
    for name in EXOTIC:
        g, w = got[name], want[name]
        if np.isnan(w):
            assert np.isnan(g), name
        else:
            assert g == pytest.approx(w, rel=1e-10, abs=1e-12), (
                f"{name}: {g} != {w}"
            )


def _vectorized_features(win, feats):
    flat = win.astype(np.float64)
    st = stats_ragged(flat, np.array([0]), np.array([len(flat)]), feats)
    return {k: float(v[0]) for k, v in st.items()}


# ---- round-3: the full change_quantiles family, property-based --------

_CQ_ALL = [
    f"change_q_{int(ql*10)}_{int(qh*10)}_{int(b)}_{agg}"
    for ql in (0.0, 0.2, 0.4, 0.6, 0.8)
    for qh in (0.2, 0.4, 0.6, 0.8, 1.0)
    for b in (False, True)
    for agg in ("mean", "var")
    if ql < qh
] + [
    f"change_q_0_10_{int(b)}_{agg}"
    for b in (False, True)
    for agg in ("std", "median")
]


@given(
    st.lists(
        st.floats(-1e3, 1e3, allow_nan=False, width=32),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=40, deadline=None)
def test_change_quantiles_full_grid_property(vals):
    """All 64 registry cells (60 settings-grid + 4 bridge) against the
    independent scalar oracle on arbitrary float windows."""
    win = np.asarray(vals, dtype=np.float64)
    got = _vectorized_features(win, _CQ_ALL)
    want = all_features(win, _CQ_ALL)
    for name in _CQ_ALL:
        g, w = got[name], want[name]
        if np.isnan(w):
            assert np.isnan(g), name
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (
                f"{name}: {g} != {w}"
            )


def test_stats_ragged_blocking_bit_identical():
    """r6 cache-blocking: stats_ragged splits each pow2 bucket's windows
    into ~2 MB row blocks. Per-window reductions are row-local, so the
    output must be bit-for-bit identical to an unblocked pass (forced
    via a huge block budget), including ragged tail windows."""
    import numpy as np

    from time2feat_spark.functions.kernels import ROLLUP_FEATURES
    from time2feat_spark.operators import rollup as R

    rng = np.random.default_rng(7)
    n_docs, n_tok, tt = 300, 1056, 60
    flat = rng.normal(10, 3, n_docs * n_tok)
    # sprinkle NaN VALUES so blocks mix the fast and nan-aware paths
    flat[rng.integers(0, len(flat), 500)] = np.nan
    nw = (n_tok + tt - 1) // tt
    starts = np.concatenate(
        [d * n_tok + np.arange(nw) * tt for d in range(n_docs)]
    )
    ends = np.minimum(
        starts + tt, np.repeat(np.arange(1, n_docs + 1) * n_tok, nw)
    )
    feats = list(ROLLUP_FEATURES)
    blocked = R.stats_ragged(flat, starts, ends, feats)
    orig_budget = R._STATS_BLOCK_BYTES
    try:
        R._STATS_BLOCK_BYTES = 1 << 40  # one block == the old behavior
        unblocked = R.stats_ragged(flat, starts, ends, feats)
    finally:
        R._STATS_BLOCK_BYTES = orig_budget
    assert set(blocked) == set(unblocked)
    for nm in blocked:
        assert np.array_equal(blocked[nm], unblocked[nm], equal_nan=True), nm
