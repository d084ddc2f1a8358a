"""Optional (non-default) kernel features: agg_autocorrelation and PACF.
Scalar oracles: direct per-window transcriptions (ACF aggregate formula;
Durbin-Levinson recursion written scalar)."""

from __future__ import annotations

import numpy as np
import pytest

from time2feat_spark.operators.rollup import stats_ragged

RNG = np.random.default_rng(7)
OPTIONAL = [
    "agg_autocorr_mean_40",
    "agg_autocorr_median_40",
    "agg_autocorr_var_40",
    "pacf_lag1",
    "pacf_lag2",
    "pacf_lag3",
    "pacf_lag5",
]


def _acf(x: np.ndarray, maxlag: int) -> np.ndarray:
    n = len(x)
    m, v = x.mean(), x.var()
    out = np.full(maxlag, np.nan)
    for lag in range(1, maxlag + 1):
        if lag < n and v > 0:
            out[lag - 1] = np.sum((x[:-lag] - m) * (x[lag:] - m)) / ((n - lag) * v)
    return out


def _pacf_scalar(x: np.ndarray, maxlag: int) -> np.ndarray:
    r = _acf(x, maxlag)
    phi = {}
    pacf = np.full(maxlag + 1, np.nan)
    for m in range(1, maxlag + 1):
        if m == 1:
            phi[(1, 1)] = r[0]
        else:
            num = r[m - 1] - sum(phi[(m - 1, j)] * r[m - 1 - j] for j in range(1, m))
            den = 1.0 - sum(phi[(m - 1, j)] * r[j - 1] for j in range(1, m))
            phi[(m, m)] = num / den
            for j in range(1, m):
                phi[(m, j)] = phi[(m - 1, j)] - phi[(m, m)] * phi[(m - 1, m - j)]
        if m == 1:
            pass
        pacf[m] = phi[(m, m)]
    return pacf


WINDOWS = [
    RNG.standard_normal(17),
    RNG.standard_normal(60) * 50 + 10,
    np.sin(np.arange(200) * 0.3) + RNG.standard_normal(200) * 0.1,
    np.floor(RNG.uniform(0, 100, 64)),
    RNG.standard_normal(1000),
]


@pytest.mark.parametrize("idx", range(len(WINDOWS)))
def test_optional_features_vs_scalar(idx):
    x = WINDOWS[idx].astype(np.float64)
    st = stats_ragged(x, np.array([0]), np.array([len(x)]), OPTIONAL)
    maxlag = min(40, len(x) - 1)
    acf = _acf(x, maxlag)
    valid = acf[~np.isnan(acf)]
    assert st["agg_autocorr_mean_40"][0] == pytest.approx(valid.mean(), rel=1e-10)
    assert st["agg_autocorr_median_40"][0] == pytest.approx(
        np.median(valid), rel=1e-10
    )
    assert st["agg_autocorr_var_40"][0] == pytest.approx(valid.var(), rel=1e-10)
    pac = _pacf_scalar(x, 5)
    for lag in (1, 2, 3, 5):
        assert st[f"pacf_lag{lag}"][0] == pytest.approx(pac[lag], rel=1e-9), lag


def test_optional_features_batched():
    """Batch vs solo equality (same invariance contract as the core set)."""
    wins = [RNG.standard_normal(n) for n in (20, 60, 300)]
    flat = np.concatenate(wins)
    offs = np.cumsum([0] + [len(w) for w in wins])
    batched = stats_ragged(flat, offs[:-1], offs[1:], OPTIONAL)
    for i, wdw in enumerate(wins):
        solo = stats_ragged(wdw, np.array([0]), np.array([len(wdw)]), OPTIONAL)
        for nm in OPTIONAL:
            b, s = batched[nm][i], solo[nm][0]
            assert (np.isnan(b) and np.isnan(s)) or b == s, nm
