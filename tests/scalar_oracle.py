"""Independent per-window scalar oracle for the kernel tests.

Direct transcriptions of the published tsfresh 0.20 calculator formulas
(the semantics the reference invokes at
/root/reference/t2f/extraction/extractor_single.py:26-32) plus pandas'
skew/kurt estimators. Deliberately written scalar, one window at a time,
with a *different* code shape than time2feat_spark.functions.kernels — a
genuinely independent cross-check of the vectorized implementations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def mean(x):
    return float(np.mean(x))


def variance(x):
    return float(np.var(x))


def std(x):
    return float(np.std(x))


def median(x):
    return float(np.median(x))


def quantile(x, q):
    return float(np.quantile(x, q))


def abs_energy(x):
    return float(np.dot(x, x))


def root_mean_square(x):
    return float(np.sqrt(np.mean(np.square(x))))


def absolute_maximum(x):
    return float(np.max(np.abs(x)))


def variation_coefficient(x):
    m = np.mean(x)
    if m != 0:
        return float(np.std(x) / m)
    # mean == 0: the kernel's IEEE result, written explicitly instead of
    # dividing by zero (which is what this branch used to do, emitting
    # the suite's one RuntimeWarning): 0/0 -> NaN, std/±0 -> ±inf
    s = float(np.std(x))
    if s == 0.0:
        return float("nan")
    return float(np.copysign(np.inf, float(m)))


def skewness(x):
    return float(pd.Series(x).skew())


def kurtosis(x):
    return float(pd.Series(x).kurtosis())


def mean_abs_change(x):
    return float(np.mean(np.abs(np.diff(x)))) if len(x) > 1 else np.nan


def mean_change(x):
    return float((x[-1] - x[0]) / (len(x) - 1)) if len(x) > 1 else np.nan


def mean_second_derivative_central(x):
    n = len(x)
    return (
        float((x[-1] - x[-2] - x[1] + x[0]) / (2 * (n - 2))) if n > 2 else np.nan
    )


def absolute_sum_of_changes(x):
    return float(np.sum(np.abs(np.diff(x))))


def cid_ce(x, normalize):
    x = np.asarray(x, dtype=np.float64)
    if normalize:
        s = np.std(x)
        if s == 0:
            return 0.0
        x = (x - np.mean(x)) / s
    d = np.diff(x)
    return float(np.sqrt(np.dot(d, d)))


def autocorrelation(x, lag):
    n = len(x)
    if n <= lag:
        return np.nan
    v = np.var(x)
    if v == 0:
        return np.nan
    m = np.mean(x)
    return float(np.sum((x[: n - lag] - m) * (x[lag:] - m)) / ((n - lag) * v))


def c3(x, lag):
    n = len(x)
    if n <= 2 * lag:
        return np.nan
    return float(np.mean(x[2 * lag:] * x[lag: n - lag] * x[: n - 2 * lag]))


def time_reversal_asymmetry_statistic(x, lag):
    n = len(x)
    if n <= 2 * lag:
        return 0.0
    a = x[2 * lag:]
    b = x[lag: n - lag]
    c = x[: n - 2 * lag]
    return float(np.mean(a * a * b - b * c * c))


def count_above_mean(x):
    return float(np.sum(x > np.mean(x)))


def count_below_mean(x):
    return float(np.sum(x < np.mean(x)))


def _longest_run(b):
    best = cur = 0
    for v in b:
        cur = cur + 1 if v else 0
        best = max(best, cur)
    return float(best)


def longest_strike_above_mean(x):
    return _longest_run(x > np.mean(x))


def longest_strike_below_mean(x):
    return _longest_run(x < np.mean(x))


def number_crossing_m(x, m):
    positive = x > m
    return float(np.where(np.diff(positive))[0].size)


def number_peaks(x, n):
    x = np.asarray(x)
    x_reduced = x[n:-n]
    res = None
    for i in range(1, n + 1):
        result_first = x_reduced > np.roll(x, i)[n:-n]
        if res is None:
            res = result_first
        else:
            res &= result_first
        res &= x_reduced > np.roll(x, -i)[n:-n]
    return float(np.sum(res)) if res is not None else 0.0


def ratio_beyond_r_sigma(x, r):
    return float(np.sum(np.abs(x - np.mean(x)) > r * np.std(x)) / len(x))


def first_location_of_maximum(x):
    return float(np.argmax(x) / len(x))


def last_location_of_maximum(x):
    return float(1.0 - np.argmax(x[::-1]) / len(x))


def first_location_of_minimum(x):
    return float(np.argmin(x) / len(x))


def last_location_of_minimum(x):
    return float(1.0 - np.argmin(x[::-1]) / len(x))


def _linregress(x):
    t = np.arange(len(x), dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    slope, intercept = np.polyfit(t, x, 1)
    tc, xc = t - t.mean(), x - x.mean()
    denom = np.sqrt((tc**2).sum() * (xc**2).sum())
    r = float((tc * xc).sum() / denom) if denom > 0 else 0.0
    n = len(x)
    ss_res = float(((x - (slope * t + intercept)) ** 2).sum())
    se = np.sqrt(ss_res / max(n - 2, 1) / (tc**2).sum()) if n > 2 else np.nan
    return float(slope), float(intercept), r, float(se)


def linear_trend_slope(x):
    if len(x) < 2:
        return np.nan
    return _linregress(x)[0]


def linear_trend_intercept(x):
    if len(x) < 2:
        return np.nan
    return _linregress(x)[1]


def linear_trend_rvalue(x):
    if len(x) < 2:
        return np.nan
    return _linregress(x)[2]


def linear_trend_stderr(x):
    if len(x) < 3:
        return np.nan
    return _linregress(x)[3]


def energy_ratio_by_chunks(x, num_segments, segment_focus):
    full = np.sum(np.square(x))
    if full == 0:
        return np.nan
    chunk = np.array_split(x, num_segments)[segment_focus]
    return float(np.sum(np.square(chunk)) / full)


def binned_entropy(x, max_bins):
    hist, _ = np.histogram(x, bins=max_bins)
    probs = hist / len(x)
    probs = probs[probs > 0]
    return float(-np.sum(probs * np.log(probs)))


def change_quantiles(x, ql, qh, isabs, f_agg):
    """tsfresh semantics: aggregate diffs with both endpoints inside the
    [quantile(ql), quantile(qh)] corridor; 0 when degenerate/empty."""
    x = np.asarray(x, dtype=np.float64)
    if ql >= qh:
        return 0.0
    div = np.diff(x)
    if isabs:
        div = np.abs(div)
    lo, hi = np.quantile(x, ql), np.quantile(x, qh)
    if lo == hi:
        return 0.0
    inside = (x >= lo) & (x <= hi)
    ind = inside[1:] & inside[:-1]
    if not ind.any():
        return 0.0
    agg = getattr(np, f_agg)
    return float(agg(div[ind]))


def has_duplicate(x):
    return float(len(np.unique(x)) != len(x))


def has_duplicate_max(x):
    return float(np.sum(x == np.max(x)) >= 2)


def has_duplicate_min(x):
    return float(np.sum(x == np.min(x)) >= 2)


def ratio_value_number_to_time_series_length(x):
    return float(len(np.unique(x)) / len(x))


def sum_of_reoccurring_values(x):
    u, c = np.unique(x, return_counts=True)
    return float(np.sum(u[c > 1]))


def sum_of_reoccurring_data_points(x):
    u, c = np.unique(x, return_counts=True)
    return float(np.sum(u[c > 1] * c[c > 1]))


def percentage_of_reoccurring_values_to_all_values(x):
    _, c = np.unique(x, return_counts=True)
    return float(np.sum(c > 1) / len(c))


def percentage_of_reoccurring_datapoints_to_all_datapoints(x):
    _, c = np.unique(x, return_counts=True)
    return float(np.sum(c[c > 1]) / len(x))


def index_mass_quantile(x, q):
    absx = np.abs(x)
    mc = np.cumsum(absx) / np.sum(absx)
    return float((np.argmax(mc >= q) + 1) / len(x))


def large_standard_deviation(x, r):
    return float(np.std(x) > r * (np.max(x) - np.min(x)))


def symmetry_looking(x, r):
    return float(abs(np.mean(x) - np.median(x)) < r * (np.max(x) - np.min(x)))


def fft_coefficient_abs(x, k):
    spec = np.fft.rfft(x)
    return float(np.abs(spec[k])) if k < len(spec) else np.nan


def fft_aggregated(x, which):
    l = np.abs(np.fft.rfft(x))
    idx = np.arange(len(l), dtype=np.float64)
    tot = l.sum()
    mu = (l * idx).sum() / tot
    if which == "centroid":
        return float(mu)
    return float((l * (idx - mu) ** 2).sum() / tot)


def all_features(x, feature_names):
    """Evaluate the named rollup features for one window."""
    x = np.asarray(x, dtype=np.float64)
    out = {
        "count": float(len(x)),
        "sum": float(np.sum(x)),
        "min": float(np.min(x)),
        "max": float(np.max(x)),
        "mean": mean(x),
    }
    for nm in feature_names:
        if nm.startswith("q") and nm[1:].isdigit():
            out[nm] = quantile(x, int(nm[1:]) / 100)
        elif nm.startswith("autocorr_lag"):
            out[nm] = autocorrelation(x, int(nm.removeprefix("autocorr_lag")))
        elif nm.startswith("energy_ratio_chunk"):
            out[nm] = energy_ratio_by_chunks(
                x, 10, int(nm.removeprefix("energy_ratio_chunk"))
            )
        elif nm.startswith("change_q_"):
            parts = nm.split("_")  # change_q_{ql}_{qh}_{abs}_{agg}
            ql, qh, isabs, agg = (
                int(parts[2]) / 10,
                int(parts[3]) / 10,
                bool(int(parts[4])),
                parts[5],
            )
            out[nm] = change_quantiles(x, ql, qh, isabs, agg)
        elif nm == "cid_ce":
            out[nm] = cid_ce(x, False)
        elif nm == "cid_ce_norm":
            out[nm] = cid_ce(x, True)
        elif nm == "number_crossing_0":
            out[nm] = number_crossing_m(x, 0)
        elif nm.startswith("number_peaks_"):
            out[nm] = number_peaks(x, int(nm.removeprefix("number_peaks_")))
        elif nm.startswith("ratio_beyond_"):
            spec = nm.removeprefix("ratio_beyond_").removesuffix("_sigma")
            spec = spec.removeprefix("r").replace("_", ".")
            out[nm] = ratio_beyond_r_sigma(x, float(spec))
        elif nm.startswith("binned_entropy_"):
            out[nm] = binned_entropy(x, int(nm.removeprefix("binned_entropy_")))
        elif nm.startswith("c3_lag"):
            out[nm] = c3(x, int(nm.removeprefix("c3_lag")))
        elif nm.startswith("time_reversal_asymmetry_lag"):
            out[nm] = time_reversal_asymmetry_statistic(
                x, int(nm.removeprefix("time_reversal_asymmetry_lag"))
            )
        elif nm.startswith("value_count_"):
            out[nm] = float(np.sum(x == float(nm.removeprefix("value_count_"))))
        elif nm.startswith("index_mass_quantile_"):
            out[nm] = index_mass_quantile(
                x, int(nm.removeprefix("index_mass_quantile_")) / 100
            )
        elif nm.startswith("large_standard_deviation_r"):
            out[nm] = large_standard_deviation(
                x, int(nm.removeprefix("large_standard_deviation_r")) / 100
            )
        elif nm.startswith("symmetry_looking_r"):
            out[nm] = symmetry_looking(
                x, int(nm.removeprefix("symmetry_looking_r")) / 100
            )
        elif nm.startswith("fft_coeff_"):
            attr, k_ = nm.removeprefix("fft_coeff_").rsplit("_", 1)
            out[nm] = fft_coefficient(x, attr, int(k_))
        elif nm == "fft_centroid":
            out[nm] = fft_aggregated(x, "centroid")
        elif nm == "fft_variance":
            out[nm] = fft_aggregated(x, "variance")
        elif nm.startswith("number_crossing_"):
            out[nm] = number_crossing_m(x, _signed(nm.removeprefix("number_crossing_")))
        elif nm.startswith("range_count_"):
            lo_s, hi_s = nm.removeprefix("range_count_").split("_")
            out[nm] = float(np.sum((x >= _signed(lo_s)) & (x < _signed(hi_s))))
        elif nm.startswith("count_above_t"):
            out[nm] = float(np.mean(x >= _signed(nm.removeprefix("count_above_t"))))
        elif nm.startswith("count_below_t"):
            out[nm] = float(np.mean(x <= _signed(nm.removeprefix("count_below_t"))))
        elif nm.startswith("mean_n_absolute_max_"):
            nmax = int(nm.removeprefix("mean_n_absolute_max_"))
            out[nm] = (
                float(np.mean(np.sort(np.abs(x))[-nmax:]))
                if len(x) >= nmax
                else np.nan
            )
        elif nm.startswith("spkt_welch_coeff_"):
            pxx = welch_psd(x)
            c = int(nm.removeprefix("spkt_welch_coeff_"))
            out[nm] = float(pxx[c]) if c < len(pxx) else np.nan
        elif nm.startswith("fourier_entropy_"):
            pxx = welch_psd(x)
            out[nm] = binned_entropy(
                pxx / pxx.max() if pxx.max() > 0 else pxx,
                int(nm.removeprefix("fourier_entropy_")),
            )
        else:
            out[nm] = globals()[nm](x)
    return out


def _signed(s: str) -> float:
    """'m2' -> -2, 'p3' -> 3, '0' -> 0 (kernel name grammar)."""
    if s.startswith("m"):
        return -float(s[1:])
    return float(s.removeprefix("p"))


def fft_coefficient(x, attr, k):
    spec = np.fft.rfft(x)
    if k >= len(spec):
        return np.nan
    if attr == "abs":
        return float(np.abs(spec[k]))
    if attr == "real":
        return float(spec[k].real)
    if attr == "imag":
        return float(spec[k].imag)
    return float(np.angle(spec[k], deg=True))


def welch_psd(x):
    """Independent scalar Welch (explicit segment loop): scipy defaults
    fs=1, periodic hann, nperseg=min(256, n), 50% overlap, constant
    detrend, density scaling, mean average."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    nper = min(256, n)
    step = nper - nper // 2
    if nper > 1:
        w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(nper) / nper)
    else:
        w = np.ones(1)  # scipy hann(1) == [1]
    psds = []
    s = 0
    while s + nper <= n:
        seg = x[s : s + nper]
        seg = seg - seg.mean()
        spec = np.fft.rfft(seg * w)
        p = (np.abs(spec) ** 2) / (w * w).sum()
        p[1:] *= 2.0
        if nper % 2 == 0:
            p[-1] /= 2.0
        psds.append(p)
        s += step
        if step == 0:
            break
    if not psds:
        seg = x - x.mean()
        spec = np.fft.rfft(seg * w[: len(seg)])
        p = (np.abs(spec) ** 2) / (w[: len(seg)] ** 2).sum()
        p[1:] *= 2.0
        psds = [p]
    return np.mean(psds, axis=0)
