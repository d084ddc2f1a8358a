"""Clustering + external metrics — numpy reimplementations of the
reference's model layer (t2f/model/clustering.py: KMeans / Hierarchical
wrappers, NMI/AMI metrics). sklearn is not available in this environment
(SURVEY.md §7.0), so these follow the published algorithm definitions:
k-means++ (Arthur & Vassilvitskii 2007) with Lloyd iterations, average-
linkage agglomerative clustering, and NMI/AMI (Vinh, Epps & Bailey,
JMLR 2010) with the hypergeometric expected-MI formula.

The feature matrix after extraction+selection is tiny relative to the
input (one row per series), so clustering is deliberately driver-side
(SURVEY.md §4 O8) — distributing it would add shuffles for no benefit.
"""

from __future__ import annotations

import numpy as np


def kmeans(
    X: np.ndarray,
    k: int,
    seed: int = 42,
    n_init: int = 10,
    max_iter: int = 300,
    tol: float = 1e-6,
) -> tuple[np.ndarray, np.ndarray]:
    """k-means++ / Lloyd. Returns (centers (k,d), labels (n,))."""
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    k = min(k, n)
    rng = np.random.default_rng(seed)
    best = (None, None, np.inf)
    for _ in range(n_init):
        centers = _kmeanspp(X, k, rng)
        for _ in range(max_iter):
            d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            labels = d2.argmin(axis=1)
            new = np.vstack(
                [
                    X[labels == c].mean(axis=0) if (labels == c).any() else centers[c]
                    for c in range(k)
                ]
            )
            shift = np.linalg.norm(new - centers)
            centers = new
            if shift <= tol:
                break
        inertia = ((X - centers[labels]) ** 2).sum()
        if inertia < best[2]:
            best = (centers, labels, inertia)
    return best[0], best[1]


def _kmeanspp(X: np.ndarray, k: int, rng) -> np.ndarray:
    n = len(X)
    centers = [X[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            ((X[:, None, :] - np.asarray(centers)[None, :, :]) ** 2).sum(axis=2),
            axis=1,
        )
        tot = d2.sum()
        if tot == 0:
            centers.append(X[rng.integers(n)])
            continue
        probs = d2 / tot
        centers.append(X[rng.choice(n, p=probs)])
    return np.asarray(centers, dtype=np.float64)


def agglomerative(X: np.ndarray, k: int) -> np.ndarray:
    """Average-linkage agglomerative clustering (O(n^3) driver-side;
    feature matrices here are hundreds of rows)."""
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    d = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2))
    np.fill_diagonal(d, np.inf)
    clusters: dict[int, list[int]] = {i: [i] for i in range(n)}
    dist = d.copy()
    while len(clusters) > k:
        keys = list(clusters)
        sub = dist[np.ix_(keys, keys)]
        i_, j_ = np.unravel_index(np.argmin(sub), sub.shape)
        a, b = keys[i_], keys[j_]
        if a > b:
            a, b = b, a
        # average linkage update into a
        na, nb = len(clusters[a]), len(clusters[b])
        for other in keys:
            if other in (a, b):
                continue
            dist[a, other] = dist[other, a] = (
                na * dist[a, other] + nb * dist[b, other]
            ) / (na + nb)
        clusters[a].extend(clusters[b])
        del clusters[b]
        dist[b, :] = np.inf
        dist[:, b] = np.inf
    labels = np.empty(n, dtype=np.int64)
    for ci, members in enumerate(clusters.values()):
        labels[members] = ci
    return labels


def spectral(
    X: np.ndarray, k: int, gamma: float | None = None, seed: int = 42
) -> np.ndarray:
    """Spectral clustering (Ng-Jordan-Weiss 2002, the algorithm behind
    sklearn SpectralClustering's default RBF path): RBF affinity
    exp(-gamma*||xi-xj||^2) -> symmetric-normalized Laplacian -> k top
    eigenvectors of D^-1/2 A D^-1/2 -> row-normalize -> k-means.
    Reference parity: ClusterWrapper 'Spectral' mode
    (t2f/model/clustering.py:62). Driver-side by design (SURVEY.md §4 O8:
    post-selection matrices are one row per series)."""
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    k = min(k, n)
    if gamma is None:
        # 1/n_features: keeps RBF affinities informative on standardized
        # high-dimensional features (gamma=1 saturates them all to ~0)
        gamma = 1.0 / max(X.shape[1], 1)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    A = np.exp(-gamma * d2)
    np.fill_diagonal(A, 0.0)
    deg = A.sum(axis=1)
    with np.errstate(divide="ignore"):
        dinv = 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0))
    M = A * dinv[:, None] * dinv[None, :]
    vals, vecs = np.linalg.eigh(M)  # ascending; take the k largest
    emb = vecs[:, -k:]
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    emb = emb / norms
    _, labels = kmeans(emb, k, seed=seed)
    return labels


def _contingency(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    au, ai = np.unique(a, return_inverse=True)
    bu, bi = np.unique(b, return_inverse=True)
    m = np.zeros((len(au), len(bu)), dtype=np.int64)
    np.add.at(m, (ai, bi), 1)
    return m


def mutual_info(a: np.ndarray, b: np.ndarray) -> float:
    m = _contingency(a, b).astype(np.float64)
    n = m.sum()
    pij = m / n
    pi = pij.sum(axis=1, keepdims=True)
    pj = pij.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = pij * np.log(pij / (pi * pj))
    return float(np.nansum(t))


def _entropy(x: np.ndarray) -> float:
    _, counts = np.unique(x, return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log(p)).sum())


def nmi(a: np.ndarray, b: np.ndarray) -> float:
    """Normalized MI, arithmetic normalization (sklearn default)."""
    mi = mutual_info(a, b)
    ha, hb = _entropy(a), _entropy(b)
    denom = (ha + hb) / 2
    return mi / denom if denom > 0 else 1.0


def _expected_mi(m: np.ndarray) -> float:
    """Expected MI under the hypergeometric model (Vinh et al. 2010)."""
    from math import lgamma, exp, log

    n = int(m.sum())
    ai = m.sum(axis=1).astype(int)
    bj = m.sum(axis=0).astype(int)
    emi = 0.0
    lg = lgamma
    for i in range(len(ai)):
        for j in range(len(bj)):
            lo = max(1, ai[i] + bj[j] - n)
            hi = min(ai[i], bj[j])
            for nij in range(lo, hi + 1):
                term1 = nij / n * log(n * nij / (ai[i] * bj[j]))
                lp = (
                    lg(ai[i] + 1) + lg(bj[j] + 1)
                    + lg(n - ai[i] + 1) + lg(n - bj[j] + 1)
                    - lg(n + 1) - lg(nij + 1)
                    - lg(ai[i] - nij + 1) - lg(bj[j] - nij + 1)
                    - lg(n - ai[i] - bj[j] + nij + 1)
                )
                emi += term1 * exp(lp)
    return emi


def ami(a: np.ndarray, b: np.ndarray) -> float:
    """Adjusted MI, arithmetic-mean normalization (sklearn default)."""
    m = _contingency(a, b)
    mi = mutual_info(a, b)
    emi = _expected_mi(m)
    ha, hb = _entropy(a), _entropy(b)
    denom = (ha + hb) / 2 - emi
    if denom == 0:
        return 1.0
    return float((mi - emi) / denom)


class ClusterWrapper:
    """Mirror of t2f/model/clustering.py:33-70: NaN-column drop ->
    transform (std | minmax | robust | None, preprocessing.py:5-15) ->
    fit_predict."""

    def __init__(
        self,
        n_clusters: int,
        model_type: str = "KMeans",
        transform_type: str | None = "std",
        seed: int = 42,
    ):
        self.n_clusters = n_clusters
        self.model_type = model_type
        self.transform_type = transform_type
        self.seed = seed

    def _transform(self, X: np.ndarray) -> np.ndarray:
        t = self.transform_type
        if t is None:
            return X
        if t == "std":
            mu, sd = X.mean(axis=0), X.std(axis=0)
            sd[sd == 0] = 1.0
            return (X - mu) / sd
        if t == "minmax":
            lo, hi = X.min(axis=0), X.max(axis=0)
            span = np.where(hi - lo > 0, hi - lo, 1.0)
            return (X - lo) / span
        if t == "robust":
            med = np.median(X, axis=0)
            q1, q3 = np.percentile(X, [25, 75], axis=0)
            iqr = np.where(q3 - q1 > 0, q3 - q1, 1.0)
            return (X - med) / iqr
        raise ValueError(f"unknown transform_type {t!r}")

    def fit_predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        keep = ~np.isnan(X).any(axis=0)  # P6: drop any-NaN columns
        X = X[:, keep]
        Z = self._transform(X)
        if self.model_type == "Hierarchical":
            return agglomerative(Z, self.n_clusters)
        if self.model_type == "Spectral":
            return spectral(Z, self.n_clusters, seed=self.seed)
        _, labels = kmeans(Z, self.n_clusters, seed=self.seed)
        return labels
