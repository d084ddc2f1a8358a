"""Supervised selection: top-k grid search with an NMI objective —
reference parity for t2f/selection/search.py:11-49 and the strategy
registry of t2f/utils/importance_old.py:60-107.

Shape (SURVEY.md §4 O7): the feature matrix is cached once; the grid loop
runs driver-side, each iteration ranking on the labeled rows only
(ANOVA-F top-k, P7 semi-join semantics) and clustering ALL rows, scoring
NMI against the provided labels; the winner is the argmax of the
grid-mean (T3: sort desc, take first).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from .clustering import ClusterWrapper, nmi
from .selection import anova_f_scores, anova_p_values, clean_features, pfa

DEFAULT_GRID = [2, 4, 8, 16, 25, 50, 100]


def rank_features(
    df: DataFrame,
    cols: list[str],
    label_col: str,
    top_k: int,
    mode: str = "anova",
) -> list[str]:
    """Strategy registry (importance_old.py:60-107 semantics):
    'anova' = sk_base (F-score desc); 'pvalue' = sk_pvalue (T2: p-value
    asc, importance_old.py:62-72 — same order as F desc except where the
    F sf saturates, where F desc breaks the tie); 'domain' = per-family
    top-k then merge (the reference splits the tsfresh name on '__';
    here feature families are the prefix before the first '_')."""
    if mode == "anova":
        scores = anova_f_scores(df, cols, label_col)
        return sorted(cols, key=lambda c: (-scores[c], c))[:top_k]
    if mode == "pvalue":
        fp = anova_p_values(df, cols, label_col)
        return sorted(cols, key=lambda c: (fp[c][1], -fp[c][0], c))[:top_k]
    if mode in ("tsfresh", "multi"):
        # Mann-Whitney relevance p-values (importance_old 'tsfresh' uses
        # the binary table, 'multi' the per-class mean)
        from .selection import relevance_p_values

        ps = relevance_p_values(
            df, cols, label_col, multiclass=(mode == "multi")
        )
        ranked = sorted(cols, key=lambda c: (ps[c], c))
        return ranked[:top_k]
    if mode == "none":
        # variance-threshold only (importance_old 'none' strategy)
        from .selection import clean_features as _cf

        return _cf(df, cols)[:top_k]
    if mode == "domain":
        scores = anova_f_scores(df, cols, label_col)
        fams: dict[str, list[str]] = {}
        for c in cols:
            fams.setdefault(c.split("_")[1 if c.startswith("feat_") else 0], []).append(c)
        per_fam = max(1, top_k // max(len(fams), 1))
        out: list[str] = []
        for fam in sorted(fams):
            ranked = sorted(fams[fam], key=lambda c: (-scores[c], c))
            out.extend(ranked[:per_fam])
        return out[:top_k]
    raise ValueError(f"unknown ranking mode {mode!r}")


def simple_grid_search(
    feature_df: DataFrame,
    cols: list[str],
    labels: dict[str, str],
    id_col: str = "doc_id",
    n_clusters: int | None = None,
    grid: list[int] | None = None,
    mode: str = "anova",
    seed: int = 42,
    max_driver_rows: int | None = None,
) -> tuple[int, list[str], float]:
    """Returns (best_top_k, selected_features, best_nmi).

    labels: partial supervision {id -> class} (reference labels dict,
    demo.py:34-38). Ranking uses only labeled rows (semi-join); clustering
    and scoring run over all rows / labeled rows respectively
    (search.py:26-36 semantics)."""
    spark = feature_df.sparkSession
    grid = grid or DEFAULT_GRID
    n_clusters = n_clusters or len(set(labels.values()))

    labels_df = F.broadcast(
        spark.createDataFrame(
            [(k, v) for k, v in labels.items()], f"{id_col} string, _label string"
        )
    )
    from .selection import _qc

    cached = feature_df.select(
        F.col(id_col), *[_qc(c) for c in cols]
    ).cache()
    train = cached.join(labels_df, id_col)  # broadcast hash join (J3)

    from .selection import MAX_DRIVER_ROWS, ensure_driver_bound

    ensure_driver_bound(
        cached,
        MAX_DRIVER_ROWS if max_driver_rows is None else max_driver_rows,
        "simple_grid_search",
    )
    pdf = cached.toPandas().set_index(id_col)
    lab_ids = [i for i in pdf.index if i in labels]
    y_true = np.array([labels[i] for i in lab_ids])

    results = []
    for k in grid:
        if k > len(cols):
            continue
        top = rank_features(train, cols, "_label", k, mode)
        X = pdf[top].to_numpy()
        pred = ClusterWrapper(n_clusters, seed=seed).fit_predict(X)
        pred_lab = pred[[pdf.index.get_loc(i) for i in lab_ids]]
        results.append((k, top, nmi(y_true, pred_lab)))
    cached.unpersist()
    # T3: argmax of score, deterministic tie-break by smaller k
    best = max(results, key=lambda r: (r[2], -r[0]))
    return best[0], best[1], best[2]
