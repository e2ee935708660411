"""Gower distance + LoOP (Local Outlier Probability).

Reference behavior: deepchecks/utils/gower_distance.py:20-219 (mixed
numeric/categorical distance, numeric scaled by range, categorical 0/1
mismatch, averaged over features) and the vendored PyNomaly LoOP. LoOP
here is implemented directly from the published formulas (Kriegel,
Kröger, Schubert, Zimek: "LoOP: Local Outlier Probabilities", CIKM'09):

    σ(o)     = sqrt( Σ_{s∈kNN(o)} d(o,s)² / k )
    pdist(o) = λ·σ(o)
    PLOF(o)  = pdist(o) / E_{s∈kNN(o)}[pdist(s)] − 1
    nPLOF    = λ·sqrt(E[PLOF²])
    LoOP(o)  = max(0, erf(PLOF(o) / (nPLOF·√2)))

O(n²) on the ≤5000-row sample, exactly like the reference (it caps at
5k and catches MemoryError, outlier_sample_detection.py:118-120) — this
kernel is deliberately NOT distributed; the sample is.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def gower_matrix(df: pd.DataFrame, cat_features: list) -> np.ndarray:
    """Pairwise Gower distances; numeric dims scaled by range, categorical
    dims are 0/1 mismatch, mean over dims. Nulls: numeric nulls are
    median-filled, categorical nulls are their own category."""
    n = len(df)
    total = np.zeros((n, n))
    n_feats = 0
    for c in df.columns:
        col = df[c]
        if c in set(cat_features) or not pd.api.types.is_numeric_dtype(col):
            codes, _ = pd.factorize(col, use_na_sentinel=False)
            diff = (codes[:, None] != codes[None, :]).astype(float)
        else:
            vals = col.astype(float).fillna(col.astype(float).median()).to_numpy()
            rng = np.ptp(vals)
            if rng == 0:
                diff = np.zeros((n, n))
            else:
                diff = np.abs(vals[:, None] - vals[None, :]) / rng
        total += diff
        n_feats += 1
    return total / max(n_feats, 1)


def loop_scores(dist: np.ndarray, k: int, extent: float = 3.0) -> np.ndarray:
    """Local Outlier Probability per row of the distance matrix."""
    n = dist.shape[0]
    k = max(1, min(k, n - 1))
    # kNN indices (exclude self): argpartition on each row
    d = dist.copy()
    np.fill_diagonal(d, np.inf)
    knn_idx = np.argpartition(d, k - 1, axis=1)[:, :k]
    knn_d = np.take_along_axis(d, knn_idx, axis=1)
    sigma = np.sqrt(np.mean(knn_d**2, axis=1))
    pdist = extent * sigma
    mean_neighbor_pdist = pdist[knn_idx].mean(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        plof = np.where(mean_neighbor_pdist > 0, pdist / mean_neighbor_pdist - 1.0, 0.0)
    nplof = extent * np.sqrt(np.mean(plof**2))
    if nplof == 0:
        return np.zeros(n)
    erf_vec = np.vectorize(math.erf)
    return np.maximum(0.0, erf_vec(plof / (nplof * math.sqrt(2))))
