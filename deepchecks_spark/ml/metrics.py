"""numpy metrics: weighted F1, MAE, ROC-AUC (tie-corrected)."""

from __future__ import annotations

import numpy as np


def f1_weighted(y_true, y_pred) -> float:
    """Per-class F1 averaged with true-class support weights
    (sklearn f1_score(average='weighted') semantics; absent-class F1=0)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    classes = np.unique(y_true)
    total = len(y_true)
    score = 0.0
    for c in classes:
        tp = np.sum((y_pred == c) & (y_true == c))
        fp = np.sum((y_pred == c) & (y_true != c))
        fn = np.sum((y_pred != c) & (y_true == c))
        denom = 2 * tp + fp + fn
        f1 = (2 * tp / denom) if denom else 0.0
        score += f1 * (np.sum(y_true == c) / total)
    return float(score)


def mean_absolute_error(y_true, y_pred) -> float:
    return float(np.mean(np.abs(np.asarray(y_true, float) - np.asarray(y_pred, float))))


def roc_auc(y_true, y_score) -> float:
    """Mann-Whitney AUC with average ranks (handles score ties)."""
    y_true = np.asarray(y_true).astype(bool)
    y_score = np.asarray(y_score, dtype=float)
    n_pos = int(y_true.sum())
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    order = np.argsort(y_score, kind="stable")
    ranks = np.empty(len(y_score), dtype=float)
    sorted_scores = y_score[order]
    i = 0
    rank = 1
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        avg = (rank + rank + (j - i)) / 2.0
        ranks[order[i:j + 1]] = avg
        rank += j - i + 1
        i = j + 1
    sum_pos = ranks[y_true].sum()
    return float((sum_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
