"""Predictive Power Score — the reference's vendored ppscore protocol
(reference deepchecks/ppscore.py:51-330) on the numpy CART.

Protocol preserved exactly: 5000-row sampling, seeded row shuffle,
4-fold CV (stratified for classification), weighted-F1 vs
max(most-common, random-shuffle) baseline normalization for
classification, MAE vs median baseline for regression, and the full
case-detection table (predict_itself / target_is_constant /
target_is_id / feature_is_id / empty_after_dropna). The tree itself is
our CART (no sklearn in this environment) — scores are deterministic
and reproduce the reference's semantics, not its exact float values
(documented deviation, SURVEY.md §7 hard parts (d)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deepchecks_spark.ml.metrics import f1_weighted, mean_absolute_error
from deepchecks_spark.ml.tree import DecisionTree


def _is_categorical(series: pd.Series) -> bool:
    return (
        pd.api.types.is_bool_dtype(series)
        or pd.api.types.is_object_dtype(series)
        or pd.api.types.is_string_dtype(series)
        or isinstance(series.dtype, pd.CategoricalDtype)
    )


def _encode_feature(series: pd.Series) -> np.ndarray:
    """Categorical feature → one-hot matrix; numeric → single column."""
    if _is_categorical(series):
        codes, uniques = pd.factorize(series, sort=True)
        onehot = np.zeros((len(series), len(uniques)))
        onehot[np.arange(len(series)), codes] = 1.0
        return onehot
    return np.asarray(series, dtype=float)[:, None]


def _stratified_folds(y: np.ndarray, k: int):
    """Contiguous-order stratified k-fold (rows were pre-shuffled with the
    seed, like the reference's shuffle-then-plain-CV)."""
    folds = np.zeros(len(y), dtype=int)
    for c in np.unique(y):
        idx = np.nonzero(y == c)[0]
        folds[idx] = np.arange(len(idx)) % k
    return folds


def _plain_folds(n: int, k: int):
    return (np.arange(n) * k // n)


def _cv_score(X, y, task: str, k: int) -> float:
    scores = []
    folds = _stratified_folds(y, k) if task == "classification" else _plain_folds(len(y), k)
    for f in range(k):
        tr, te = folds != f, folds == f
        if te.sum() == 0 or tr.sum() == 0:
            continue
        model = DecisionTree(task=task)
        model.fit(X[tr], y[tr])
        pred = model.predict(X[te])
        if task == "classification":
            scores.append(f1_weighted(y[te], pred))
        else:
            scores.append(-mean_absolute_error(y[te], pred))
    return float(np.mean(scores)) if scores else 0.0


def pps_score(df: pd.DataFrame, x: str, y: str, sample: int = 5_000,
              cross_validation: int = 4, random_seed: int = 123) -> dict:
    """PPS of feature x for target y. Returns the reference's result dict
    shape: {'x', 'y', 'ppscore', 'case', 'is_valid_score', 'model_score',
    'baseline_score'}."""
    if x == y:
        return _result(x, y, 1.0, "predict_itself", 1, 0)
    sub = df[[x, y]].dropna()
    if len(sub) == 0:
        return _result(x, y, 0.0, "empty_dataframe_after_dropping_na", 0, 0, valid=False)
    if sample and len(sub) > sample:
        sub = sub.sample(sample, random_state=random_seed, replace=False)
    # feature_is_id: categorical with all-distinct values (ppscore.py:288-295)
    if _is_categorical(sub[x]) and sub[x].nunique() == len(sub):
        return _result(x, y, 0.0, "feature_is_id", 0, 0)
    n_target_cats = sub[y].nunique()
    if n_target_cats == 1:
        return _result(x, y, 0.0, "target_is_constant", 1, 1)
    if _is_categorical(sub[y]) and n_target_cats == len(sub):
        return _result(x, y, 0.0, "target_is_id", 0, 0)
    if _is_categorical(sub[y]):
        task = "classification"
    elif pd.api.types.is_numeric_dtype(sub[y]):
        task = "regression"
    elif (pd.api.types.is_datetime64_any_dtype(sub[y])
          or pd.api.types.is_timedelta64_dtype(sub[y])):
        # reference ppscore.py:268-275: datetime targets are their own
        # invalid case (convert to string for a usable score)
        return _result(x, y, 0.0, "target_is_datetime", 0, 0, valid=False)
    else:
        return _result(x, y, 0.0, "target_data_type_not_supported", 0, 0, valid=False)

    # seeded shuffle, then contiguous CV (reference ppscore.py:66)
    sub = sub.sample(frac=1, random_state=random_seed, replace=False)
    X = _encode_feature(sub[x])
    if task == "classification":
        y_codes, _ = pd.factorize(sub[y], sort=True)
        model_score = _cv_score(X, y_codes, task, cross_validation)
        # baseline: max(most-common-class F1, seeded random-shuffle F1)
        most_common = np.bincount(y_codes).argmax()
        rng_perm = pd.Series(y_codes).sample(frac=1, random_state=random_seed).to_numpy()
        baseline = max(
            f1_weighted(y_codes, np.full(len(y_codes), most_common)),
            f1_weighted(y_codes, rng_perm),
        )
        pps = 0.0 if model_score < baseline else (model_score - baseline) / (1.0 - baseline)
        return _result(x, y, pps, "classification", model_score, baseline)
    y_vals = np.asarray(sub[y], dtype=float)
    model_score = abs(_cv_score(X, y_vals, task, cross_validation))
    baseline = mean_absolute_error(y_vals, np.full(len(y_vals), np.median(y_vals)))
    pps = 0.0 if (baseline == 0 or model_score > baseline) else 1 - model_score / baseline
    return _result(x, y, pps, "regression", model_score, baseline)


def _result(x, y, pps, case, model_score, baseline, valid=True):
    return {
        "x": x,
        "y": y,
        "ppscore": float(pps),
        "case": case,
        "is_valid_score": valid,
        "model_score": float(model_score),
        "baseline_score": float(baseline),
    }
