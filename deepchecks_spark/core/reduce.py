"""Result-aggregation for monitoring pipelines
(reference deepchecks/core/reduce_classes.py:90-127).

``reduce_output`` collapses a per-feature score dict into headline
monitoring numbers with the reference's aggregation methods:
none | mean | max | weighted | l3_weighted | l5_weighted, where the
weighted variants use feature importance (L^k-weighted: importance^k
normalized).
"""

from __future__ import annotations

import numpy as np

AGGREGATION_METHODS = ("none", "mean", "max", "weighted", "l3_weighted", "l5_weighted")


def reduce_output(scores: dict, feature_importance: dict | None = None,
                  aggregation_method: str = "mean") -> dict:
    """Aggregate {feature: score} → monitoring dict.

    none → the scores unchanged; mean/max → single entry; weighted →
    importance-weighted mean; l3/l5_weighted → weights ∝ importance^k
    (reference reduce_classes.py:100-127). Features with None scores are
    dropped. Missing importance falls back to uniform weights.
    """
    if aggregation_method not in AGGREGATION_METHODS:
        raise ValueError(f"unknown aggregation method {aggregation_method!r}")
    clean = {k: v for k, v in scores.items() if v is not None}
    if aggregation_method == "none":
        return dict(clean)
    if not clean:
        return {}
    values = np.array(list(clean.values()), dtype=float)
    if aggregation_method == "mean":
        return {"Mean": float(values.mean())}
    if aggregation_method == "max":
        return {"Max": float(values.max())}
    keys = list(clean.keys())
    if feature_importance is None:
        weights = np.ones(len(keys))
    else:
        weights = np.array([feature_importance.get(k, 0.0) or 0.0 for k in keys], dtype=float)
        if weights.sum() == 0:
            weights = np.ones(len(keys))
    power = {"weighted": 1, "l3_weighted": 3, "l5_weighted": 5}[aggregation_method]
    w = weights**power
    w = w / w.sum()
    name = {"weighted": "Weighted", "l3_weighted": "L3 Weighted", "l5_weighted": "L5 Weighted"}[
        aggregation_method
    ]
    return {name: float(np.sum(values * w))}
