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
                  aggregation_method: str = "mean", score_name: str = "") -> dict:
    """Aggregate {feature: score} → monitoring dict, with the reference's
    EXACT formulas and key names (reference reduce_classes.py:100-127):

    none → the scores unchanged; mean/max → {'Mean <name>': …} /
    {'Max <name>': …}; weighted → Σ v·importance (importances are the
    model's, assumed to sum to 1 — NOT re-normalized); l3/l5_weighted →
    the importance-weighted POWER mean (Σ v^k · importance)^(1/k).
    Features with None scores are dropped. Missing/partial importance
    falls back to the uniform mean under the method's own key, like the
    reference.
    """
    if aggregation_method not in AGGREGATION_METHODS:
        raise ValueError(f"unknown aggregation method {aggregation_method!r}")
    clean = {k: v for k, v in scores.items() if v is not None}

    def named(prefix: str) -> str:
        return f"{prefix} {score_name}".strip()

    if aggregation_method == "none":
        return dict(clean)
    if not clean:
        return {}
    values = np.array(list(clean.values()), dtype=float)
    if aggregation_method == "mean":
        return {named("Mean"): float(values.mean())}
    if aggregation_method == "max":
        return {named("Max"): float(values.max())}
    keys = list(clean.keys())
    title = aggregation_method.replace("_", " ").title()  # 'Weighted' / 'L3 Weighted'
    fi_missing = feature_importance is None or any(
        feature_importance.get(k) is None for k in keys)
    if fi_missing:
        # reference reduce_classes.py:113-115: uniform mean fallback
        return {named(title): float(values.mean())}
    fi = np.array([float(feature_importance[k]) for k in keys], dtype=float)
    if aggregation_method == "weighted":
        return {named("Weighted"): float(np.sum(values * fi))}
    power = 3 if aggregation_method == "l3_weighted" else 5
    return {named(title): float(np.sum((values ** power) * fi) ** (1.0 / power))}
