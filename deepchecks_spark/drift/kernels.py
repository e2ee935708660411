"""Drift statistical kernels — pure numpy over *compressed* histograms.

Reference semantics (deepchecks/utils/distribution/drift.py:34-370 and
preprocessing.py:117-199) reproduced exactly, but the inputs are
(value → count) histograms produced by Spark aggregations instead of
raw arrays: at 10^12 rows the raw data never leaves the executors —
only the mergeable histogram/sketch state does (tree-aggregated by
Catalyst's partial+final hash aggregation), and these formulas run on
the tiny collected state driver-side, exactly like the reference runs
on the full pandas column.

All functions are exact w.r.t. the reference when given the exact
distinct-value histogram (what the tests use); the sketch path feeds
the same functions 1001 equal-weight quantile samples.
"""

from __future__ import annotations

import numpy as np

PSI_MIN_PERCENTAGE = 0.01  # reference drift.py:34
OTHER_CATEGORY_NAME = "Other rare categories"  # reference preprocessing.py OTHER_CATEGORY_NAME


# ---------------------------------------------------------------------------
# weighted helpers (numpy semantics on (value, count) pairs)
# ---------------------------------------------------------------------------

def weighted_quantile_linear(values: np.ndarray, counts: np.ndarray, q) -> np.ndarray:
    """np.quantile(raw, q) ('linear' interpolation) computed from the
    compressed sorted histogram without expanding the raw array."""
    q = np.atleast_1d(np.asarray(q, dtype=float))
    cum = np.cumsum(counts)
    n = cum[-1]
    pos = q * (n - 1)  # fractional index into the sorted raw array
    lo_idx = np.floor(pos).astype(np.int64)
    hi_idx = np.minimum(lo_idx + 1, n - 1)
    frac = pos - lo_idx
    v_lo = values[np.searchsorted(cum, lo_idx + 1)]
    v_hi = values[np.searchsorted(cum, hi_idx + 1)]
    return v_lo + frac * (v_hi - v_lo)


def _merge_sorted(v1, c1, v2, c2):
    support = np.union1d(v1, v2)
    cdf1 = np.zeros(len(support))
    cdf2 = np.zeros(len(support))
    n1, n2 = c1.sum(), c2.sum()
    cum1 = np.cumsum(c1) / n1
    cum2 = np.cumsum(c2) / n2
    idx1 = np.searchsorted(v1, support, side="right") - 1
    idx2 = np.searchsorted(v2, support, side="right") - 1
    cdf1 = np.where(idx1 >= 0, cum1[np.maximum(idx1, 0)], 0.0)
    cdf2 = np.where(idx2 >= 0, cum2[np.maximum(idx2, 0)], 0.0)
    return support, cdf1, cdf2


def ks_from_hist(v1, c1, v2, c2) -> float:
    """Two-sample KS statistic (reference drift.py:244-319): the sup of
    |ECDF1 − ECDF2| is attained at a support point, so evaluating the
    right-continuous CDFs at the merged support is exact."""
    v1, c1 = _sorted_hist(v1, c1)
    v2, c2 = _sorted_hist(v2, c2)
    if len(v1) == 0 or len(v2) == 0:
        raise ValueError("Data must not be empty")
    _, cdf1, cdf2 = _merge_sorted(v1, c1, v2, c2)
    return float(np.max(np.abs(cdf1 - cdf2)))


def emd_from_hist(v1, c1, v2, c2, margin_quantile_filter: float = 0.025) -> float:
    """Earth Mover's (W1) distance (reference drift.py:322-370): filter
    both tails at the margin quantile, jointly min-max scale to [0,1],
    then W1 = ∫|ECDF1 − ECDF2| dx over the merged support."""
    if margin_quantile_filter < 0 or margin_quantile_filter >= 0.5:
        raise ValueError(
            f"margin_quantile_filter expected a value in range [0, 0.5), instead got {margin_quantile_filter}"
        )
    v1, c1 = _sorted_hist(v1, c1)
    v2, c2 = _sorted_hist(v2, c2)
    if margin_quantile_filter != 0:
        v1, c1 = _filter_margins(v1, c1, margin_quantile_filter)
        v2, c2 = _filter_margins(v2, c2, margin_quantile_filter)
    val_max = max(v1.max(), v2.max())
    val_min = min(v1.min(), v2.min())
    if val_max == val_min:
        return 0.0
    v1 = (v1 - val_min) / (val_max - val_min)
    v2 = (v2 - val_min) / (val_max - val_min)
    support, cdf1, cdf2 = _merge_sorted(v1, c1, v2, c2)
    deltas = np.diff(support)
    return float(np.sum(np.abs(cdf1 - cdf2)[:-1] * deltas))


def _sorted_hist(v, c):
    v = np.asarray(v, dtype=float)
    c = np.asarray(c, dtype=np.int64)
    order = np.argsort(v, kind="stable")
    return v[order], c[order]


def _filter_margins(v, c, margin):
    """reference drift.py:39-42 filter_margins_by_quantile on compressed data."""
    qt_min, qt_max = weighted_quantile_linear(v, c, [margin, 1 - margin])
    mask = (v >= qt_min) & (v <= qt_max)
    return v[mask], c[mask]


# ---------------------------------------------------------------------------
# categorical binning + kernels (reference preprocessing.py:117-199)
# ---------------------------------------------------------------------------

def preprocess_counts_to_same_bins(
    counter1: dict,
    counter2: dict,
    min_category_size_ratio: float = 0.0,
    max_num_categories: int | None = None,
    sort_by: str = "dist1",
):
    """Shared categorical binning on counters (value → count).

    Deterministic top-N tie-break ``(−count, key)`` exactly as the
    reference (preprocessing.py:179, explicitly avoiding Counter.most_common
    nondeterminism). Returns (counts1, counts2, categories_list).
    """
    size1 = sum(counter1.values())
    size2 = sum(counter2.values())
    categories = sorted(set(counter1) | set(counter2), key=str)
    other1 = 0
    other2 = 0

    if max_num_categories is not None and len(categories) > max_num_categories:
        if sort_by == "dist1":
            key_counts = {k: counter1.get(k, 0) for k in categories}
        elif sort_by == "dist2":
            key_counts = {k: counter2.get(k, 0) for k in categories}
        elif sort_by == "difference":
            key_counts = {k: abs(counter1.get(k, 0) - counter2.get(k, 0)) for k in categories}
        else:
            raise ValueError(f"sort_by got unexpected value: {sort_by}")
        categories = [
            k for k, _ in sorted(key_counts.items(), key=lambda x: (-x[1], str(x[0])))
        ][:max_num_categories]
        kept1 = sum(counter1.get(k, 0) for k in categories)
        kept2 = sum(counter2.get(k, 0) for k in categories)
        other1 = size1 - kept1
        other2 = size2 - kept2

    for cat in list(categories):
        if counter1.get(cat, 0) < size1 * min_category_size_ratio:
            other1 += counter1.get(cat, 0)
            other2 += counter2.get(cat, 0)
            categories.remove(cat)

    if other1 > min_category_size_ratio * size1 or other2 > min_category_size_ratio * size2:
        categories = categories + [OTHER_CATEGORY_NAME]
        c1 = np.array([counter1.get(k, 0) for k in categories[:-1]] + [other1], dtype=float)
        c2 = np.array([counter2.get(k, 0) for k in categories[:-1]] + [other2], dtype=float)
    else:
        c1 = np.array([counter1.get(k, 0) for k in categories], dtype=float)
        c2 = np.array([counter2.get(k, 0) for k in categories], dtype=float)
    return c1, c2, categories


def _balance_sizes_downsizing(c1, c2, round_to_int: bool = True):
    """reference drift.py:175-185."""
    s1, s2 = c1.sum(), c2.sum()
    if s1 > s2:
        c1 = c1 * (s2 / s1)
    elif s1 < s2:
        c2 = c2 * (s1 / s2)
    if round_to_int:
        c1, c2 = np.round(c1), np.round(c2)
    return c1, c2


def _rebalance_distributions(c1, c2):
    """reference drift.py:68-95 (balance_classes=True path)."""
    c1, c2 = _balance_sizes_downsizing(c1, c2, round_to_int=False)
    multipliers = (c2 + 1) / (c1 + 1)
    c1 = np.array([int(np.sum(c2 + 1) / len(c2))] * len(c2), dtype=float)
    c2 = np.round(c1 * multipliers)
    c2 = np.round(c2 * (c1.sum() / c2.sum()))
    return c1, c2


def _chi2_stat(observed: np.ndarray) -> float:
    """Pearson chi² with Yates continuity correction at df==1 — matches
    scipy.stats.chi2_contingency(observed)[0] as called by the reference."""
    observed = np.asarray(observed, dtype=float)
    row = observed.sum(axis=1, keepdims=True)
    col = observed.sum(axis=0, keepdims=True)
    n = observed.sum()
    expected = row @ col / n
    if np.any(expected == 0):
        raise ValueError("chi2: zero element in expected frequencies")
    dof = (observed.shape[0] - 1) * (observed.shape[1] - 1)
    if dof == 1:
        # Yates: shift observed toward expected by min(0.5, |e−o|) — the
        # magnitude cap matches scipy>=1.7 (scipy gh-13875); an uncapped
        # shift overshoots past expected on near-identical distributions.
        shift = np.minimum(0.5, np.abs(expected - observed))
        observed = observed + shift * np.sign(expected - observed)
    return float(np.sum((observed - expected) ** 2 / expected))


def cramers_v_from_counts(
    counter1: dict,
    counter2: dict,
    balance_classes: bool = False,
    min_category_size_ratio: float = 0.0,
    max_num_categories: int | None = None,
    sort_by: str = "dist1",
) -> float:
    """Bias-corrected Cramér's V (reference drift.py:98-172)."""
    min_category_size_ratio = min_category_size_ratio if balance_classes is False else 0
    c1, c2, cats = preprocess_counts_to_same_bins(
        counter1, counter2, min_category_size_ratio, max_num_categories, sort_by
    )
    if len(cats) == 1:
        return 0.0
    if balance_classes:
        c1, c2 = _rebalance_distributions(c1, c2)
    else:
        c1, c2 = _balance_sizes_downsizing(c1, c2)
    matrix = np.vstack([c1, c2]).astype(int)
    keep = (matrix != 0).any(axis=0)
    matrix = matrix[:, keep]
    if matrix.shape[1] < 2 or (matrix.sum(axis=1) == 0).any():
        # degenerate after downsizing (a side rounds to all zeros, or a
        # single shared bin survives): the chi² expected table has a
        # zero element and the statistic is undefined — the reference
        # raises from scipy here (drift.py:166), shielded only by its
        # min_samples gate (found by hypothesis). No association is
        # measurable on such a table; report 0.
        return 0.0
    chi2 = _chi2_stat(matrix)
    n = matrix.sum()
    phi2 = chi2 / n
    r, k = matrix.shape
    phi2corr = max(0, phi2 - ((k - 1) * (r - 1)) / (n - 1))
    rcorr = r - ((r - 1) ** 2) / (n - 1)
    kcorr = k - ((k - 1) ** 2) / (n - 1)
    denom = min(kcorr - 1, rcorr - 1)
    if denom <= 0:
        # degenerate: total count 2 makes the bias-corrected denominator
        # 0 and the statistic undefined (the reference divides by zero
        # here, drift.py:172-175 — its min_samples=10 gate just hides
        # it; found by hypothesis). phi2corr is also 0 in this regime,
        # so 0.0 is the continuous extension, never a masked signal.
        return 0.0
    return float(np.sqrt(phi2corr / denom))


def psi_from_counts(
    counter1: dict,
    counter2: dict,
    min_category_size_ratio: float = 0.0,
    max_num_categories: int | None = None,
    sort_by: str = "dist1",
) -> float:
    """Population Stability Index (reference drift.py:188-241), with the
    0.01 percentage floor (PSI_MIN_PERCENTAGE)."""
    expected, actual, _ = preprocess_counts_to_same_bins(
        counter1, counter2, min_category_size_ratio, max_num_categories, sort_by
    )
    size_e, size_a = expected.sum(), actual.sum()
    value = 0.0
    for e, a in zip(expected, actual):
        e_perc = max(e / size_e, PSI_MIN_PERCENTAGE)
        a_perc = max(a / size_a, PSI_MIN_PERCENTAGE)
        value += (e_perc - a_perc) * np.log(e_perc / a_perc)
    return float(value)
