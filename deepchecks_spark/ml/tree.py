"""Minimal vectorized CART trees (numpy-only).

This container has no sklearn, so the sampled ML kernels (PPS decision
tree, the MultivariateDrift boosted classifier) run on this
implementation. Semantics follow standard CART (gini for
classification, variance reduction for regression, midpoint thresholds,
deterministic first-best tie-break); exact sklearn score parity is not
possible without sklearn, and the engine documents that deviation —
the *protocols* around the kernels (CV folds, baselines, normalization)
match the reference exactly.
"""

from __future__ import annotations

import numpy as np


class _Node:
    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self, value):
        self.feature = -1
        self.threshold = 0.0
        self.left = None
        self.right = None
        self.value = value


def _class_counts(y, n_classes):
    return np.bincount(y, minlength=n_classes).astype(np.float64)


def _best_split_feature(x, y_enc, n_classes, min_leaf):
    """Best gini split on one feature; returns (gain, threshold) or None.
    y_enc: int class indices. Vectorized prefix-count scan over the
    sorted column."""
    order = np.argsort(x, kind="stable")
    xs = x[order]
    ys = y_enc[order]
    n = len(xs)
    onehot = np.zeros((n, n_classes))
    onehot[np.arange(n), ys] = 1.0
    left_counts = np.cumsum(onehot, axis=0)
    total = left_counts[-1]
    # candidate split after position i (1-based count i+1)
    valid = xs[:-1] < xs[1:]
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return None
    nl = (idx + 1).astype(np.float64)
    nr = n - nl
    mask = (nl >= min_leaf) & (nr >= min_leaf)
    idx, nl, nr = idx[mask], nl[mask], nr[mask]
    if len(idx) == 0:
        return None
    lc = left_counts[idx]
    rc = total - lc
    gini_l = 1.0 - np.sum((lc / nl[:, None]) ** 2, axis=1)
    gini_r = 1.0 - np.sum((rc / nr[:, None]) ** 2, axis=1)
    weighted = (nl * gini_l + nr * gini_r) / n
    parent = 1.0 - np.sum((total / n) ** 2)
    gains = parent - weighted
    best = int(np.argmax(gains))
    if gains[best] <= 1e-12:
        return None
    i = idx[best]
    return float(gains[best]), (xs[i] + xs[i + 1]) / 2.0


def _best_split_feature_reg(x, y, min_leaf):
    order = np.argsort(x, kind="stable")
    xs = x[order]
    ys = y[order]
    n = len(xs)
    csum = np.cumsum(ys)
    csum2 = np.cumsum(ys * ys)
    total, total2 = csum[-1], csum2[-1]
    valid = xs[:-1] < xs[1:]
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return None
    nl = (idx + 1).astype(np.float64)
    nr = n - nl
    mask = (nl >= min_leaf) & (nr >= min_leaf)
    idx, nl, nr = idx[mask], nl[mask], nr[mask]
    if len(idx) == 0:
        return None
    sl = csum[idx]
    sl2 = csum2[idx]
    sr = total - sl
    sr2 = total2 - sl2
    sse = (sl2 - sl * sl / nl) + (sr2 - sr * sr / nr)
    best = int(np.argmin(sse))
    parent_sse = total2 - total * total / n
    if parent_sse - sse[best] <= 1e-12:
        return None
    i = idx[best]
    return float(parent_sse - sse[best]), (xs[i] + xs[i + 1]) / 2.0


class DecisionTree:
    """CART; task ∈ {'classification', 'regression'}."""

    def __init__(self, task: str = "classification", max_depth: int | None = None,
                 min_samples_leaf: int = 1):
        self.task = task
        self.max_depth = max_depth if max_depth is not None else 10**9
        self.min_samples_leaf = min_samples_leaf
        self.root = None
        self.classes_ = None

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        if self.task == "classification":
            self.classes_, y_enc = np.unique(y, return_inverse=True)
            self.root = self._grow_cls(X, y_enc, 0)
        else:
            y = np.asarray(y, dtype=np.float64)
            self.root = self._grow_reg(X, y, 0)
        return self

    def _grow_cls(self, X, y, depth):
        n_classes = len(self.classes_)
        counts = _class_counts(y, n_classes)
        node = _Node(counts / counts.sum())
        if depth >= self.max_depth or len(np.unique(y)) == 1 or len(y) < 2 * self.min_samples_leaf:
            return node
        best = None
        for f in range(X.shape[1]):
            res = _best_split_feature(X[:, f], y, n_classes, self.min_samples_leaf)
            if res is not None and (best is None or res[0] > best[0]):
                best = (res[0], f, res[1])
        if best is None:
            return node
        _, f, thr = best
        mask = X[:, f] <= thr
        node.feature, node.threshold = f, thr
        node.left = self._grow_cls(X[mask], y[mask], depth + 1)
        node.right = self._grow_cls(X[~mask], y[~mask], depth + 1)
        return node

    def _grow_reg(self, X, y, depth):
        node = _Node(float(y.mean()))
        if depth >= self.max_depth or len(y) < 2 * self.min_samples_leaf or np.ptp(y) == 0:
            return node
        best = None
        for f in range(X.shape[1]):
            res = _best_split_feature_reg(X[:, f], y, self.min_samples_leaf)
            if res is not None and (best is None or res[0] > best[0]):
                best = (res[0], f, res[1])
        if best is None:
            return node
        _, f, thr = best
        mask = X[:, f] <= thr
        node.feature, node.threshold = f, thr
        node.left = self._grow_reg(X[mask], y[mask], depth + 1)
        node.right = self._grow_reg(X[~mask], y[~mask], depth + 1)
        return node

    def _leaf_values(self, X):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        out = [None] * len(X)
        stack = [(self.root, np.arange(len(X)))]
        while stack:
            node, idx = stack.pop()
            if node.left is None:
                for i in idx:
                    out[i] = node.value
                continue
            mask = X[idx, node.feature] <= node.threshold
            stack.append((node.left, idx[mask]))
            stack.append((node.right, idx[~mask]))
        return out

    def predict(self, X):
        vals = self._leaf_values(X)
        if self.task == "classification":
            return self.classes_[np.array([int(np.argmax(v)) for v in vals])]
        return np.array(vals, dtype=np.float64)

    def predict_proba(self, X):
        return np.vstack(self._leaf_values(X))
