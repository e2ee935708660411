"""Gradient-boosted shallow trees (logistic loss) — the domain
classifier behind MultivariateDrift (reference
core/check_utils/multivariate_drift_utils.py:39-147 uses
HistGradientBoostingClassifier(max_depth=2, max_iter=10); this is the
same model family in numpy: depth-2 regression trees on the logistic
gradient, 10 rounds). Deterministic; no sklearn in this environment.
"""

from __future__ import annotations

import numpy as np

from deepchecks_spark.ml.tree import DecisionTree


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


class GradientBoostingBinary:
    def __init__(self, n_iter: int = 10, max_depth: int = 2, learning_rate: float = 0.3,
                 min_samples_leaf: int = 20):
        self.n_iter = n_iter
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.min_samples_leaf = min_samples_leaf
        self.trees: list = []
        self.f0 = 0.0

    def fit(self, X, y):
        X = np.asarray(X, dtype=float)
        y = np.asarray(y, dtype=float)
        p = np.clip(y.mean(), 1e-6, 1 - 1e-6)
        self.f0 = float(np.log(p / (1 - p)))
        f = np.full(len(y), self.f0)
        self.trees = []
        for _ in range(self.n_iter):
            residual = y - _sigmoid(f)
            t = DecisionTree(task="regression", max_depth=self.max_depth,
                             min_samples_leaf=self.min_samples_leaf)
            t.fit(X, residual)
            step = t.predict(X)
            f = f + self.learning_rate * step
            self.trees.append(t)
        return self

    def decision_function(self, X):
        X = np.asarray(X, dtype=float)
        f = np.full(len(X), self.f0)
        for t in self.trees:
            f = f + self.learning_rate * t.predict(X)
        return f

    def predict_proba(self, X):
        return _sigmoid(self.decision_function(X))
