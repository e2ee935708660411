"""Deprecated alias checks — pure subclass+warn shims so suite configs
written against older reference versions keep running.

Reference twins:
  WholeDatasetDrift       → reference .../whole_dataset_drift.py:18
  CategoryMismatchTrainTest → reference .../category_mismatch_train_test.py:16
  TrainTestFeatureDrift   → reference .../train_test_feature_drift.py
  TrainTestLabelDrift     → reference .../train_test_label_drift.py
Each emits the same DeprecationWarning pattern the reference does and
otherwise behaves exactly like its replacement.
"""

from __future__ import annotations

import warnings

from deepchecks_spark.checks.ml import MultivariateDrift
from deepchecks_spark.checks.performance import (
    RegressionErrorDistribution as _RegressionErrorDistribution,
    WeakSegmentsPerformance as _WeakSegmentsPerformance,
)
from deepchecks_spark.checks.traintest import (
    FeatureDrift,
    LabelDrift,
    NewCategoryTrainTest,
    PredictionDrift as _PredictionDrift,
)

__all__ = [
    "WholeDatasetDrift",
    "CategoryMismatchTrainTest",
    "TrainTestFeatureDrift",
    "TrainTestLabelDrift",
    "TrainTestPredictionDrift",
    "RegressionSystematicError",
    "SegmentPerformance",
]


def _warn(old: str, new: str) -> None:
    warnings.warn(
        f"The {old} check is deprecated and will be removed in a future version. "
        f"Please use the {new} check instead.",
        DeprecationWarning,
        stacklevel=3,
    )


class WholeDatasetDrift(MultivariateDrift):
    """Deprecated alias of MultivariateDrift."""

    def __init__(self, **kwargs):
        _warn("WholeDatasetDrift", "MultivariateDrift")
        super().__init__(**kwargs)


class CategoryMismatchTrainTest(NewCategoryTrainTest):
    """Deprecated alias of NewCategoryTrainTest."""

    def __init__(self, **kwargs):
        _warn("CategoryMismatchTrainTest", "NewCategoryTrainTest")
        super().__init__(**kwargs)


class TrainTestFeatureDrift(FeatureDrift):
    """Deprecated alias of FeatureDrift."""

    def __init__(self, **kwargs):
        _warn("TrainTestFeatureDrift", "FeatureDrift")
        super().__init__(**kwargs)


class TrainTestLabelDrift(LabelDrift):
    """Deprecated alias of LabelDrift."""

    def __init__(self, **kwargs):
        _warn("TrainTestLabelDrift", "LabelDrift")
        super().__init__(**kwargs)


class TrainTestPredictionDrift(_PredictionDrift):
    """Deprecated alias of PredictionDrift (reference
    model_evaluation/train_test_prediction_drift.py)."""

    def __init__(self, *args, **kwargs):
        _warn("TrainTestPredictionDrift", "PredictionDrift")
        super().__init__(*args, **kwargs)


class RegressionSystematicError(_RegressionErrorDistribution):
    """Deprecated alias (reference model_evaluation/
    regression_systematic_error.py:25-44 — deprecated upstream in favor
    of RegressionErrorDistribution's systematic-error condition)."""

    def __init__(self, *args, **kwargs):
        _warn("RegressionSystematicError", "RegressionErrorDistribution")
        super().__init__(*args, **kwargs)


class SegmentPerformance(_WeakSegmentsPerformance):
    """Deprecated alias (reference model_evaluation/
    segment_performance.py:32-88 — deprecated upstream in favor of
    WeakSegmentsPerformance)."""

    def __init__(self, *args, **kwargs):
        _warn("SegmentPerformance", "WeakSegmentsPerformance")
        super().__init__(*args, **kwargs)
