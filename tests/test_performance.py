"""SingleDatasetPerformance: predictions-column metrics from the
distributed confusion matrix."""

import numpy as np
import pytest

from deepchecks_spark import Dataset
from deepchecks_spark.checks.performance import (
    SingleDatasetPerformance,
    scores_from_confusion,
)
from deepchecks_spark.core.result import ConditionCategory
from deepchecks_spark.ml.metrics import f1_weighted


def test_scores_from_confusion_matches_array_metrics():
    # the count-based formulas must equal the array kernels on the
    # expanded confusion
    rng = np.random.default_rng(5)
    y = rng.integers(0, 4, 500)
    p = np.where(rng.random(500) < 0.3, rng.integers(0, 4, 500), y)
    cells = {}
    for a, b in zip(y, p):
        cells[(int(a), int(b))] = cells.get((int(a), int(b)), 0) + 1
    got = scores_from_confusion(cells, ["accuracy", "f1_weighted",
                                        "precision_macro", "recall_macro"])
    assert got["accuracy"] == pytest.approx(float(np.mean(y == p)))
    assert got["f1_weighted"] == pytest.approx(f1_weighted(y, p))
    assert 0.0 <= got["precision_macro"] <= 1.0
    assert 0.0 <= got["recall_macro"] <= 1.0


def test_scores_from_confusion_zero_division_conventions():
    # class 2 never predicted → precision 0; class 3 predicted but never
    # true → recall 0 (sklearn zero_division=0 behavior)
    cells = {(0, 0): 5, (1, 1): 5, (2, 0): 2, (0, 3): 1}
    got = scores_from_confusion(cells, ["precision_macro", "recall_macro", "f1_weighted"])
    assert 0.0 <= got["precision_macro"] <= 1.0
    assert got["f1_weighted"] > 0


def test_single_dataset_performance_check(spark):
    rows = [(i, i % 3, (i % 3 if i % 5 else (i % 3 + 1) % 3)) for i in range(300)]
    ds = Dataset(spark.createDataFrame(rows, "id long, lbl int, pred int"),
                 label="lbl", infer_categorical=False)
    check = SingleDatasetPerformance("pred").add_condition_greater_than(0.7)
    result = check.run(ds)
    # exactly every 5th row mislabeled → accuracy 0.8
    assert result.value["accuracy"] == pytest.approx(0.8)
    assert result.conditions_results[0].category == ConditionCategory.PASS
    assert check.reduce_output(result) == result.value
    assert check.greater_is_better() is True
    strict = SingleDatasetPerformance("pred").add_condition_greater_than(0.95)
    assert strict.run(ds).conditions_results[0].category == ConditionCategory.FAIL


def test_single_dataset_performance_gates_unbounded_confusion(spark):
    df = spark.range(0, 3000).selectExpr(
        "cast(id as string) as lbl", "cast(id + 1 as string) as pred")
    ds = Dataset(df, label="lbl", infer_categorical=False)
    check = SingleDatasetPerformance("pred")
    check.MAX_CONFUSION_CELLS = 100
    with pytest.raises(ValueError, match="confusion matrix"):
        check.run(ds)


def test_single_dataset_performance_rejects_unknown_scorer():
    with pytest.raises(ValueError, match="unsupported scorer"):
        SingleDatasetPerformance("pred", scorers=["auc"])
