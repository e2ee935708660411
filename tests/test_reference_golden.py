"""Golden-value parity against the reference's OWN test expectations.

The fixture reproduces /root/reference/tests/tabular/conftest.py:381-410
(`drifted_data`, legacy np.random.seed(42) API) bit-for-bit, and the
assertions are the exact values the reference asserts in
tests/tabular/checks/train_test_validation/feature_drift_test.py:33-52
(close_to tolerances included). Passing here means our Spark drift
pipeline computes the same statistics deepchecks' pandas pipeline does
on identical data.
"""

import numpy as np
import pandas as pd
import pytest

from deepchecks_spark import Dataset
from deepchecks_spark.checks.traintest import FeatureDrift, LabelDrift


@pytest.fixture(scope="module")
def drifted_data(spark):
    np.random.seed(42)
    train_data = np.concatenate(
        [np.random.randn(1000, 2),
         np.random.choice(a=["apple", "orange", "banana"], p=[0.5, 0.3, 0.2], size=(1000, 2))],
        axis=1,
    )
    test_data = np.concatenate(
        [np.random.randn(1000, 2),
         np.random.choice(a=["apple", "orange", "banana"], p=[0.5, 0.3, 0.2], size=(1000, 2))],
        axis=1,
    )
    cols = ["numeric_without_drift", "numeric_with_drift",
            "categorical_without_drift", "categorical_with_drift"]
    df_train = pd.DataFrame(train_data, columns=cols)
    df_test = pd.DataFrame(test_data, columns=cols)
    for c in cols[:2]:
        df_train[c] = df_train[c].astype(float)
        df_test[c] = df_test[c].astype(float)
    df_test["numeric_with_drift"] = (
        df_test["numeric_with_drift"].astype(float)
        + abs(np.random.randn(1000))
        + np.arange(0, 1, 0.001) * 4
    )
    df_test["categorical_with_drift"] = np.random.choice(
        a=["apple", "orange", "banana", "lemon"], p=[0.5, 0.25, 0.15, 0.1], size=(1000, 1)
    )
    ddl = ("numeric_without_drift double, numeric_with_drift double, "
           "categorical_without_drift string, categorical_with_drift string")
    cat = ["categorical_without_drift", "categorical_with_drift"]
    train = Dataset(spark.createDataFrame(df_train, schema=ddl), cat_features=cat,
                    infer_categorical=False)
    test = Dataset(spark.createDataFrame(df_test, schema=ddl), cat_features=cat,
                   infer_categorical=False)
    return train, test


def test_feature_drift_reference_golden_values(spark, drifted_data):
    """reference feature_drift_test.py:22-53 (test_drift_with_model),
    minus the model-derived Importance entries."""
    train, test = drifted_data
    check = FeatureDrift(categorical_drift_method="PSI", numerical_drift_method="EMD",
                         max_num_categories_for_drift=10, min_category_size_ratio=0)
    result = check.run(train, test)
    v = result.value
    assert v["numeric_without_drift"]["Drift score"] == pytest.approx(0.01, abs=0.01)
    assert v["numeric_without_drift"]["Method"] == "Earth Mover's Distance"
    assert v["numeric_with_drift"]["Drift score"] == pytest.approx(0.34, abs=0.01)
    assert v["categorical_without_drift"]["Drift score"] == pytest.approx(0.0, abs=0.01)
    assert v["categorical_without_drift"]["Method"] == "PSI"
    assert v["categorical_with_drift"]["Drift score"] == pytest.approx(0.22, abs=0.01)


def _label_fixture(spark, p_test):
    """reference conftest.py:455-489 ({non_}drifted_classification_label):
    numeric 0/1 label → task inference must treat it as classification."""
    np.random.seed(42)
    train = np.concatenate(
        [np.random.randn(1000, 2), np.random.choice(a=[1, 0], p=[0.5, 0.5], size=(1000, 1))], axis=1
    )
    test = np.concatenate(
        [np.random.randn(1000, 2), np.random.choice(a=[1, 0], p=p_test, size=(1000, 1))], axis=1
    )
    mk = lambda arr: Dataset(  # noqa: E731
        spark.createDataFrame(pd.DataFrame(arr, columns=["col1", "col2", "target"]),
                              schema="col1 double, col2 double, target double"),
        label="target", infer_categorical=False,
    )
    return mk(train), mk(test)


def test_label_drift_no_drift_psi_golden(spark):
    """reference label_drift_test.py:23-35: PSI close_to(0.003, 0.001)."""
    train, test = _label_fixture(spark, [0.45, 0.55])
    result = LabelDrift(categorical_drift_method="PSI").run(train, test)
    assert result.value["Method"] == "PSI"
    assert result.value["Drift score"] == pytest.approx(0.003, abs=0.001)


def test_label_drift_drifted_golden(spark):
    """reference label_drift_test.py:37-66: Cramer's V and PSI both
    close_to(0.24, 0.01) on the drifted label fixture."""
    train, test = _label_fixture(spark, [0.25, 0.75])
    r_cv = LabelDrift(categorical_drift_method="cramers_v").run(train, test)
    assert r_cv.value["Method"] == "Cramer's V"
    assert r_cv.value["Drift score"] == pytest.approx(0.24, abs=0.01)
    r_psi = LabelDrift(categorical_drift_method="PSI").run(train, test)
    assert r_psi.value["Drift score"] == pytest.approx(0.24, abs=0.01)


def test_new_category_reference_golden(spark):
    """reference new_category_test.py:33-60: {a,b,c}→{a,b,c,d}: 1 new
    category, 0.25 ratio; no-new case → 0."""
    from deepchecks_spark.checks.traintest import NewCategoryTrainTest

    mk = lambda vals: Dataset(  # noqa: E731
        spark.createDataFrame([(v,) for v in vals], "col1 string"),
        cat_features=["col1"], infer_categorical=False,
    )
    r = NewCategoryTrainTest().run(mk(["a", "b", "c"]), mk(["a", "b", "c", "d"]))
    assert r.value["col1"]["n_new_categories"] == 1
    assert r.value["col1"]["ratio_of_new_categories"] == pytest.approx(0.25)
    r0 = NewCategoryTrainTest().run(mk(["a", "b", "c"]), mk(["a", "a", "b", "c"]))
    assert r0.value["col1"]["n_new_categories"] == 0


def test_date_leakage_duplicates_reference_golden(spark):
    """reference date_leakage_test.py:32-87: value close_to(0.31, 0.01)
    on the 14/13-row fixture and close_to(0.5, 0.01) on the 7/4-row one."""
    from datetime import datetime as dt

    from deepchecks_spark.checks.traintest import DateTrainTestLeakageDuplicates

    def mk(dates):
        return Dataset(spark.createDataFrame([(d,) for d in dates], "col1 timestamp"),
                       datetime_name="col1", infer_categorical=False)

    train = mk([dt(2021, 10, 1)] * 3 + [dt(2021, 10, 2)] * 3 + [dt(2021, 10, 3)] * 3
               + [dt(2021, 10, 4)] * 3 + [dt(2021, 10, 5)] * 2)
    test = mk([dt(2021, 9, 4), dt(2021, 10, 4), dt(2021, 10, 5), dt(2021, 10, 5),
               dt(2021, 10, 5), dt(2021, 10, 6), dt(2021, 10, 6), dt(2021, 10, 7),
               dt(2021, 10, 7), dt(2021, 10, 8), dt(2021, 10, 8), dt(2021, 10, 9),
               dt(2021, 10, 9)])
    assert DateTrainTestLeakageDuplicates().run(train, test).value == pytest.approx(0.31, abs=0.01)

    train2 = mk([dt(2021, 10, 3)] * 2 + [dt(2021, 10, 4)] * 3 + [dt(2021, 10, 5)] * 2)
    test2 = mk([dt(2021, 9, 4), dt(2021, 10, 4), dt(2021, 10, 5), dt(2021, 10, 6)])
    assert DateTrainTestLeakageDuplicates(n_to_show=1).run(train2, test2).value == pytest.approx(0.5, abs=0.01)


def test_index_leakage_reference_golden(spark):
    """reference index_train_val_leakage_test.py:29-59: 0.25, 0.5, 0.0."""
    from deepchecks_spark.checks.traintest import IndexTrainTestLeakage

    def mk(vals):
        return Dataset(spark.createDataFrame([(v,) for v in vals], "col1 int"),
                       index_name="col1", infer_categorical=False)

    train = mk([1, 2, 3, 4, 10, 11])
    assert IndexTrainTestLeakage().run(train, mk([4, 5, 6, 7])).value == pytest.approx(0.25, abs=0.01)
    assert IndexTrainTestLeakage(n_index_to_show=1).run(train, mk([4, 3, 6, 7])).value == pytest.approx(0.5, abs=0.01)
    assert IndexTrainTestLeakage().run(train, mk([20, 5, 6, 7])).value == pytest.approx(0.0, abs=0.01)


def test_feature_drift_ks_golden(spark, drifted_data):
    """KS on the same fixture: drifted numeric column must be far above
    the 0.2 threshold, undrifted far below (reference uses the same
    dispatch for numerical_drift_method='KS')."""
    train, test = drifted_data
    check = FeatureDrift(categorical_drift_method="cramers_v", numerical_drift_method="KS")
    v = check.run(train, test).value
    assert v["numeric_without_drift"]["Drift score"] < 0.1
    assert v["numeric_with_drift"]["Drift score"] > 0.3
    assert v["numeric_with_drift"]["Method"] == "Kolmogorov-Smirnov"
