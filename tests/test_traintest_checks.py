"""Train/test validation checks on micro-fixtures (FIXTURES.md §F2)."""

from datetime import datetime

import pytest

from deepchecks_spark import Dataset
from deepchecks_spark.checks.traintest import (
    DatasetsSizeComparison,
    DateTrainTestLeakageDuplicates,
    DateTrainTestLeakageOverlap,
    IndexTrainTestLeakage,
    NewCategoryTrainTest,
    NewLabelTrainTest,
    StringMismatchComparison,
    TrainTestSamplesMix,
)
from deepchecks_spark.core.result import ConditionCategory


def _ds(spark, rows, schema, **kw):
    kw.setdefault("infer_categorical", False)
    return Dataset(spark.createDataFrame(rows, schema=schema), **kw)


def test_datasets_size_comparison(spark):
    train = _ds(spark, [(i,) for i in range(100)], "x int")
    test = _ds(spark, [(i,) for i in range(25)], "x int")
    check = DatasetsSizeComparison().add_condition_test_train_size_ratio_greater_than(0.1)
    result = check.run(train, test)
    assert result.value == {"Train": 100, "Test": 25}
    assert result.conditions_results[0].category == ConditionCategory.PASS


def test_new_label_train_test(spark):
    train = _ds(spark, [(0,), (1,)] * 10, "label int", label="label")
    test = _ds(spark, [(0,), (1,), (2,), (2,), (3,)], "label int", label="label")
    check = NewLabelTrainTest().add_condition_new_labels_number_less_or_equal(0)
    result = check.run(train, test)
    assert result.value["n_new_labels_samples"] == 3
    assert result.value["n_samples"] == 5
    assert result.value["new_labels"] == {2: 2, 3: 1}
    assert result.conditions_results[0].category == ConditionCategory.FAIL


def test_new_label_none_new(spark):
    train = _ds(spark, [(0,), (1,)] * 10, "label int", label="label")
    test = _ds(spark, [(0,), (1,)], "label int", label="label")
    result = NewLabelTrainTest().run(train, test)
    assert result.value["new_labels"] == {}


def test_new_category_train_test(spark):
    train = _ds(spark, [("a",), ("b",), ("c",)] * 5, "cat string", cat_features=["cat"])
    test = _ds(spark, [("a",), ("b",), ("c",), ("d",), ("d",), ("e",)], "cat string", cat_features=["cat"])
    check = NewCategoryTrainTest().add_condition_new_categories_less_or_equal(0)
    result = check.run(train, test)
    info = result.value["cat"]
    assert info["n_new_categories"] == 2
    assert info["new_categories"] == ["d", "e"]
    assert info["ratio_of_new_categories"] == pytest.approx(0.5)
    assert result.conditions_results[0].category == ConditionCategory.FAIL


def test_string_mismatch_comparison(spark):
    train = _ds(spark, [("deep",), ("deep!",), ("shallow",)], "col string")
    test = _ds(spark, [("DEEP",), ("deep",), ("shallow",)], "col string")
    check = StringMismatchComparison().add_condition_no_new_variants()
    result = check.run(train, test)
    assert "deep" in result.value["col"]
    assert result.value["col"]["deep"]["variants_only_in_test"] == ["DEEP"]
    # reference string_mismatch_comparison.py:179: failing category is FAIL
    assert result.conditions_results[0].category == ConditionCategory.FAIL


def test_index_leakage(spark):
    train = _ds(spark, [(i, "x") for i in range(10)], "idx int, v string", index_name="idx")
    test = _ds(spark, [(i, "y") for i in range(8, 12)], "idx int, v string", index_name="idx")
    check = IndexTrainTestLeakage().add_condition_ratio_less_or_equal(0.0)
    result = check.run(train, test)
    assert result.value == pytest.approx(0.5)  # 8,9 of 8,9,10,11
    assert result.conditions_results[0].category == ConditionCategory.FAIL
    assert [r["idx"] for r in result.violations.collect()] == [8, 9]


def _dt(day):
    return datetime(2025, 1, day)


def test_date_leakage_duplicates(spark):
    train = _ds(spark, [(_dt(d),) for d in [1, 2, 3, 4]], "ts timestamp", datetime_name="ts")
    test = _ds(spark, [(_dt(d),) for d in [4, 5, 6, 7]], "ts timestamp", datetime_name="ts")
    result = DateTrainTestLeakageDuplicates().run(train, test)
    assert result.value == pytest.approx(0.25)


def test_date_leakage_overlap(spark):
    train = _ds(spark, [(_dt(d),) for d in [1, 5, 10]], "ts timestamp", datetime_name="ts")
    test = _ds(spark, [(_dt(d),) for d in [7, 9, 11, 12]], "ts timestamp", datetime_name="ts")
    check = DateTrainTestLeakageOverlap().add_condition_leakage_ratio_less_or_equal(0.0)
    result = check.run(train, test)
    assert result.value == pytest.approx(0.5)  # 7, 9 < max(train)=10
    assert result.conditions_results[0].category == ConditionCategory.FAIL


def test_train_test_samples_mix(spark):
    train = _ds(spark, [(1, "a"), (2, "b"), (3, "c"), (None, "n")], "f int, label string", label="label")
    test = _ds(
        spark,
        [(1, "a"), (9, "z"), (8, "z"), (None, "n"), (2, "x")],
        "f int, label string",
        label="label",
    )
    check = TrainTestSamplesMix().add_condition_duplicates_ratio_less_or_equal(0.1)
    result = check.run(train, test)
    # (1,a) and (None,n) appear in train → 2/5 (null-safe equality)
    assert result.value["ratio"] == pytest.approx(0.4)
    assert result.conditions_results[0].category == ConditionCategory.FAIL


def test_string_mismatch_comparison_full_value_shape(spark):
    """Reference string_mismatch_comparison.py:95-121 value fields."""
    train = _ds(spark, [("deep",), ("deep!",), ("shallow",), ("x",)], "col string")
    test = _ds(spark, [("DEEP",), ("deep",), ("deep",), ("shallow",)], "col string")
    result = StringMismatchComparison().run(train, test)
    info = result.value["col"]["deep"]
    assert info["variants_only_in_test"] == ["DEEP"]
    assert info["variants_only_in_train"] == ["deep!"]
    assert info["commons"] == ["deep"]
    assert info["percent_variants_only_in_test"] == pytest.approx(1 / 4)  # 1 'DEEP' of 4 test rows
    assert info["percent_variants_in_train"] == pytest.approx(1 / 4)      # 1 'deep!' of 4 train rows
    # ratio condition (reference :155-164)
    loose = StringMismatchComparison().add_condition_ratio_new_variants_less_or_equal(0.5)
    assert loose.run(train, test).conditions_results[0].category == ConditionCategory.PASS
    strict = StringMismatchComparison().add_condition_ratio_new_variants_less_or_equal(0.1)
    assert strict.run(train, test).conditions_results[0].category == ConditionCategory.FAIL


def test_new_label_gates_near_unique_label(spark):
    # the driver hazard is the collected NEW-label set: disjoint
    # near-unique train/test labels make every test label new — the
    # guarded collect must raise instead of materializing them all
    import pytest as _pytest
    from deepchecks_spark.checks.traintest import NewLabelTrainTest

    train = Dataset(spark.range(0, 3000).selectExpr("id", "cast(id as string) as lbl"),
                    label="lbl", infer_categorical=False)
    test = Dataset(spark.range(3000, 6000).selectExpr("id", "cast(id as string) as lbl"),
                   label="lbl", infer_categorical=False)
    check = NewLabelTrainTest()
    check.MAX_LABEL_CARDINALITY = 100
    with _pytest.raises(ValueError, match="distinct values"):
        check.run(train, test)
    # and a same-label pair stays fine (no new labels → nothing to gate)
    assert NewLabelTrainTest().run(train, train).value["new_labels"] == {}


def test_traintest_checks_honor_explicit_n_samples(spark):
    # ADVICE r2: an explicitly-passed n_samples must cap the scan for the
    # join/set-op checks too (Bernoulli fraction — count is ~n).
    from deepchecks_spark.checks.traintest import NewLabelTrainTest

    df = spark.range(0, 4000).selectExpr("id", "cast(id % 7 as string) as lbl")
    ds = Dataset(df, label="lbl", infer_categorical=False)
    value = NewLabelTrainTest(n_samples=400).run(ds, ds).value
    assert value["n_samples"] < 2000  # sampled side, not the full 4000
    assert value["new_labels"] == {}


def test_referential_integrity(spark):
    from deepchecks_spark.checks.traintest import ReferentialIntegrity
    from deepchecks_spark.core.result import ConditionCategory as _CC

    fact = Dataset(spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None), (5, 20)], "id int, fk int"),
        infer_categorical=False)
    dim = Dataset(spark.createDataFrame([(10,), (20,), (30,)], "k int"),
                  infer_categorical=False)
    check = ReferentialIntegrity(column="fk", dim_column="k") \
        .add_condition_orphan_ratio_less_or_equal(0.0)
    result = check.run(fact, dim)
    # NULL FK is not an orphan; 99 is the single orphan of 5 rows
    assert result.value["n_orphans"] == 1
    assert result.value["orphan_ratio"] == pytest.approx(0.2)
    assert result.value["sample_orphans"] == [99]
    assert result.conditions_results[0].category == _CC.FAIL
    assert check.reduce_output(result) == {"Orphaned Keys Ratio": pytest.approx(0.2)}
    # clean FK set passes
    clean = Dataset(spark.createDataFrame([(1, 10), (2, 30)], "id int, fk int"),
                    infer_categorical=False)
    ok = ReferentialIntegrity(column="fk", dim_column="k") \
        .add_condition_orphan_ratio_less_or_equal(0.0).run(clean, dim)
    assert ok.conditions_results[0].category == _CC.PASS


def test_referential_integrity_single_anti_join_execution(spark):
    # VERDICT r3 what's-wrong #2: count + orphan sample must execute the
    # fact scan + anti-join ONCE. The fact source is an accumulator-
    # instrumented RDD: each evaluation of a partition bumps the counter,
    # so a second pass over the lineage would read 8, not 4.
    from deepchecks_spark.checks.traintest import ReferentialIntegrity
    from deepchecks_spark.core.context import Context
    from deepchecks_spark.dataset import Dataset

    acc = spark.sparkContext.accumulator(0)

    def tag(it):
        acc.add(1)
        yield from it

    rdd = spark.sparkContext.parallelize([(i,) for i in range(1000)], 4).mapPartitions(tag)
    fact = Dataset(spark.createDataFrame(rdd, "fk long"), infer_categorical=False)
    dim = Dataset(
        spark.createDataFrame([(i,) for i in range(0, 1000, 2)], "k long"),
        infer_categorical=False)
    check = ReferentialIntegrity(column="fk", dim_column="k")
    value, _ = check.compute(Context(train=fact, test=dim, require_same_schema=False))
    assert value["n_orphans"] == 500
    assert value["sample_orphans"] == [1, 3, 5, 7, 9]
    # 4 fact partitions evaluated once for the persisted anti-join, plus
    # once for the n_rows count of the fact side (a separate, cheap agg)
    assert acc.value <= 8, f"fact lineage evaluated {acc.value / 4} times"


def test_referential_integrity_clean_skips_sample_job(spark):
    from deepchecks_spark.checks.traintest import ReferentialIntegrity
    from deepchecks_spark.core.context import Context
    from deepchecks_spark.dataset import Dataset

    fact = Dataset(spark.createDataFrame([(i,) for i in range(100)], "fk long"),
                   infer_categorical=False)
    dim = Dataset(spark.createDataFrame([(i,) for i in range(100)], "k long"),
                  infer_categorical=False)
    value, _ = ReferentialIntegrity(column="fk", dim_column="k").compute(
        Context(train=fact, test=dim, require_same_schema=False))
    assert value["n_orphans"] == 0
    assert value["sample_orphans"] == []
    assert value["orphan_ratio"] == 0.0
