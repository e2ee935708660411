"""Integrity checks on micro-fixtures lifted from the reference unit
tests (FIXTURES.md §F2); expected values match the reference's own
assertions (e.g. mixed_nulls_test.py:33-40, data_duplicate_test.py:22-50)."""

import pytest

from deepchecks_spark import Dataset
from deepchecks_spark.checks.integrity import (
    ClassImbalance,
    ConflictingLabels,
    DataDuplicates,
    IsSingleValue,
    MixedDataTypes,
    MixedNulls,
    PercentOfNulls,
    SpecialCharacters,
    StringLengthOutOfBounds,
    StringMismatch,
)
from deepchecks_spark.core.result import ConditionCategory


def _ds(spark, data, schema, **kw):
    return Dataset(spark.createDataFrame(data, schema=schema), infer_categorical=False, **kw)


# -- MixedNulls (reference tests/tabular/checks/integrity/mixed_nulls_test.py) --

def test_mixed_nulls_single_string_null(spark):
    ds = _ds(spark, [("foo",), ("bar",), ("null",), ("null",)], "col1 string")
    result = MixedNulls().run(ds)
    cols = result.value["columns"]
    assert cols["col1"] == {'"null"': {"count": 2, "percent": 0.5}}


def test_mixed_nulls_case_distinct(spark):
    # 'Nan', 'nan', 'NaN' are distinct representations (mixed_nulls_test.py:102-109)
    ds = _ds(spark, [("foo",), ("bar",), ("Nan",), ("nan",), ("NaN",)], "col1 string")
    result = MixedNulls().run(ds)
    cols = result.value["columns"]["col1"]
    assert set(cols) == {'"Nan"', '"nan"', '"NaN"'}
    assert all(v["count"] == 1 for v in cols.values())


def test_mixed_nulls_real_null_and_string(spark):
    ds = _ds(spark, [(None,), (None,), ("value",), ("NULL",)], "col1 string")
    result = MixedNulls().run(ds)
    cols = result.value["columns"]["col1"]
    assert cols["null"]["count"] == 2
    assert cols['"NULL"']["count"] == 1


def test_mixed_nulls_condition(spark):
    ds = _ds(spark, [(None,), ("nan",), ("value",), ("NULL",)], "col1 string")
    check = MixedNulls().add_condition_different_nulls_less_equal_to(1)
    result = check.run(ds)
    assert result.conditions_results[0].category == ConditionCategory.FAIL


# -- DataDuplicates (reference data_duplicate_test.py:22-50) --

@pytest.fixture()
def dup_ds(spark):
    rows = [
        (1, 2, 3), (1, 2, 3), (1, 2, 3),
        (4, 5, 6), (4, 5, 6),
        (7, 8, 9), (10, 11, 12), (13, 14, 15), (16, 17, 18), (19, 20, 21),
    ]
    return _ds(spark, rows, "col1 int, col2 int, col3 int")


def test_data_duplicates_value(spark, dup_ds):
    result = DataDuplicates().run(dup_ds)
    assert result.value == pytest.approx(0.30, abs=0.01)  # 10 rows, 7 unique


def test_data_duplicates_single_column(spark, dup_ds):
    result = DataDuplicates(columns=["col1"]).run(dup_ds)
    assert result.value == pytest.approx(0.30, abs=0.01)


def test_data_duplicates_condition_pass_fail(spark, dup_ds):
    check = DataDuplicates().add_condition_ratio_less_or_equal(0.0)
    # reference abstracts/data_duplicates.py: failing category is WARN
    assert check.run(dup_ds).conditions_results[0].category == ConditionCategory.WARN
    check2 = DataDuplicates().add_condition_ratio_less_or_equal(0.5)
    assert check2.run(dup_ds).conditions_results[0].category == ConditionCategory.PASS


def test_data_duplicates_violations(spark, dup_ds):
    result = DataDuplicates().run(dup_ds)
    rows = result.violations.collect()
    assert rows[0]["count"] == 3 and rows[0]["col1"] == 1
    assert rows[1]["count"] == 2 and rows[1]["col1"] == 4


# -- IsSingleValue --

def test_is_single_value(spark):
    ds = _ds(spark, [(1, "a", 7), (1, "b", 7), (1, "c", 8)], "x int, y string, z int")
    check = IsSingleValue().add_condition_not_single_value()
    result = check.run(ds)
    assert result.value == {"x": 1, "y": 3, "z": 2}
    assert result.conditions_results[0].category == ConditionCategory.FAIL


def test_is_single_value_ignore_nan(spark):
    ds = _ds(spark, [(1.0,), (None,), (None,)], "x double")
    assert IsSingleValue().run(ds).value == {"x": 1}
    assert IsSingleValue(ignore_nan=False).run(ds).value == {"x": 2}


# -- PercentOfNulls --

def test_percent_of_nulls(spark):
    ds = _ds(spark, [(1, None), (2, "a"), (None, "b"), (4, "c")], "x int, y string")
    result = PercentOfNulls().run(ds)
    assert result.value == {"x": 0.25, "y": 0.25}


def test_percent_of_nulls_condition(spark):
    ds = _ds(spark, [(1,), (None,), (None,), (None,)], "x int")
    check = PercentOfNulls().add_condition_percent_of_nulls_not_greater_than(0.5)
    assert check.run(ds).conditions_results[0].category == ConditionCategory.FAIL


# -- MixedDataTypes (reference mixed_data_types_test.py style) --

def test_mixed_data_types(spark):
    rows = [("1",), ("2",), ("3",), ("4",), ("5",), ("6",), ("7",), ("8",), ("9",), ("word",)]
    ds = _ds(spark, rows, "col1 string")
    result = MixedDataTypes().run(ds)
    mix = result.value["col1"]
    assert mix["numbers"] == pytest.approx(0.9)
    assert mix["strings"] == pytest.approx(0.1)
    assert "word" in mix["strings_examples"]


def test_mixed_data_types_no_mix(spark):
    ds = _ds(spark, [("a",), ("b",)], "col1 string")
    assert MixedDataTypes().run(ds).value == {"col1": {}}


def test_mixed_data_types_danger_zone_condition(spark):
    rows = [(str(i),) for i in range(19)] + [("word",)]  # 5% strings → in (1%, 10%)
    ds = _ds(spark, rows, "col1 string")
    check = MixedDataTypes().add_condition_rare_type_ratio_not_in_range((0.01, 0.1))
    assert check.run(ds).conditions_results[0].category == ConditionCategory.WARN


# -- SpecialCharacters --

def test_special_characters(spark):
    rows = [("foo!",), ("bar",), ("!!!",), ("???",)]
    ds = _ds(spark, rows, "col1 string")
    result = SpecialCharacters().run(ds)
    assert result.value["col1"] == pytest.approx(0.5)


def test_special_characters_samples(spark):
    rows = [("ok",), ("!!!",), ("!!!",), ("#@$",)]
    ds = _ds(spark, rows, "col1 string")
    check = SpecialCharacters()
    samples = check.most_common_special_samples(ds, "col1")
    assert samples[0] == ("!!!", 2)


# -- ClassImbalance --

def test_class_imbalance(spark):
    rows = [("a",)] * 9 + [("b",)] * 1
    ds = _ds(spark, rows, "label string", label="label")
    result = ClassImbalance().run(ds)
    assert result.value == {"a": 0.9, "b": 0.1}


def test_class_imbalance_condition(spark):
    rows = [("a",)] * 9 + [("b",)] * 1
    ds = _ds(spark, rows, "label string", label="label")
    check = ClassImbalance().add_condition_class_ratio_less_than(0.1)
    assert check.run(ds).conditions_results[0].category == ConditionCategory.WARN


# -- ConflictingLabels --

def test_conflicting_labels(spark):
    rows = [
        (1, 2, "a"), (1, 2, "b"),     # conflict: 2 rows
        (3, 4, "a"), (3, 4, "a"),     # no conflict
        (5, 6, "c"),
    ]
    ds = _ds(spark, rows, "f1 int, f2 int, label string", label="label")
    result = ConflictingLabels().run(ds)
    assert result.value["percent"] == pytest.approx(0.4)
    v = result.violations.collect()
    assert len(v) == 1 and v[0]["labels"] == ["a", "b"]


# -- StringMismatch (reference string_mismatch_test.py style) --

def test_string_mismatch(spark):
    rows = [("OK",), ("ok",), ("OK.",), ("ok!",), ("other",)]
    ds = _ds(spark, rows, "col1 string")
    result = StringMismatch().run(ds)
    # reference value shape (string_mismatch.py:86-108): list of
    # {variant, count, percent} per baseform under 'columns'
    assert result.value["n_samples"] == 5
    variants = result.value["columns"]["col1"]["ok"]
    assert {v["variant"] for v in variants} == {"OK", "ok", "OK.", "ok!"}
    by_name = {v["variant"]: v for v in variants}
    assert by_name["OK"]["count"] == 1
    assert by_name["OK"]["percent"] == pytest.approx(0.2)


def test_string_mismatch_condition(spark):
    rows = [("OK",), ("ok",)]
    ds = _ds(spark, rows, "col1 string")
    check = StringMismatch().add_condition_no_variants()
    assert check.run(ds).conditions_results[0].category == ConditionCategory.WARN


# -- StringLengthOutOfBounds --

def test_string_length_out_of_bounds(spark):
    rows = [("x" * 10,)] * 200 + [("x" * 12,)] * 200 + [("x" * 500,)] * 3
    ds = _ds(spark, rows, "col1 string")
    result = StringLengthOutOfBounds().run(ds)
    info = result.value["col1"]
    assert len(info["outliers"]) == 1
    assert info["outliers"][0]["n_samples"] == 3
    assert info["outliers"][0]["range"]["min"] <= 500 <= info["outliers"][0]["range"]["max"]


def test_string_length_no_outliers(spark):
    rows = [("x" * (10 + i % 3),) for i in range(100)]
    ds = _ds(spark, rows, "col1 string")
    result = StringLengthOutOfBounds().run(ds)
    assert result.value["col1"]["outliers"] == []


def test_conflicting_labels_salted_matches_unsalted(spark):
    # Zipf-hot key: one feature-group holds most rows
    rows = [(1, 1, "a")] * 300 + [(1, 1, "b")] * 100 + [(2, 2, "a")] * 50 + [(3, 3, "c")] * 10
    ds = _ds(spark, rows, "f1 int, f2 int, label string", label="label")
    plain = ConflictingLabels().run(ds)
    salted = ConflictingLabels(salt_buckets=8).run(ds)
    assert salted.value == plain.value
    assert plain.value["percent"] == pytest.approx(400 / 460)
    pv = sorted((r["f1"], tuple(r["labels"])) for r in plain.violations.collect())
    sv = sorted((r["f1"], tuple(r["labels"])) for r in salted.violations.collect())
    assert pv == sv == [(1, ("a", "b"))]


# -- StringLengthOutOfBounds: compressed ordinal path --

def _detect_ordinal_expanded(check, value, c, lengths, counts, n):
    """Brute-force twin of the reference's per-sample ordinal percentile
    expansion (what round 1 did on the driver) — test oracle only."""
    import numpy as np
    from deepchecks_spark.checks.integrity import _outlier_sections

    cum = np.cumsum(counts)
    keys, vals = [], []
    start = 0
    for j in range(len(lengths)):
        ranks = np.arange(start + 1, cum[j] + 1, dtype=float)
        keys.append(100.0 * ranks / n)
        vals.append(np.full(len(ranks), lengths[j]))
        start = cum[j]
    keys = np.concatenate(keys)
    vals = np.concatenate(vals)
    sections = _outlier_sections(keys, vals, check.inner_quantile_range, check.outlier_factor)
    if not sections:
        return
    in_any = np.zeros(len(keys), dtype=bool)
    for a, b in sections:
        in_any |= (keys >= a) & (keys <= b)
    if in_any.all():
        return
    non_out_keys = keys[~in_any]
    lo_k, hi_k = non_out_keys.min(), non_out_keys.max()
    non_lower = vals[keys == lo_k][0]
    non_upper = vals[keys == hi_k][0]
    for a, b in sections:
        lo = vals[keys == a][0]
        hi = vals[keys == b][0]
        check._emit_outlier(value, c, lengths, counts, n, lo, hi, non_lower, non_upper)


def test_string_length_compressed_matches_expanded_randomized():
    import numpy as np

    check = StringLengthOutOfBounds()
    rng = np.random.default_rng(42)
    for trial in range(60):
        k = int(rng.integers(2, 40))
        lengths = np.sort(rng.choice(np.arange(1, 3000), size=k, replace=False)).astype(float)
        counts = rng.integers(1, 50, size=k).astype(np.int64)
        n = int(counts.sum())
        got, want = {"c": {"outliers": []}}, {"c": {"outliers": []}}
        check._detect_ordinal_compressed(got, "c", lengths, counts, n)
        _detect_ordinal_expanded(check, want, "c", lengths, counts, n)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_string_length_compressed_handles_billions_of_rows():
    # 10^9 total count, 200 distinct lengths: must run in O(nunique), not
    # O(n_rows) driver memory (VERDICT r1 §wrong-2)
    import time

    import numpy as np

    check = StringLengthOutOfBounds()
    lengths = np.arange(50, 250, dtype=float)
    counts = np.full(200, 5_000_000, dtype=np.int64)
    lengths = np.append(lengths, [50_000.0])
    counts = np.append(counts, [1_000])
    n = int(counts.sum())
    assert n > 1_000_000_000
    value = {"text": {"outliers": []}}
    t0 = time.time()
    check._detect_ordinal_compressed(value, "text", lengths, counts, n)
    assert time.time() - t0 < 0.5
    assert value["text"]["outliers"]
    assert value["text"]["outliers"][0]["n_samples"] == 1_000
    assert value["text"]["outliers"][0]["range"]["max"] >= 50_000.0


# -- cardinality gates (VERDICT r1 next-5) --

def test_categorical_histograms_caps_collected_categories(spark):
    from deepchecks_spark.drift.kernels import OTHER_CATEGORY_NAME
    from deepchecks_spark.drift.spark import categorical_histograms

    rows = [(f"v{i % 100:03d}",) for i in range(1000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "c string")
    h = categorical_histograms(df, ["c"], max_categories=5)["c"]
    assert len(h) == 6  # top-5 + Other roll-up
    assert h["hot"] == 500
    assert h[OTHER_CATEGORY_NAME] == 1500 - 500 - sum(
        v for k, v in h.items() if k not in ("hot", OTHER_CATEGORY_NAME))
    assert sum(h.values()) == 1500  # nothing lost
    # uncapped path unchanged
    full = categorical_histograms(df, ["c"])["c"]
    assert len(full) == 101 and sum(full.values()) == 1500


def test_string_mismatch_gates_high_cardinality(spark):
    rows = [(f"Value{i}",) for i in range(500)]
    ds = _ds(spark, rows, "col1 string")
    result = StringMismatch(max_distinct_to_check=100).run(ds)
    assert result.value["columns"] == {"col1": {}}  # gated, not collected
    # and the gate is off when None
    open_result = StringMismatch(max_distinct_to_check=None).run(ds)
    assert open_result.value["columns"]["col1"] == {}  # no actual variants in fixture


def test_string_mismatch_comparison_gates_high_cardinality(spark):
    from deepchecks_spark.checks.traintest import StringMismatchComparison

    train = _ds(spark, [(f"Value{i}",) for i in range(400)], "col1 string")
    test = _ds(spark, [(f"value{i}",) for i in range(400)], "col1 string")
    check = StringMismatchComparison(max_distinct_to_check=50)
    result = check.run(train, test)
    assert result.value == {"col1": {}}


# -- explicit n_samples cap semantics (VERDICT r1 next-7) --

def test_explicit_n_samples_caps_scan(spark):
    import pytest as _pytest

    rows = [(float(i), "x" * (i % 7 + 1)) for i in range(2000)]
    ds = _ds(spark, rows, "num double, s string")
    # default: full data (engine keeps fused full-scan semantics)
    full = PercentOfNulls().run(ds)
    assert full.value == {"num": 0.0, "s": 0.0}
    # explicit cap smaller than data: computed on a ~200-row Bernoulli
    # sample; deterministic across runs (same seed, same partitioning)
    r1 = DataDuplicates(columns=["s"], n_samples=200).run(ds)
    r2 = DataDuplicates(columns=["s"], n_samples=200).run(ds)
    assert r1.value == _pytest.approx(r2.value)
    full_dup = DataDuplicates(columns=["s"]).run(ds)
    # 7 distinct values; both full and sampled see ~100% duplicates
    assert full_dup.value == _pytest.approx(1 - 7 / 2000)
    assert r1.value > 0.9
    # stats-driven check on a sample: n_unique still correct on the sample
    sv = IsSingleValue(n_samples=300).run(ds)
    assert sv.value["s"] <= 7


def test_default_n_samples_not_enforced():
    check = PercentOfNulls()
    assert check.n_samples == 100_000  # reference default recorded
    assert check.enforce_n_samples is False
    explicit = PercentOfNulls(n_samples=100_000)
    assert explicit.enforce_n_samples is True
    unlimited = PercentOfNulls(n_samples=None)
    assert unlimited.enforce_n_samples is False


# -- ColumnsInfo + deprecated alias shims --

def test_columns_info_roles(spark):
    from deepchecks_spark.checks.integrity import ColumnsInfo
    from deepchecks_spark.dataset import Dataset

    df = spark.createDataFrame(
        [(1, "a", 1.5, "x")], "idx int, lab string, num double, txt string")
    ds = Dataset(df, label="lab", index_name="idx", infer_categorical=False)
    result = ColumnsInfo().run(ds)
    assert result.value == {
        "idx": "index", "lab": "label",
        "num": "numerical feature", "txt": "other feature",
    }


def test_deprecated_aliases_warn_and_delegate():
    import warnings

    from deepchecks_spark.checks import (
        CategoryMismatchTrainTest,
        FeatureDrift,
        LabelDrift,
        MultivariateDrift,
        NewCategoryTrainTest,
        TrainTestFeatureDrift,
        TrainTestLabelDrift,
        WholeDatasetDrift,
    )

    pairs = [
        (WholeDatasetDrift, MultivariateDrift),
        (CategoryMismatchTrainTest, NewCategoryTrainTest),
        (TrainTestFeatureDrift, FeatureDrift),
        (TrainTestLabelDrift, LabelDrift),
    ]
    for old_cls, new_cls in pairs:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            check = old_cls()
        assert isinstance(check, new_cls)
        assert any(issubclass(w.category, DeprecationWarning) for w in caught)
        assert new_cls.__name__ in str(caught[0].message)


def test_string_mismatch_ratio_variants_condition(spark):
    rows = [("OK",)] * 50 + [("ok",)] * 50 + [("other",)] * 900
    ds = _ds(spark, rows, "col1 string")
    strict = StringMismatch().add_condition_ratio_variants_less_or_equal(0.01)
    assert strict.run(ds).conditions_results[0].category == ConditionCategory.FAIL
    loose = StringMismatch().add_condition_ratio_variants_less_or_equal(0.2)
    assert loose.run(ds).conditions_results[0].category == ConditionCategory.PASS


def test_string_length_number_of_outliers_condition(spark):
    rows = [("x" * (20 + i),) for i in range(110)] * 4 + [("x" * 5000,)] * 3
    ds = _ds(spark, rows, "col1 string")
    strict = StringLengthOutOfBounds().add_condition_number_of_outliers_less_or_equal(0)
    assert strict.run(ds).conditions_results[0].category == ConditionCategory.FAIL
    loose = StringLengthOutOfBounds().add_condition_number_of_outliers_less_or_equal(10)
    assert loose.run(ds).conditions_results[0].category == ConditionCategory.PASS


def test_class_imbalance_gates_near_unique_label(spark):
    # VERDICT r2 §wrong-3: a near-unique label must raise instead of
    # collecting the full histogram driver-side.
    import pytest as _pytest
    from deepchecks_spark.checks.integrity import ClassImbalance

    df = spark.range(0, 3000).selectExpr("id", "cast(id as string) as lbl")
    ds = Dataset(df, label="lbl", infer_categorical=False)
    check = ClassImbalance()
    check.MAX_LABEL_CARDINALITY = 100
    with _pytest.raises(ValueError, match="distinct values"):
        check.run(ds)
