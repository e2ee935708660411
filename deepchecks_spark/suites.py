"""Default suites mirroring the reference's suite builders
(reference deepchecks/tabular/suites/default_suites.py: data_integrity,
train_test_validation, full_suite) — same check composition, default
conditions attached.
"""

from __future__ import annotations

from deepchecks_spark.core.suite import Suite
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
from deepchecks_spark.checks.ml import (
    FeatureFeatureCorrelation,
    FeatureLabelCorrelation,
    FeatureLabelCorrelationChange,
    MultivariateDrift,
    OutlierSampleDetection,
)
from deepchecks_spark.checks.traintest import (
    DatasetsSizeComparison,
    DateTrainTestLeakageDuplicates,
    DateTrainTestLeakageOverlap,
    FeatureDrift,
    IndexTrainTestLeakage,
    LabelDrift,
    NewCategoryTrainTest,
    NewLabelTrainTest,
    PredictionDrift,
    StringMismatchComparison,
    TrainTestSamplesMix,
)


def data_integrity(label: bool = False, **kwargs) -> Suite:
    """Integrity suite (reference default_suites.py data_integrity)."""
    checks = [
        IsSingleValue().add_condition_not_single_value(),
        SpecialCharacters().add_condition_ratio_of_special_characters_less_or_equal(),
        MixedNulls().add_condition_different_nulls_less_equal_to(),
        MixedDataTypes().add_condition_rare_type_ratio_not_in_range(),
        StringMismatch().add_condition_no_variants(),
        DataDuplicates().add_condition_ratio_less_or_equal(),
        StringLengthOutOfBounds().add_condition_ratio_of_outliers_less_or_equal(),
        OutlierSampleDetection().add_condition_outlier_ratio_less_or_equal(),
        PercentOfNulls().add_condition_percent_of_nulls_not_greater_than(),
        FeatureFeatureCorrelation().add_condition_max_number_of_pairs_above_threshold(),
    ]
    if label:
        checks += [
            ConflictingLabels().add_condition_ratio_of_conflicting_labels_less_or_equal(),
            ClassImbalance().add_condition_class_ratio_less_than(),
            FeatureLabelCorrelation().add_condition_feature_pps_less_than(),
        ]
    return Suite("Data Integrity Suite", *checks)


def train_test_validation(label: bool = False, **kwargs) -> Suite:
    """Train/test validation suite (reference default_suites.py
    train_test_validation)."""
    checks = [
        DatasetsSizeComparison().add_condition_test_train_size_ratio_greater_than(),
        DateTrainTestLeakageDuplicates().add_condition_leakage_ratio_less_or_equal(),
        DateTrainTestLeakageOverlap().add_condition_leakage_ratio_less_or_equal(),
        IndexTrainTestLeakage().add_condition_ratio_less_or_equal(),
        TrainTestSamplesMix().add_condition_duplicates_ratio_less_or_equal(),
        NewCategoryTrainTest().add_condition_new_category_ratio_less_or_equal(),
        StringMismatchComparison().add_condition_no_new_variants(),
        FeatureDrift().add_condition_drift_score_less_than(),
        MultivariateDrift().add_condition_overall_drift_value_less_than(),
    ]
    if label:
        checks += [
            NewLabelTrainTest().add_condition_new_labels_number_less_or_equal(),
            LabelDrift().add_condition_drift_score_less_than(),
            FeatureLabelCorrelationChange().add_condition_feature_pps_difference_less_than(),
        ]
    return Suite("Train Test Validation Suite", *checks)


def production_suite(is_comparative: bool = True, prediction_column: str | None = None,
                     task_type: str | None = None,
                     probability_columns: dict | None = None, **kwargs) -> Suite:
    """The reference production_suite (default_suites.py:333-460),
    composed identically — with the model_evaluation members driven by
    the predictions-column contract instead of a fitted sklearn model:
    pass ``prediction_column`` (and optionally ``task_type`` ∈
    {'classification', 'regression'} and per-class
    ``probability_columns`` for RocReport) to enable them. Without a
    prediction column, only the data-only members run."""
    checks = [PercentOfNulls().add_condition_percent_of_nulls_not_greater_than()]
    if prediction_column:
        from deepchecks_spark.checks.performance import (
            ConfusionMatrixReport,
            RegressionErrorDistribution,
            RocReport,
            SingleDatasetPerformance,
            TrainTestPerformance,
            WeakSegmentsPerformance,
        )

        checks.append(
            WeakSegmentsPerformance(prediction_column)
            .add_condition_segments_relative_performance_greater_than())
        if task_type == "regression":
            checks += [
                SingleDatasetPerformance(prediction_column, scorers=["rmse", "mae"]),
                RegressionErrorDistribution(prediction_column)
                .add_condition_kurtosis_greater_than(),
            ]
        else:  # classification (the reference adds both sets when unknown;
            # a predictions column without probabilities is classification-
            # shaped here, so default to the classification members)
            checks += [
                SingleDatasetPerformance(prediction_column),
                ConfusionMatrixReport(prediction_column),
            ]
            if probability_columns:
                from deepchecks_spark.checks.performance import CalibrationScore

                checks += [
                    RocReport(probability_columns).add_condition_auc_greater_than(),
                    CalibrationScore(probability_columns),
                ]
    if is_comparative:
        checks += [
            StringMismatchComparison().add_condition_no_new_variants(),
            FeatureLabelCorrelationChange().add_condition_feature_pps_difference_less_than(),
            FeatureDrift().add_condition_drift_score_less_than(),
            MultivariateDrift().add_condition_overall_drift_value_less_than(),
            LabelDrift(ignore_na=True).add_condition_drift_score_less_than(),
            NewCategoryTrainTest().add_condition_new_category_ratio_less_or_equal(),
        ]
        if prediction_column:
            # regression labels are continuous: the per-class classification
            # defaults would blow the confusion-cell gate, so pick the
            # matching scorer family (reference selects scorers by task_type)
            ttp_scorers = ["rmse", "mae"] if task_type == "regression" else None
            checks += [
                PredictionDrift(prediction_column).add_condition_drift_score_less_than(),
                TrainTestPerformance(prediction_column, scorers=ttp_scorers)
                .add_condition_train_test_relative_degradation_less_than(),
            ]
    else:
        checks += [
            StringMismatch().add_condition_no_variants(),
            FeatureLabelCorrelation().add_condition_feature_pps_less_than(),
            FeatureFeatureCorrelation().add_condition_max_number_of_pairs_above_threshold(),
        ]
    return Suite("Production Suite", *checks)


def full_suite(label: bool = False, **kwargs) -> Suite:
    """Integrity + train/test validation in one suite (reference
    full_suite minus the model_evaluation section, which is out of scope
    — it requires a fitted sklearn model, SURVEY.md scope note)."""
    s = Suite(
        "Full Suite",
        *data_integrity(label=label).checks,
        *train_test_validation(label=label).checks,
    )
    return s
