from deepchecks_spark.checks.deprecated import (
    CategoryMismatchTrainTest,
    TrainTestFeatureDrift,
    TrainTestLabelDrift,
    WholeDatasetDrift,
)
from deepchecks_spark.checks.integrity import (
    ClassImbalance,
    ColumnsInfo,
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
from deepchecks_spark.checks.performance import (
    CalibrationScore,
    ConfusionMatrixReport,
    RocReport,
    SingleDatasetPerformance,
    TrainTestPerformance,
    WeakSegmentsPerformance,
)
from deepchecks_spark.checks.ml import (
    FeatureFeatureCorrelation,
    FeatureLabelCorrelation,
    FeatureLabelCorrelationChange,
    IdentifierLabelCorrelation,
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
    ReferentialIntegrity,
    StringMismatchComparison,
    TrainTestSamplesMix,
)

__all__ = [
    "ClassImbalance", "ColumnsInfo", "ConflictingLabels", "DataDuplicates",
    "IsSingleValue", "MixedDataTypes", "MixedNulls", "PercentOfNulls",
    "SpecialCharacters", "StringLengthOutOfBounds", "StringMismatch",
    "FeatureFeatureCorrelation", "FeatureLabelCorrelation",
    "FeatureLabelCorrelationChange", "IdentifierLabelCorrelation",
    "MultivariateDrift", "OutlierSampleDetection",
    "DatasetsSizeComparison", "DateTrainTestLeakageDuplicates",
    "DateTrainTestLeakageOverlap", "FeatureDrift", "IndexTrainTestLeakage",
    "LabelDrift", "NewCategoryTrainTest", "NewLabelTrainTest",
    "PredictionDrift", "ReferentialIntegrity", "SingleDatasetPerformance",
    "ConfusionMatrixReport", "TrainTestPerformance", "WeakSegmentsPerformance",
    "RocReport", "CalibrationScore",
    "StringMismatchComparison", "TrainTestSamplesMix",
    "WholeDatasetDrift", "CategoryMismatchTrainTest",
    "TrainTestFeatureDrift", "TrainTestLabelDrift",
]
