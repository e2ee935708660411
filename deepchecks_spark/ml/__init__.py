from deepchecks_spark.ml.tree import DecisionTree
from deepchecks_spark.ml.metrics import f1_weighted, mean_absolute_error, roc_auc
from deepchecks_spark.ml.pps import pps_score
from deepchecks_spark.ml.gbm import GradientBoostingBinary
from deepchecks_spark.ml.outliers import gower_matrix, loop_scores

__all__ = [
    "DecisionTree",
    "f1_weighted",
    "mean_absolute_error",
    "roc_auc",
    "pps_score",
    "GradientBoostingBinary",
    "gower_matrix",
    "loop_scores",
]
