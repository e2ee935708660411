"""deepchecks_spark — a from-scratch, PySpark-native data-integrity and
train/test-validation (drift) engine with the check semantics of
deepchecks/deepchecks (reference at /root/reference, v0.18.0.dev1).

NOT a port: the reference executes eagerly in single-process pandas
(one check at a time, full materialized frames); this engine compiles a
suite of checks into a small number of fused Spark DataFrame passes
(one wide aggregation for all per-column stats, one melted string-value
pass, salted key passes for duplicates, broadcast semi/anti joins for
the train/test set ops, mergeable sketch-based drift kernels) so it
scales to trillion-row tables on a multi-executor cluster.

Public API mirrors the reference's shape (Dataset / Check / Condition /
Suite / CheckResult) — see SURVEY.md for the file:line mapping.
"""

from deepchecks_spark.dataset import DatasetSpec, Dataset
from deepchecks_spark.core.result import (
    CheckResult,
    CheckFailure,
    ConditionCategory,
    ConditionResult,
)
from deepchecks_spark.core.suite import Suite, SuiteResult
from deepchecks_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "Dataset",
    "DatasetSpec",
    "CheckResult",
    "CheckFailure",
    "ConditionCategory",
    "ConditionResult",
    "Suite",
    "SuiteResult",
    "get_spark",
]
