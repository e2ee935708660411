from deepchecks_spark.core.result import (
    CheckResult,
    CheckFailure,
    Condition,
    ConditionCategory,
    ConditionResult,
)
from deepchecks_spark.core.checks import BaseCheck, SingleDatasetCheck, TrainTestCheck
from deepchecks_spark.core.context import Context
from deepchecks_spark.core.suite import Suite, SuiteResult

__all__ = [
    "CheckResult",
    "CheckFailure",
    "Condition",
    "ConditionCategory",
    "ConditionResult",
    "BaseCheck",
    "SingleDatasetCheck",
    "TrainTestCheck",
    "Context",
    "Suite",
    "SuiteResult",
]
