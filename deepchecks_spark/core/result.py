"""Check results and conditions.

Mirrors the reference's core objects (semantics, not code):
  * CheckResult / CheckFailure  → reference deepchecks/core/check_result.py:114
  * Condition / ConditionResult → reference deepchecks/core/condition.py:24,65
  * ConditionCategory           → reference deepchecks/core/condition.py:14-21

``value`` is a plain JSON-able python object (dict/float/list) computed
by collecting a *tiny* aggregate from Spark; conditions are pure-python
predicates over it and run on the driver, exactly like the reference.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Callable


class ConditionCategory(enum.Enum):
    """Pass/fail taxonomy (reference core/condition.py:14-21)."""

    PASS = "PASS"
    FAIL = "FAIL"
    WARN = "WARN"
    ERROR = "ERROR"


@dataclass
class ConditionResult:
    category: ConditionCategory
    details: str = ""
    name: str = ""

    @property
    def is_pass(self) -> bool:
        return self.category == ConditionCategory.PASS

    def __repr__(self) -> str:  # pragma: no cover
        return f"ConditionResult({self.category.value}, {self.name!r}: {self.details!r})"


@dataclass
class Condition:
    """Named predicate over a check's result value
    (reference core/condition.py:24-52).

    ``builder``/``builder_kwargs`` record which ``add_condition_*``
    default builder created this condition (when one did), so a suite
    rebuilt from config() re-attaches the condition with the SAME
    threshold arguments instead of silently dropping it."""

    name: str
    function: Callable[[Any], ConditionResult]
    params: dict = field(default_factory=dict)
    builder: str | None = None
    builder_kwargs: dict | None = None

    def __call__(self, value) -> ConditionResult:
        result = self.function(value, **self.params)
        result.name = self.name
        return result


@dataclass
class CheckResult:
    """Outcome of one check run (reference core/check_result.py:114).

    ``violations`` optionally carries a *Spark DataFrame* of offending
    rows ``(check, column, offending_value, count, percent,
    partition_id)`` — the scale-friendly replacement for the
    reference's display frames.
    """

    value: Any
    header: str = ""
    check: Any = None
    conditions_results: list[ConditionResult] = field(default_factory=list)
    violations: Any = None  # pyspark DataFrame | None
    run_time: float = 0.0

    def process_conditions(self) -> None:
        """Evaluate the parent check's conditions against ``value``
        (reference core/check_result.py:156-158 + core/checks.py:75-91):
        an exception inside a condition → ERROR, never propagates."""
        self.conditions_results = []
        if self.check is None:
            return
        for cond in self.check.conditions:
            try:
                self.conditions_results.append(cond(self.value))
            except Exception as exc:  # noqa: BLE001 — reference checks.py:82-84
                self.conditions_results.append(
                    ConditionResult(ConditionCategory.ERROR, f"{type(exc).__name__}: {exc}", cond.name)
                )

    def passed_conditions(self, fail_if_warning: bool = True) -> bool:
        bad = {ConditionCategory.FAIL, ConditionCategory.ERROR}
        if fail_if_warning:
            bad.add(ConditionCategory.WARN)
        return not any(c.category in bad for c in self.conditions_results)

    def have_conditions(self) -> bool:
        return bool(self.check is not None and self.check.conditions)

    def __repr__(self) -> str:  # pragma: no cover
        return f"CheckResult({self.header!r}, value={self.value!r})"


@dataclass
class CheckFailure:
    """A check that raised — isolated, never aborts the suite
    (reference tabular/suite.py:122-123,148-149)."""

    check: Any
    exception: Exception
    header: str = ""

    def __repr__(self) -> str:  # pragma: no cover
        return f"CheckFailure({self.header!r}: {self.exception!r})"
