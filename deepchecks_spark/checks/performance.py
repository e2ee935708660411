"""Model-performance checks over a materialized predictions COLUMN.

The reference's model_evaluation suite calls ``model.predict`` inside
the check (model_evaluation/single_dataset_performance.py); at pipeline
scale predictions arrive as a column written by a separate scoring job,
so the engine evaluates the same metrics from (label, prediction)
columns directly: ONE ``groupBy(label, prediction).count()`` builds the
confusion matrix — bounded by n_classes² and map-side combinable — and
every metric is driver-side arithmetic on those cells. This completes
the predictions-column contract started by PredictionDrift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deepchecks_spark.core.checks import (
    USE_DEFAULT,
    SingleDatasetCheck,
    format_number,
    get_condition_passed_message,
)
from deepchecks_spark.core.result import ConditionCategory, ConditionResult

SUPPORTED_SCORERS = ("accuracy", "f1_weighted", "precision_macro", "recall_macro")


def scores_from_confusion(cells: dict, scorers) -> dict:
    """Metrics from confusion-matrix cells {(label, pred): count} —
    the same formulas as ml/metrics.py, expressed over counts so the
    raw rows never leave the executors. Zero-division conventions match
    sklearn's default (undefined precision/recall/F1 → 0)."""
    classes = sorted({y for y, _ in cells} | {p for _, p in cells}, key=str)
    total = sum(cells.values())
    tp = {c: cells.get((c, c), 0) for c in classes}
    true_n = {c: sum(n for (y, _), n in cells.items() if y == c) for c in classes}
    pred_n = {c: sum(n for (_, p), n in cells.items() if p == c) for c in classes}

    def precision(c):
        return tp[c] / pred_n[c] if pred_n[c] else 0.0

    def recall(c):
        return tp[c] / true_n[c] if true_n[c] else 0.0

    def f1(c):
        p, r = precision(c), recall(c)
        return 2 * p * r / (p + r) if (p + r) else 0.0

    out = {}
    for scorer in scorers:
        if scorer == "accuracy":
            out[scorer] = (sum(tp.values()) / total) if total else 0.0
        elif scorer == "f1_weighted":
            out[scorer] = (
                sum(f1(c) * true_n[c] for c in classes) / total if total else 0.0
            )
        elif scorer == "precision_macro":
            out[scorer] = sum(precision(c) for c in classes) / len(classes) if classes else 0.0
        elif scorer == "recall_macro":
            out[scorer] = sum(recall(c) for c in classes) / len(classes) if classes else 0.0
        else:
            raise ValueError(f"unsupported scorer {scorer!r}; supported: {SUPPORTED_SCORERS}")
    return out


class SingleDatasetPerformance(SingleDatasetCheck):
    """Classification metrics from (label, prediction) columns
    (engine analogue of reference model_evaluation/
    single_dataset_performance.py:47-120, with the model call replaced
    by the predictions-column contract). value = {scorer: score}."""

    # confusion cells are collected driver-side; bounded by label/pred
    # cardinality — same gate policy as ClassImbalance
    MAX_CONFUSION_CELLS = 1_000_000

    def __init__(self, prediction_column: str, scorers: list | None = None,
                 n_samples=USE_DEFAULT, **kw):
        super().__init__(n_samples=n_samples, **kw)
        self.prediction_column = prediction_column
        self.scorers = list(scorers) if scorers is not None else ["accuracy", "f1_weighted"]
        for s in self.scorers:
            if s not in SUPPORTED_SCORERS:
                raise ValueError(f"unsupported scorer {s!r}; supported: {SUPPORTED_SCORERS}")

    def compute(self, ctx, kind):
        ds = ctx.data(kind)
        if ds.label_name is None:
            raise ValueError("SingleDatasetPerformance requires a label column")
        df = self._effective_df(ctx, kind)
        y = F.col(f"`{ds.label_name}`")
        p = F.col(f"`{self.prediction_column}`")
        grouped = (
            df.filter(y.isNotNull() & p.isNotNull())
            .groupBy(y.alias("__y"), p.alias("__p"))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        cap = self.MAX_CONFUSION_CELLS
        rows = grouped.limit(cap + 1).collect()
        if len(rows) > cap:
            raise ValueError(
                f"{self.name()}: confusion matrix exceeds {cap} cells — label or "
                "prediction column is not classification-shaped"
            )
        cells = {(r["__y"], r["__p"]): r["__n"] for r in rows}
        return scores_from_confusion(cells, self.scorers), None

    def add_condition_greater_than(self, threshold: float, scorers: list | None = None):
        """reference single_dataset_performance.py add_condition_greater_than."""
        def condition(result):
            which = scorers if scorers is not None else list(result)
            failing = {s: format_number(result[s]) for s in which if result[s] <= threshold}
            if failing:
                return ConditionResult(
                    ConditionCategory.FAIL,
                    f"Found {len(failing)} scores below threshold: {failing}",
                )
            return ConditionResult(ConditionCategory.PASS,
                                   f"Passed for {len(which)} of {len(result)} scores")

        return self.add_condition(f"Selected metrics are greater than {threshold}", condition)

    def reduce_output(self, check_result) -> dict:
        """reference single_dataset_performance.py reduce_output: the
        scores themselves are the monitoring surface."""
        return dict(check_result.value)

    def greater_is_better(self) -> bool:
        return True
