"""Metric-history anomaly detection (Deequ-style, VLDB'18 "Automating
large-scale data quality verification" — public semantics, no code
derived): after every validation run, the runner appends the run's
global metrics to a ``metrics_history`` table; this check scores the
LATEST value of each metric against its own trailing history with the
standard strategy set —

* ``max_relative_change`` — |(v_t − v_{t−1}) / v_{t−1}| bound
  (Deequ RelativeRateOfChangeStrategy)
* ``z_threshold``         — |v_t − mean(history)| / std(history) bound
  (Deequ OnlineNormalStrategy shape, sample std)
* ``min_value`` / ``max_value`` — absolute bounds

The reference has no run-over-run memory (each deepchecks suite run is
stateless over in-memory frames); anomaly-over-history is part of this
engine's production-validation surface.

Scale shape: ONE ``groupBy(metric)`` over the history table. Per-metric
state is the run history itself — bounded by the number of validation
RUNS (not data size; thousands at most) and further clamped to the
trailing ``max_runs`` entries inside the aggregation, so the collected
array is O(max_runs) per metric no matter how long the table grows.
All arithmetic is JVM higher-order functions on that array; no Python,
no window over the full table, one Exchange total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANOMALY_RULES = ("max_relative_change", "z_threshold", "min_value", "max_value")


def _round6(c: Column) -> Column:
    return F.round(c, 6)


def metric_anomalies(
    history: DataFrame,
    metric_col: str = "metric",
    ts_col: str = "run_ts",
    value_col: str = "value",
    max_relative_change: float | None = None,
    z_threshold: float | None = None,
    min_value: float | None = None,
    max_value: float | None = None,
    min_history: int = 3,
    max_runs: int = 1000,
) -> DataFrame:
    """Score the newest value of every metric against its trailing
    history. Returns one row per metric:

    ``(metric, latest_ts, latest_value, prev_value, n_hist, rel_change,
    mean_hist, std_hist, z_score, failed_rules, status)``

    Rule evaluation (a rule that cannot be evaluated does not fire):

    * ``rel_change`` needs ≥1 prior run with a non-zero previous value;
    * ``z_score`` needs ≥``min_history`` prior runs and non-zero sample
      std over them;
    * absolute bounds always evaluate.

    ``status`` is ``FAIL`` iff any enabled rule fires; ``failed_rules``
    names them (comma-joined, stable order). Floats are rounded to 6
    decimals for cross-engine determinism.
    """
    h = history.select(
        F.col(metric_col).alias("metric"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col(ts_col).isNotNull())

    grouped = h.groupBy("metric").agg(
        F.sort_array(F.collect_list(F.struct("ts", "v"))).alias("runs"))
    # clamp to the trailing max_runs entries (newest-biased slice)
    grouped = grouped.withColumn(
        "runs",
        F.expr(f"slice(runs, greatest(1, size(runs) - {int(max_runs)} + 1), "
               f"{int(max_runs)})"))

    latest = F.element_at("runs", -1)
    prev = F.when(F.size("runs") >= 2, F.element_at("runs", -2))
    hist = F.expr("slice(runs, 1, size(runs) - 1)")

    df = grouped.select(
        "metric",
        latest["ts"].alias("latest_ts"),
        latest["v"].alias("latest_value"),
        prev["v"].alias("prev_value"),
        F.size(hist).cast("long").alias("n_hist"),
        F.aggregate(hist, F.lit(0.0), lambda a, x: a + x["v"]).alias("_sum"),
        F.aggregate(hist, F.lit(0.0), lambda a, x: a + x["v"] * x["v"]).alias("_sum2"),
    )
    mean = F.when(F.col("n_hist") > 0, F.col("_sum") / F.col("n_hist"))
    var_samp = F.when(
        F.col("n_hist") >= 2,
        F.greatest(
            (F.col("_sum2") - F.col("n_hist") * mean * mean) / (F.col("n_hist") - 1),
            F.lit(0.0)))
    std = F.sqrt(var_samp)
    rel = F.when(
        F.col("prev_value").isNotNull() & (F.col("prev_value") != 0),
        (F.col("latest_value") - F.col("prev_value")) / F.abs(F.col("prev_value")))
    z = F.when(
        (F.col("n_hist") >= int(min_history)) & std.isNotNull() & (std > 0),
        (F.col("latest_value") - mean) / std)

    df = df.select(
        "metric", "latest_ts", "latest_value", "prev_value", "n_hist",
        _round6(rel).alias("rel_change"),
        _round6(mean).alias("mean_hist"),
        _round6(std).alias("std_hist"),
        _round6(z).alias("z_score"),
    )

    fired = []
    if max_relative_change is not None:
        fired.append(F.when(
            F.col("rel_change").isNotNull()
            & (F.abs(F.col("rel_change")) > float(max_relative_change)),
            F.lit("max_relative_change")))
    if z_threshold is not None:
        fired.append(F.when(
            F.col("z_score").isNotNull()
            & (F.abs(F.col("z_score")) > float(z_threshold)),
            F.lit("z_threshold")))
    if min_value is not None:
        fired.append(F.when(F.col("latest_value") < float(min_value),
                            F.lit("min_value")))
    if max_value is not None:
        fired.append(F.when(F.col("latest_value") > float(max_value),
                            F.lit("max_value")))
    failed = (F.concat_ws(",", *fired) if fired else F.lit("")).alias("failed_rules")
    df = df.withColumn("failed_rules", failed)
    return df.withColumn(
        "status",
        F.when(F.col("failed_rules") == "", F.lit("PASS")).otherwise(F.lit("FAIL")))
