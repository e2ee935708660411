"""Suite runner job: the spark-submit entry producing the north rule's
output surface —

  * ``verdicts``            global (check, condition, category, details)
  * ``partition_verdicts``  the SAME conditions evaluated per input
                            partition (pass/fail lineage per partition)
  * ``violations``          offending rows: (check, column,
                            offending_value, count, percent, partition_id)
  * ``metrics``             per-partition per-column statistics table
  * ``constraint_verdicts`` (with --constraints) declarative contract
  * ``anomaly_verdicts``    (with --metrics-history) Deequ-style
                            metric-over-run-history anomaly scores
  * ``suggested_constraints`` (with --suggest-constraints) profiled
                            contract suggestions (pin as --constraints)

with snapshot-pinned checkpoint/resume: a manifest records the input
fingerprint and completed stages; re-running with the same input skips
completed stages, a changed input invalidates them.

Run via:  spark-submit --py-files dist/deepchecks_spark.zip -m ...  or
          python -m deepchecks_spark.runner --input ... --output ...
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deepchecks_spark.core.checks import get_condition_passed_message
from deepchecks_spark.core.context import Context
from deepchecks_spark.core.result import CheckFailure
from deepchecks_spark.dataset import Dataset
from deepchecks_spark.functions.strings import (
    baseform_expr,
    is_null_string_expr,
    is_special_only_expr,
)
from deepchecks_spark.io import read_table, snapshot_fingerprint, write_table
from deepchecks_spark.stats import compute_column_stats_by_partition

VIOLATIONS_SCHEMA = (
    "check string, column string, offending_value string, count long, "
    "percent double, partition_id int"
)

# Hard ceiling on rows any per-partition histogram pass may collect to
# the driver, regardless of partition count (ADVICE r2, runner.py:216).
ABS_DRIFT_COLLECT_CAP = 2_000_000


# ---------------------------------------------------------------------------
# per-partition verdicts
# ---------------------------------------------------------------------------

def partition_verdicts(ds: Dataset, checks: list, per_part: dict | None = None) -> list:
    """Evaluate each stats-driven check's conditions on every input
    partition's own statistics (ONE grouped aggregation pass for all
    partitions × all columns; reference parity = running deepchecks on
    each partition's pandas slice, FIXTURES.md §F3)."""
    if per_part is None:
        per_part = compute_column_stats_by_partition(ds.df, ds.columns)
    rows = []
    for pid, stats in sorted(per_part.items()):
        fake_ctx = _StatsOnlyContext(ds, stats)
        for check in checks:
            try:
                value, _ = check.compute(fake_ctx, "train")
            except Exception as exc:  # noqa: BLE001 — per-check isolation
                rows.append((pid, check.header(), "<error>", "ERROR", repr(exc)))
                continue
            for cond in check.conditions:
                try:
                    res = cond(value)
                    rows.append((pid, check.header(), cond.name, res.category.value, res.details))
                except Exception as exc:  # noqa: BLE001
                    rows.append((pid, check.header(), cond.name, "ERROR", repr(exc)))
    return rows


def mixed_nulls_partition_rows(df: DataFrame, string_cols: list, per_part: dict,
                               max_allowed_null_types: int = 1,
                               flagged: DataFrame | None = None) -> list:
    """Per-partition MixedNulls verdicts: one melted, pre-filtered pass
    counts distinct string null-representations per (partition, column);
    real-null presence comes from the per-partition stats. The condition
    (distinct null types ≤ max) is then evaluated per partition —
    matching a per-slice reference run exactly.

    ``flagged``: the shared :func:`flagged_string_values` frame — its
    MixedNulls rows are one row per distinct (partition, column,
    null-representation), so the per-(pid, col) row count IS the
    distinct-representation count and the KB-text melt+regex scan is
    not repeated here."""
    rows = []
    repr_counts: dict = {}
    if string_cols:
        if flagged is not None:
            grouped = (flagged.filter(F.col("check") == "MixedNulls")
                       .groupBy("__pid", "column")
                       .agg(F.count(F.lit(1)).alias("n_reprs")))
        else:
            melted = df.withColumn("__pid", F.spark_partition_id()).selectExpr(
                "__pid",
                f"stack({len(string_cols)}, "
                + ", ".join(f"'{c}', `{c}`" for c in string_cols)
                + ") as (column, value)",
            ).filter(F.col("value").isNotNull() & is_null_string_expr(F.col("value")))
            grouped = melted.groupBy("__pid", "column").agg(
                F.countDistinct("value").alias("n_reprs"))
        for r in grouped.collect():
            repr_counts[(r["__pid"], r["column"])] = r["n_reprs"]
    cond_name = f"Number of different null types is less or equal to {max_allowed_null_types}"
    for pid, stats in sorted(per_part.items()):
        failing = {}
        for col, st in stats.per_column.items():
            n_types = repr_counts.get((pid, col), 0)
            if st.get("null_count", 0) > 0:
                n_types += 1
            if st.get("nan_count"):
                n_types += 1
            if n_types > max_allowed_null_types:
                failing[col] = n_types
        if failing:
            rows.append((pid, "Mixed Nulls", cond_name, "FAIL",
                         f"Found {len(failing)} out of {len(stats.per_column)} columns with amount of "
                         f"null types above threshold: {failing}"))
        else:
            rows.append((pid, "Mixed Nulls", cond_name, "PASS",
                         get_condition_passed_message(stats.per_column)))
    return rows


def duplicates_partition_rows(df: DataFrame, cols: list, max_ratio: float = 0.0,
                              approx: bool = True) -> list:
    """Per-partition DataDuplicates verdicts (ROADMAP #2): duplicate
    ratio within each input partition, condition evaluated per partition.

    Row identity is xxhash64 over the selected columns (the payload-hash
    trick — KB-sized text never shuffles). ``approx=True`` (default, the
    corpus-scale shape) counts distinct hashes with a mergeable HLL
    sketch; exact countDistinct is available for fixture parity. Since
    the group key contains the partition id, the heavy reduction is
    map-side local either way.
    """
    from deepchecks_spark.core.checks import format_percent

    h = F.xxhash64(*[F.col(f"`{c}`") for c in cols])
    # A zero tolerance needs an EXACT distinct count: the HLL sketch's
    # ±rsd (5%) can undercount a duplicate-free partition → spurious
    # FAIL, or mask up to ~5% real duplicates as PASS (ADVICE r2).
    # countDistinct stays map-side local here — __pid is in the group
    # key and only 16-byte hashes shuffle.
    if max_ratio == 0.0:
        approx = False
    d_expr = F.approx_count_distinct("__h") if approx else F.countDistinct("__h")
    per = (
        df.withColumn("__pid", F.spark_partition_id()).withColumn("__h", h)
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"), d_expr.alias("d"))
        .collect()
    )
    cond_name = f"Duplicate data ratio is less or equal to {format_percent(max_ratio)}"
    rows = []
    for r in sorted(per, key=lambda row: row["__pid"]):
        # HLL can overcount slightly → clamp the ratio at 0
        ratio = max(0.0, 1 - r["d"] / r["n"]) if r["n"] else 0.0
        category = "PASS" if ratio <= max_ratio else "FAIL"
        rows.append((r["__pid"], "Data Duplicates", cond_name, category,
                     f"Found {format_percent(ratio)} duplicate data"))
    return rows


def conflicting_labels_partition_rows(df: DataFrame, feature_cols: list, label_col: str,
                                      max_ratio: float = 0.0) -> list:
    """Per-partition ConflictingLabels verdicts (ROADMAP #2, last item):
    within each input partition, the fraction of rows in feature-groups
    carrying more than one distinct label. The group key contains the
    partition id, so the two-stage aggregation's heavy reduction is
    map-side local; only (pid, features)-level rows shuffle."""
    from deepchecks_spark.core.checks import format_percent

    fcols = [F.col(f"`{c}`") for c in feature_cols]
    grouped = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy(F.col("__pid"), *fcols)
        .agg(F.countDistinct(F.col(f"`{label_col}`")).alias("n_labels"),
             F.count(F.lit(1)).alias("n_rows"))
    )
    per = (
        grouped.groupBy("__pid")
        .agg(
            F.coalesce(F.sum(F.when(F.col("n_labels") > 1, F.col("n_rows"))), F.lit(0))
            .alias("ambiguous"),
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("total"),
        )
        .collect()
    )
    cond_name = f"Ambiguous sample ratio is less or equal to {format_percent(max_ratio)}"
    rows = []
    for r in sorted(per, key=lambda row: row["__pid"]):
        ratio = (r["ambiguous"] / r["total"]) if r["total"] else 0.0
        category = "PASS" if ratio <= max_ratio else "FAIL"
        rows.append((r["__pid"], "Conflicting Labels", cond_name, category,
                     f"Ratio of samples with conflicting labels: {format_percent(ratio)}"))
    return rows


def new_category_partition_rows(test_df: DataFrame, train_df: DataFrame, cat_cols: list,
                                max_ratio: float = 0.0,
                                max_categories: int = 10_000) -> list:
    """Per-partition NewCategoryTrainTest verdicts (VERDICT r3 next-8):
    within each TEST partition, the ratio of rows whose category value
    (per column) never occurs in the reference/train side — the batch
    check's condition (checks/traintest.py:542) evaluated per partition.

    Scale shape: the train side reduces to its DISTINCT melted
    (column, value) pairs — bounded by the same cardinality gate as the
    batch check (columns above ``max_categories`` approx-distinct are
    skipped) and broadcast; the test side is ONE melted pass with the
    partition id in the group key, so the heavy reduction is map-side
    local and only (pid, column) counter rows reach the driver.
    """
    from deepchecks_spark.core.checks import format_percent

    if not cat_cols:
        return []
    approx = train_df.agg(
        *[F.approx_count_distinct(f"`{c}`").alias(c) for c in cat_cols]).first()
    cols = [c for c in cat_cols if (approx[c] or 0) <= max_categories]
    if not cols:
        return []
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    stack_expr = f"stack({len(cols)}, {pairs}) as (column, value)"
    train_vals = (
        train_df.selectExpr(stack_expr)
        .filter(F.col("value").isNotNull()).distinct()
        .withColumn("__seen", F.lit(1))
    )
    melted = (
        test_df.withColumn("__pid", F.spark_partition_id())
        .selectExpr("__pid", stack_expr)
        .filter(F.col("value").isNotNull())
    )
    per = (
        melted.join(F.broadcast(train_vals), ["column", "value"], "left")
        .groupBy("__pid", "column")
        .agg(F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0)).alias("n_new"))
        .collect()
    )
    totals = {r["__pid"]: r["count"] for r in
              test_df.withColumn("__pid", F.spark_partition_id())
              .groupBy("__pid").count().collect()}
    new_by_pid: dict = {pid: {} for pid in totals}
    for r in per:
        new_by_pid.setdefault(r["__pid"], {})[r["column"]] = r["n_new"]
    cond_name = (f"Ratio of samples with a new category is less or equal to "
                 f"{format_percent(max_ratio)}")
    rows = []
    for pid in sorted(new_by_pid):
        n_rows = totals.get(pid, 0)
        failing = {}
        for col in cols:
            ratio = (new_by_pid[pid].get(col, 0) / n_rows) if n_rows else 0.0
            if ratio > max_ratio:
                failing[col] = format_percent(ratio)
        if failing:
            rows.append((pid, "New Category Train Test", cond_name, "FAIL",
                         f"Found {len(failing)} out of {len(cols)} columns with ratio "
                         f"of new category samples above threshold: {failing}"))
        else:
            rows.append((pid, "New Category Train Test", cond_name, "PASS",
                         get_condition_passed_message(cols)))
    return rows


def performance_partition_rows(df: DataFrame, label_col: str, prediction_column: str,
                               threshold: float = 0.5,
                               task: str = "classification",
                               mae_factor: float = 2.0) -> list:
    """Per-partition SingleDatasetPerformance verdicts (VERDICT r4
    next-5): classification = the batch accuracy condition evaluated on
    every input partition's own rows; regression = each partition's MAE
    compared against ``mae_factor`` × the global MAE (anomalous-shard
    detection, the drift_partition_rows convention — regression errors
    have no natural absolute threshold).

    Scale shape: ONE extra group key (spark_partition_id) on the
    correctness pass — a single scan reducing to one counter row per
    partition map-side, so driver state is O(partitions) regardless of
    row count or label cardinality (no confusion cells needed: accuracy
    and MAE are distributive pairs). The group keys come from the
    UNFILTERED frame, so a partition whose every row has a null
    label/prediction still gets a row — an ERROR verdict, since a fully
    unscored shard is exactly the corrupt-partition case this surface
    exists to catch."""
    from deepchecks_spark.core.checks import format_number

    y = F.col(f"`{label_col}`")
    p = F.col(f"`{prediction_column}`")
    usable = y.isNotNull() & p.isNotNull()
    if task == "regression":
        d = p.cast("double") - y.cast("double")
        score_agg = F.sum(F.when(usable, F.abs(d)).otherwise(F.lit(0.0))).alias("s")
    else:
        score_agg = F.sum(F.when(usable & (y == p), 1).otherwise(0)
                          .cast("long")).alias("s")
    per = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n_total"),
             F.sum(usable.cast("long")).alias("n"),
             score_agg)
        .collect()
    )
    rows = []
    if task == "regression":
        tot_n = sum(r["n"] for r in per)
        global_mae = (sum(r["s"] for r in per) / tot_n) if tot_n else 0.0
        cond_name = (f"Partition MAE not greater than {mae_factor}x "
                     "the global MAE")
    else:
        cond_name = f"Selected metrics are greater than {threshold}"
    for r in sorted(per, key=lambda r: r["__pid"]):
        if not r["n"]:
            rows.append((r["__pid"], "Single Dataset Performance", cond_name,
                         "ERROR",
                         f"no scored rows: all {r['n_total']} rows have null "
                         "label or prediction"))
            continue
        if task == "regression":
            mae = r["s"] / r["n"]
            if global_mae and mae > mae_factor * global_mae:
                rows.append((r["__pid"], "Single Dataset Performance", cond_name,
                             "FAIL",
                             f"partition MAE {format_number(mae)} vs global "
                             f"{format_number(global_mae)}"))
            else:
                rows.append((r["__pid"], "Single Dataset Performance", cond_name,
                             "PASS", f"partition MAE {format_number(mae)}"))
            continue
        acc = r["s"] / r["n"]
        if acc <= threshold:
            failing = {"accuracy": format_number(acc)}  # batch dict-repr parity
            rows.append((r["__pid"], "Single Dataset Performance", cond_name, "FAIL",
                         f"Found 1 scores below threshold: {failing}"))
        else:
            rows.append((r["__pid"], "Single Dataset Performance", cond_name, "PASS",
                         "Passed for 1 of 1 scores"))
    return rows


def samples_mix_partition_rows(test_df: DataFrame, train_df: DataFrame, cols: list,
                               max_ratio: float = 0.05) -> list:
    """Per-partition TrainTestSamplesMix verdicts (VERDICT r3 next-8):
    the fraction of each TEST partition's rows that also occur in the
    reference/train data — the batch condition
    (checks/traintest.py:823) per partition.

    Scale shape: row identity is xxhash64 over the selected columns
    (the payload-hash trick — KB text never shuffles); the train side
    reduces to distinct 8-byte hashes, the test side tags each hash
    with its partition id, and the equi-join + groupBy(pid) keep the
    shuffle at hash width. AQE skew-join splits Zipf-duplicated keys.
    """
    from deepchecks_spark.core.checks import format_percent

    h = F.xxhash64(*[F.col(f"`{c}`") for c in cols])
    train_h = train_df.select(h.alias("__h")).distinct().withColumn("__seen", F.lit(1))
    per = (
        test_df.withColumn("__pid", F.spark_partition_id())
        .select("__pid", h.alias("__h"))
        .join(train_h, "__h", "left")
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.when(F.col("__seen").isNotNull(), 1).otherwise(0)).alias("n_mixed"))
        .collect()
    )
    cond_name = (f"Percentage of test data samples that appear in train data is less "
                 f"or equal to {format_percent(max_ratio)}")
    rows = []
    for r in sorted(per, key=lambda row: row["__pid"]):
        ratio = (r["n_mixed"] / r["n"]) if r["n"] else 0.0
        details = (f"Percent of test data samples that appear in train data: "
                   f"{format_percent(ratio)}" if ratio else "No samples mix found")
        category = "PASS" if ratio <= max_ratio else "FAIL"
        rows.append((r["__pid"], "Train Test Samples Mix", cond_name, category, details))
    return rows


def drift_partition_rows(df: DataFrame, cat_cols: list, reference_hists: dict | None = None,
                         max_psi: float = 0.2, max_categories: int = 10_000) -> list:
    """Per-partition categorical drift verdicts (ROADMAP #2): ONE melted
    pass aggregates (partition, column, value) counts, then each
    partition's histogram is PSI-scored against a reference histogram —
    by default the GLOBAL histogram of the same data (derived driver-side
    from the per-partition counts, no second scan), which flags
    anomalous shards: a partition whose distribution diverges from the
    corpus (bad crawl segment, mis-partitioned ingest) FAILs while
    healthy partitions PASS. Pass ``reference_hists`` (e.g. the previous
    snapshot's histograms) for drift-against-history semantics.

    Scale shape: identical to the batch categorical-histogram pass plus
    the partition id in the group key — mergeable partial counts, output
    bounded by partitions × category cardinality (collect guarded by
    ``max_categories`` per column like categorical_histograms).
    """
    from deepchecks_spark.core.checks import format_number
    from deepchecks_spark.drift.kernels import psi_from_counts

    if not cat_cols:
        return []
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cat_cols)
    melted = (
        df.withColumn("__pid", F.spark_partition_id())
        .selectExpr("__pid", f"stack({len(cat_cols)}, {pairs}) as (column, value)")
        .filter(F.col("value").isNotNull())
    )
    grouped = melted.groupBy("__pid", "column", "value").count()
    n_parts = df.rdd.getNumPartitions()
    # Absolute driver-memory bound: the per-partition formula grows
    # linearly with partition count, so at corpus scale (thousands of
    # partitions) it would itself permit a multi-GB collect before the
    # gate trips (ADVICE r2). 2M rows ≈ low hundreds of MB worst case.
    cap_total = min(n_parts * len(cat_cols) * max_categories, ABS_DRIFT_COLLECT_CAP) + 1
    rows_in = grouped.limit(cap_total).collect()
    if len(rows_in) >= cap_total:  # pathological cardinality → gate, don't OOM
        return [(-1, "Partition Drift", "histogram cardinality gate", "ERROR",
                 f"per-partition histograms exceed {max_categories} categories/column "
                 f"(or {ABS_DRIFT_COLLECT_CAP} total rows); pass lower-cardinality cat_cols")]
    per_pid: dict = {}
    global_hists: dict = {c: {} for c in cat_cols}
    for r in rows_in:
        per_pid.setdefault(r["__pid"], {}).setdefault(r["column"], {})[r["value"]] = r["count"]
        global_hists[r["column"]][r["value"]] = (
            global_hists[r["column"]].get(r["value"], 0) + r["count"]
        )
    reference_hists = reference_hists or global_hists
    out = []
    for pid in sorted(per_pid):
        for col in cat_cols:
            hist = per_pid[pid].get(col)
            ref = reference_hists.get(col)
            if not hist or not ref:
                continue
            score = psi_from_counts(ref, hist, min_category_size_ratio=0.01)
            cond = f"PSI of {col} vs reference is less than {format_number(max_psi)}"
            category = "PASS" if score < max_psi else "FAIL"
            out.append((pid, "Partition Drift", cond, category,
                        f"{col}: PSI {format_number(score)} over {sum(hist.values())} samples"))
    return out


class _StatsOnlyContext:
    """Context facade that serves one partition's precomputed stats to the
    stats-driven checks (their compute() only touches ctx.data/ctx.stats)."""

    def __init__(self, ds: Dataset, stats):
        self._ds = ds
        self._stats = stats

    def data(self, kind):
        return self._ds

    def stats(self, kind, columns=None):
        return self._stats


# ---------------------------------------------------------------------------
# violation rows with partition lineage
# ---------------------------------------------------------------------------

def flagged_string_values(df: DataFrame, string_cols: list) -> DataFrame:
    """(__pid, column, value, count, check) — every flagged string
    value (MixedNulls null-representations / SpecialCharacters-only
    values) per input partition, selective-filter-first so the melted
    scan emits only offenders. Split out of :func:`violation_rows` so
    the runner can compute the KB-text melt+regex pass ONCE and share
    it between the violations table and the per-partition MixedNulls
    verdicts (it was scanned twice before)."""
    melted = df.withColumn("__pid", F.spark_partition_id()).selectExpr(
        "__pid",
        f"stack({len(string_cols)}, "
        + ", ".join(f"'{c}', `{c}`" for c in string_cols)
        + ") as (column, value)",
    ).filter(F.col("value").isNotNull())
    is_null_repr = is_null_string_expr(F.col("value"))
    is_special = is_special_only_expr(F.col("value"))
    return (
        melted.filter(is_null_repr | is_special)
        .groupBy("__pid", "column", "value")
        .count()
        .withColumn(
            "check",
            F.when(is_null_string_expr(F.col("value")), F.lit("MixedNulls")).otherwise(
                F.lit("SpecialCharacters")
            ),
        )
    )


def violation_rows(df: DataFrame, string_cols: list,
                   mismatch_max_distinct: int = 10_000,
                   flagged: DataFrame | None = None) -> DataFrame:
    """(check, column, offending_value, count, percent, partition_id).

    Scale design: the MixedNulls/SpecialCharacters predicates are applied
    BEFORE any aggregation — the melted scan emits only offending values,
    so the shuffle carries a tiny fraction of the input no matter how big
    the corpus is. StringMismatch needs per-distinct-value counts, which
    is unbounded for free-text columns — so it is restricted to columns
    whose approx distinct count is ≤ ``mismatch_max_distinct`` (the
    reference caps the whole check at 1M sampled rows instead,
    string_mismatch.py:64; a cardinality cap is the shuffle-safe analogue).
    """
    spark = df.sparkSession
    if not string_cols:
        return spark.createDataFrame([], VIOLATIONS_SCHEMA)
    n_rows = df.count()

    def _melt_with_pid(cols):
        return df.withColumn("__pid", F.spark_partition_id()).selectExpr(
            "__pid",
            f"stack({len(cols)}, " + ", ".join(f"'{c}', `{c}`" for c in cols) + ") as (column, value)",
        )

    # selective filter FIRST, then the (cheap) per-partition aggregation
    if flagged is None:
        flagged = flagged_string_values(df, string_cols)
    base_cols = [
        F.col("check"),
        F.col("column"),
        F.col("value").alias("offending_value"),
        F.col("count"),
        (F.col("count") / F.lit(n_rows)).alias("percent"),
        F.col("__pid").alias("partition_id"),
    ]
    out = flagged.select(*base_cols)

    # StringMismatch on bounded-cardinality columns only
    approx = df.agg(
        *[F.approx_count_distinct(f"`{c}`").alias(c) for c in string_cols]
    ).first()
    low_card = [c for c in string_cols if (approx[c] or 0) <= mismatch_max_distinct]
    if low_card:
        from pyspark.sql import Window

        counted = (
            _melt_with_pid(low_card)
            .filter(F.col("value").isNotNull())
            .groupBy("__pid", "column", "value")
            .count()
        )
        w = Window.partitionBy("column", "base")
        mismatched = (
            counted.withColumn("base", baseform_expr(F.col("value"), allow_empty_result=False))
            .withColumn("n_variants", F.size(F.collect_set("value").over(w)))
            .filter(F.col("n_variants") > 1)
            .withColumn("check", F.lit("StringMismatch"))
            .select(*base_cols)
        )
        out = out.unionByName(mismatched)
    return out


def metrics_rows(ds: Dataset, per_part: dict | None = None) -> list:
    """Per-partition per-column metrics table rows:
    (partition_id, column, stat, value_double, value_string)."""
    if per_part is None:
        per_part = compute_column_stats_by_partition(ds.df, ds.columns)
    rows = []
    for pid, stats in sorted(per_part.items()):
        rows.append((pid, "*", "n_rows", float(stats.n_rows), None))
        for col, st in stats.per_column.items():
            for stat, v in st.items():
                if v is None:
                    continue
                if isinstance(v, (int, float)):
                    rows.append((pid, col, stat, float(v), None))
                else:
                    rows.append((pid, col, stat, None, str(v)))
    return rows


def global_metric_rows(per_part: dict) -> list:
    """Run-level metric set for the metrics-history table, derived
    driver-side from the per-partition stats (no extra scan) using only
    exactly-mergeable statistics: row count, per-column null fraction,
    numeric min/max. Non-mergeable stats (stddev, HLL estimates) stay in
    the per-run metrics table and out of the history."""
    total = sum(s.n_rows for s in per_part.values())
    out = [("rows", float(total))]
    cols: dict = {}
    for s in per_part.values():
        for c, st in s.per_column.items():
            agg = cols.setdefault(c, {"nulls": 0, "min": None, "max": None})
            agg["nulls"] += st.get("null_count", 0)
            for k, f in (("min", min), ("max", max)):
                v = st.get(k)
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    agg[k] = v if agg[k] is None else f(agg[k], v)
    for c, agg in sorted(cols.items()):
        out.append((f"{c}.null_frac", (agg["nulls"] / total) if total else 0.0))
        if agg["min"] is not None:
            out.append((f"{c}.min", float(agg["min"])))
            out.append((f"{c}.max", float(agg["max"])))
    return out


# ---------------------------------------------------------------------------
# the job
# ---------------------------------------------------------------------------

def run_job(spark, input_path: str, output_dir: str, fmt: str = "parquet",
            label: str | None = None, cat_features: list | None = None,
            snapshot_id: int | None = None, resume: bool = True,
            concurrent_stages: bool = True,
            reference_input: str | None = None,
            prediction_column: str | None = None,
            probability_columns: dict | None = None,
            task_type: str = "classification",
            constraints: list | None = None,
            metrics_history: str | None = None,
            anomaly_rules: dict | None = None,
            suggest: bool = False,
            domain_profile_col: str | None = None,
            script_profile_col: str | None = None) -> dict:
    """Execute the integrity suite with per-partition lineage and
    checkpointed stage outputs. Returns the manifest dict."""
    os.makedirs(output_dir, exist_ok=True)
    manifest_path = os.path.join(output_dir, "_manifest.json")
    fingerprint = (
        str(snapshot_id) if snapshot_id is not None else snapshot_fingerprint(input_path, fmt)
    )
    # the parameterization is part of the resume identity: re-running the
    # same input with e.g. a newly-added --prediction-column must NOT
    # skip the done stages (their outputs lack the model-eval rows)
    params = {"label": label, "cat_features": sorted(cat_features or []),
              "reference_input": reference_input,
              "prediction_column": prediction_column,
              "probability_columns": probability_columns,
              "task_type": task_type,
              "constraints": constraints,
              "suggest": suggest,
              "domain_profile_col": domain_profile_col,
              "script_profile_col": script_profile_col}
    manifest = {"fingerprint": fingerprint, "input": input_path,
                "params": params, "stages": {}, "run_id": f"run-{fingerprint}"}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if prev.get("fingerprint") == fingerprint and prev.get("params") == params:
            manifest = prev  # resume: completed stages are skipped below
        # different fingerprint or params → fresh manifest, stale stages
        # recompute

    df = read_table(spark, input_path, fmt, snapshot_id)
    # one materialization shared by every stage: repartition up to the
    # cluster's slot count if the source is under-partitioned, cache the
    # decoded columns (the scan + decompress dominates repeated passes)
    slots = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < slots:
        df = df.repartition(slots)
    df.persist()
    ds = Dataset(df, label=label, cat_features=cat_features,
                 infer_categorical=cat_features is None)
    string_cols = [c for c in ds.columns if isinstance(ds.schema_of(c), T.StringType)]

    from deepchecks_spark.checks.integrity import (
        IsSingleValue,
        MixedDataTypes,
        PercentOfNulls,
        SpecialCharacters,
    )

    stats_checks = [
        IsSingleValue().add_condition_not_single_value(),
        PercentOfNulls().add_condition_percent_of_nulls_not_greater_than(0.05),
        SpecialCharacters().add_condition_ratio_of_special_characters_less_or_equal(0.001),
        MixedDataTypes().add_condition_rare_type_ratio_not_in_range(),
    ]

    import threading

    per_part_cache: dict = {}
    flagged_cache: dict = {}
    _pp_lock = threading.Lock()
    _fl_lock = threading.Lock()
    _manifest_lock = threading.Lock()

    def _flagged():
        # the KB-text melt + regex scan is the heaviest string pass:
        # compute its grouped offender table once, persisted, and share
        # it between the violations table and the per-partition
        # MixedNulls verdicts (two full scans before)
        if not string_cols:
            return None
        with _fl_lock:
            if not flagged_cache:
                fr = flagged_string_values(ds.df, string_cols)
                fr.persist()
                flagged_cache["v"] = fr
            return flagged_cache["v"]

    def _per_part():
        # one grouped stats pass shared by partition_verdicts + metrics.
        # exact_distinct=False: per-partition exact countDistinct would
        # shuffle every distinct payload (text/html) per partition branch;
        # the HLL sketch is mergeable per-partition state — the only
        # shape that survives 10^12 rows — and is exact at the small
        # cardinalities where the IsSingleValue verdict needs exactness.
        with _pp_lock:
            if not per_part_cache:
                per_part_cache["v"] = compute_column_stats_by_partition(
                    ds.df, ds.columns, exact_distinct=False
                )
            return per_part_cache["v"]

    def stage(name, fn):
        if manifest["stages"].get(name) == "done":
            return
        t0 = time.time()
        fn()
        with _manifest_lock:
            manifest["stages"][name] = "done"
            manifest.setdefault("stage_seconds", {})[name] = round(time.time() - t0, 3)
            with open(manifest_path, "w") as f:
                json.dump(manifest, f, indent=2)

    perf_checks: list = []
    if prediction_column and label:
        # the §2.10 model-eval members, composed the way production_suite
        # does (single-dataset branch): driven entirely by prediction /
        # probability COLUMNS — no model object, every check one bounded
        # aggregation pass
        from deepchecks_spark.suites import production_suite

        psuite = production_suite(is_comparative=False,
                                  prediction_column=prediction_column,
                                  probability_columns=probability_columns,
                                  task_type=task_type)
        perf_checks = [c for c in psuite.checks
                       if c.__class__.__module__.endswith("checks.performance")]

    def _global_verdicts():
        from deepchecks_spark.core.suite import Suite

        suite = Suite("runner integrity", *stats_checks, *perf_checks)
        result = suite.run(ds)
        rows = []
        for r in result.results:
            if isinstance(r, CheckFailure):
                rows.append((r.header, "<failure>", "ERROR", repr(r.exception)))
                continue
            if not r.conditions_results:
                # condition-less checks (e.g. ConfusionMatrixReport,
                # CalibrationScore without an added condition) still get a
                # lineage row so the verdicts table records they computed
                rows.append((r.header, "<computed>", "PASS", "check computed"))
            for c in r.conditions_results:
                rows.append((r.header, c.name, c.category.value, c.details))
        out = spark.createDataFrame(rows, "check string, condition string, category string, details string")
        write_table(out, os.path.join(output_dir, "verdicts"))

    def _partition_verdicts():
        # the sections are independent Spark jobs over the shared cache:
        # submit them concurrently (each leg's tail back-fills the
        # others' ramp-up — guide §2.6) and concatenate in a FIXED
        # order so the output table is deterministic
        sections = [
            lambda: (partition_verdicts(ds, stats_checks, _per_part())
                     + mixed_nulls_partition_rows(ds.df, string_cols,
                                                  _per_part(),
                                                  flagged=_flagged())),
        ]
        # key-identity duplicates per partition: web corpora key on url
        dup_cols = [c for c in ("url",) if c in ds.columns] or list(ds.columns)
        sections.append(lambda: duplicates_partition_rows(
            ds.df, dup_cols, max_ratio=0.0))
        # per-partition categorical drift vs the global distribution
        # (flags anomalous shards); cat features only — bounded output
        if ds.cat_features:
            sections.append(lambda: drift_partition_rows(
                ds.df, list(ds.cat_features)))
        if ds.label_name:
            sections.append(lambda: conflicting_labels_partition_rows(
                ds.df, [c for c in ds.features if c != ds.label_name],
                ds.label_name))
        if prediction_column and ds.label_name:
            sections.append(lambda: performance_partition_rows(
                ds.df, ds.label_name, prediction_column, task=task_type))
        if reference_input:
            # join checks vs a reference snapshot, per partition: new
            # categories and train/test samples mix (VERDICT r3 next-8)
            ref_df = read_table(spark, reference_input, fmt)

            def _ref_sections():
                rows = []
                if ds.cat_features:
                    rows += new_category_partition_rows(
                        ds.df, ref_df, list(ds.cat_features))
                rows += samples_mix_partition_rows(ds.df, ref_df, list(ds.columns))
                return rows

            sections.append(_ref_sections)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(sections)) as pool:
            futures = [pool.submit(fn) for fn in sections]
            rows = [r for fut in futures for r in fut.result()]
        out = spark.createDataFrame(
            rows, "partition_id int, check string, condition string, category string, details string"
        )
        write_table(out, os.path.join(output_dir, "partition_verdicts"))

    def _violations():
        out = violation_rows(ds.df, string_cols, flagged=_flagged())
        write_table(out, os.path.join(output_dir, "violations"))

    def _metrics():
        rows = metrics_rows(ds, _per_part())
        out = spark.createDataFrame(
            rows, "partition_id int, column string, stat string, value_double double, value_string string"
        )
        write_table(out, os.path.join(output_dir, "metrics"))

    def _constraint_verdicts():
        # declarative contract verdicts: one table, partition_id = -1 for
        # the table-global rows; per-partition rows for the row-local
        # subset (the north-rule shard-locating shape)
        from deepchecks_spark.checks.constraints import (
            ROW_LOCAL, _is_big_set, validate_constraints,
            validate_constraints_by_partition)

        glob = validate_constraints(ds.df, constraints) \
            .select(F.lit(-1).alias("partition_id"), "constraint", "column",
                    "n_violations", "violation_frac", "passed")
        # oversized membership sets evaluate globally only (a broadcast
        # join cannot preserve input partition identity)
        row_local = [c for c in constraints
                     if c["kind"] in ROW_LOCAL and not _is_big_set(c)]
        if row_local:
            per = validate_constraints_by_partition(ds.df, row_local)
            glob = glob.unionByName(per)
        write_table(glob, os.path.join(output_dir, "constraint_verdicts"))

    def _anomaly():
        # Deequ-style metric-history anomaly detection: append this run's
        # global metrics to the (cross-run) history table, then score the
        # latest value of every metric against its own trailing history.
        # Resume safety is two-fold: (a) the run's run_ts is pinned into
        # the manifest BEFORE the append, and the append is skipped when
        # rows at that run_ts already exist (a parquet write commits
        # atomically, so presence means the prior attempt's append
        # finished) — a crash between the append and the verdict write
        # can no longer double-append on resume; (b) only a genuinely
        # missing history path means "first run" — any other read error
        # re-raises instead of silently restarting the history at ts 1.
        from pyspark.errors import AnalysisException

        from deepchecks_spark.checks.anomaly import metric_anomalies

        prior = None
        try:
            prior = spark.read.parquet(metrics_history)
        except AnalysisException as e:  # first run: no history yet
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
        next_ts = manifest.get("anomaly_run_ts")
        if next_ts is None:
            next_ts = 1 if prior is None else (
                (prior.agg(F.max("run_ts")).first()[0] or 0) + 1)
            with _manifest_lock:
                manifest["anomaly_run_ts"] = next_ts
                with open(manifest_path, "w") as f:
                    json.dump(manifest, f, indent=2)
        already = prior is not None and bool(
            prior.filter(F.col("run_ts") == next_ts).take(1))
        if not already:
            rows = [(m, next_ts, v) for m, v in global_metric_rows(_per_part())]
            new = spark.createDataFrame(
                rows, "metric string, run_ts bigint, value double")
            write_table(new, metrics_history, mode="append")
        rules = anomaly_rules or {"max_relative_change": 0.5, "z_threshold": 3.0}
        out = metric_anomalies(spark.read.parquet(metrics_history), **rules)
        write_table(out, os.path.join(output_dir, "anomaly_verdicts"))

    def _suggest():
        # profile -> suggested contract (checks/constraints.py): the
        # output is O(columns x rules) rows; a user pins the table as
        # next run's --constraints to close the suggest->validate loop
        from deepchecks_spark.checks.constraints import suggest_constraints

        write_table(suggest_constraints(ds.df),
                    os.path.join(output_dir, "suggested_constraints"))

    def _domain_profile():
        # per-domain corpus profile over the cached input: doc counts,
        # within-domain exact-duplicate-text rate, token mass. Text
        # shuffles only as xxhash64 (pipeline/webclean.py); the output
        # is O(domains) rows — written, never collected.
        from deepchecks_spark.pipeline.webclean import domain_profile

        # without a text column the counts/dup-rate remain meaningful
        # (the URL stands in as the "text", so duplicates = repeated URLs)
        text_col = "text" if "text" in ds.df.columns else domain_profile_col
        out = domain_profile(ds.df, domain_profile_col, text_col)
        write_table(out, os.path.join(output_dir, "domain_profile"))

    def _script_profile():
        # Unicode script-mix roll-up over the cached input: per dominant
        # script, doc counts, homoglyph-spam (mixed_script) counts and
        # per-script character totals. The per-doc profile is a
        # shuffle-free projection (pipeline/textstats.py); only the
        # O(#scripts) roll-up rows are written, never per-doc rows.
        from deepchecks_spark.pipeline.textstats import (
            SCRIPT_BLOCKS,
            script_profile,
        )

        prof = script_profile(ds.df, script_profile_col)
        out = prof.groupBy("main_script").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("mixed_script").cast("long")).alias("n_mixed"),
            *[F.sum(f"n_{name}").alias(f"{name}_chars")
              for name in SCRIPT_BLOCKS],
        )
        write_table(out, os.path.join(output_dir, "script_profile"))

    stages = [
        ("global_verdicts", _global_verdicts),
        ("partition_verdicts", _partition_verdicts),
        ("violations", _violations),
        ("metrics", _metrics),
    ]
    if constraints:
        stages.append(("constraint_verdicts", _constraint_verdicts))
    if metrics_history:
        stages.append(("anomaly", _anomaly))
    if suggest:
        stages.append(("suggested_constraints", _suggest))
    if domain_profile_col:
        stages.append(("domain_profile", _domain_profile))
    if script_profile_col:
        stages.append(("script_profile", _script_profile))
    try:
        if concurrent_stages:
            # the four stages are independent reads of the cached input;
            # submitting them concurrently lets the scheduler fill each
            # job's ramp-up/tail gaps — at high core counts the sequential
            # version leaves most slots idle between jobs. Materialize the
            # cache once first so the threads don't race to build it.
            df.count()
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(stages)) as pool:
                futures = [pool.submit(stage, n, fn) for n, fn in stages]
                for fut in futures:
                    fut.result()
        else:
            for n, fn in stages:
                stage(n, fn)
    finally:
        df.unpersist()
        if flagged_cache:
            flagged_cache["v"].unpersist()
    return manifest


def main(argv=None):
    parser = argparse.ArgumentParser(description="deepchecks_spark suite runner")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--format", default="parquet")
    parser.add_argument("--cat-features", default=None,
                        help="comma-separated categorical feature columns "
                             "(default: inferred)")
    parser.add_argument("--label", default=None)
    parser.add_argument("--snapshot-id", type=int, default=None)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--cores", type=int, default=None)
    parser.add_argument("--reference", default=None,
                        help="reference snapshot for per-partition join checks "
                             "(new categories / samples mix)")
    parser.add_argument("--prediction-column", default=None,
                        help="predictions column enabling the model-eval checks "
                             "(requires --label)")
    parser.add_argument("--probability-columns", default=None,
                        help="JSON dict {class: probability_column} for "
                             "RocReport/CalibrationScore")
    parser.add_argument("--task-type", default="classification",
                        choices=("classification", "regression"),
                        help="model-eval scorer family for --prediction-column")
    parser.add_argument("--constraints", default=None,
                        help="path to a JSON list of constraint specs "
                             '(e.g. [{"kind": "not_null", "column": "url"}]) '
                             "evaluated into the constraint_verdicts table")
    parser.add_argument("--metrics-history", default=None,
                        help="path of the cross-run metrics-history table; "
                             "enables the anomaly stage (appends this run's "
                             "global metrics, writes anomaly_verdicts)")
    parser.add_argument("--anomaly-rules", default=None,
                        help='JSON rule dict for the anomaly stage, e.g. '
                             '{"max_relative_change": 0.5, "z_threshold": 3}')
    parser.add_argument("--domain-profile-col", default=None,
                        help="URL column enabling the per-domain corpus "
                             "profile stage (writes a domain_profile table)")
    parser.add_argument("--script-profile-col", default=None,
                        help="text column enabling the Unicode script-mix "
                             "roll-up stage (writes a script_profile table "
                             "with per-dominant-script doc/mixed counts)")
    parser.add_argument("--suggest-constraints", action="store_true",
                        help="profile the input and write a "
                             "suggested_constraints table (pin it as the "
                             "next run's --constraints)")
    args = parser.parse_args(argv)
    from deepchecks_spark.session import get_spark

    spark = get_spark("deepchecks_spark_runner", cores=args.cores)
    manifest = run_job(
        spark, args.input, args.output, fmt=args.format, label=args.label,
        cat_features=(args.cat_features.split(",")
                      if args.cat_features else None),
        snapshot_id=args.snapshot_id, resume=not args.no_resume,
        reference_input=args.reference,
        prediction_column=args.prediction_column,
        probability_columns=(json.loads(args.probability_columns)
                             if args.probability_columns else None),
        task_type=args.task_type,
        constraints=(json.load(open(args.constraints))
                     if args.constraints else None),
        metrics_history=args.metrics_history,
        anomaly_rules=(json.loads(args.anomaly_rules)
                       if args.anomaly_rules else None),
        suggest=args.suggest_constraints,
        domain_profile_col=args.domain_profile_col,
        script_profile_col=args.script_profile_col,
    )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
