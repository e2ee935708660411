"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship computation — the full data-integrity +
train/test-drift suite of deepchecks_spark over the sf0.001 tables —
and returns the verdict table. ``queries``/``oracle_sql`` expose every
implemented operator with a DuckDB twin (see
deepchecks_spark/entry_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: integrity + drift suite over the documents table at
    sf0.001, returning one verdict row per (check, condition)."""
    from pyspark.sql import functions as F

    from deepchecks_spark import Dataset, Suite
    from deepchecks_spark.checks.integrity import (
        ClassImbalance,
        DataDuplicates,
        IsSingleValue,
        MixedDataTypes,
        MixedNulls,
        PercentOfNulls,
        SpecialCharacters,
        StringMismatch,
    )
    from deepchecks_spark.checks.traintest import (
        DatasetsSizeComparison,
        FeatureDrift,
        NewCategoryTrainTest,
        TrainTestSamplesMix,
    )

    # driver-supplied session: opt out of Spark 4.x ICU case mappings
    # (see deepchecks_spark/session.py — the ICU path serializes all
    # executor threads behind a 200+ s class-init on this host)
    try:
        spark.conf.set("spark.sql.icu.caseMappings.enabled", "false")
    except Exception:
        pass
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mk = lambda df: Dataset(  # noqa: E731
        df, label="lang", features=["text", "source", "n_chars"],
        cat_features=["source"], infer_categorical=False,
    )
    train = mk(docs.filter(F.col("doc_id") % 2 == 0))
    test = mk(docs.filter(F.col("doc_id") % 2 == 1))

    suite = Suite(
        "webtext integrity + drift",
        IsSingleValue().add_condition_not_single_value(),
        PercentOfNulls().add_condition_percent_of_nulls_not_greater_than(0.05),
        MixedNulls().add_condition_different_nulls_less_equal_to(1),
        MixedDataTypes().add_condition_rare_type_ratio_not_in_range((0.01, 0.1)),
        SpecialCharacters().add_condition_ratio_of_special_characters_less_or_equal(0.001),
        StringMismatch().add_condition_no_variants(),
        ClassImbalance().add_condition_class_ratio_less_than(0.01),
        DataDuplicates().add_condition_ratio_less_or_equal(0.05),
        DatasetsSizeComparison().add_condition_test_train_size_ratio_greater_than(0.1),
        NewCategoryTrainTest().add_condition_new_categories_less_or_equal(0),
        TrainTestSamplesMix().add_condition_duplicates_ratio_less_or_equal(0.1),
        FeatureDrift().add_condition_drift_score_less_than(0.2, 0.2),
    )
    result = suite.run(train, test)
    rows = []
    for r in result.to_json()["results"]:
        if "failure" in r:
            rows.append((r["header"], "<failure>", "ERROR", r["failure"]))
        elif r["conditions"]:
            for c in r["conditions"]:
                rows.append((r["header"], c["name"], c["category"], c["details"]))
        else:
            rows.append((r["header"], "<no-conditions>", "PASS", ""))
    return spark.createDataFrame(
        rows, "check string, condition string, category string, details string"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from deepchecks_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every query (same column names + rounding)."""
    from deepchecks_spark.entry_queries import ORACLES

    return dict(ORACLES)
