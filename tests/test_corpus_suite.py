"""End-to-end: the integrity+drift suite over the synthetic webtext
corpus must detect every planted quirk (FIXTURES.md §F1)."""

import pytest
from pyspark.sql import functions as F

from deepchecks_spark import Dataset
from deepchecks_spark.checks.integrity import (
    DataDuplicates,
    MixedNulls,
    StringMismatch,
)
from deepchecks_spark.checks.traintest import FeatureDrift
from deepchecks_spark.corpus.generator import _STRING_NULLS, _LANG_VARIANTS
from deepchecks_spark.suites import data_integrity


@pytest.fixture(scope="module")
def corpus_ds(spark):
    from deepchecks_spark.corpus import generate_corpus_spark

    df = generate_corpus_spark(spark, 1500, seed=42, dup_fraction=0.1,
                               variant_fraction=0.05, string_null_fraction=0.05)
    df.persist()
    df.count()
    return Dataset(df, features=["url", "text", "lang"], cat_features=["lang"],
                   infer_categorical=False)


def test_mixed_nulls_detects_planted_string_nulls(spark, corpus_ds):
    result = MixedNulls().add_condition_different_nulls_less_equal_to(1).run(corpus_ds)
    lang_nulls = result.value["columns"]["lang"]
    found = {k.strip('"') for k in lang_nulls}
    assert found & set(_STRING_NULLS)
    assert result.conditions_results[0].is_pass is False


def test_string_mismatch_detects_lang_variants(spark, corpus_ds):
    result = StringMismatch(columns=["lang"]).add_condition_no_variants().run(corpus_ds)
    bases = result.value["columns"]["lang"]
    assert "en" in bases  # "EN"/"en "/"e-n" all share baseform 'en'
    variants = {v["variant"] for v in bases["en"]}
    assert variants & set(_LANG_VARIANTS["en"]) | {"en"}
    assert result.conditions_results[0].is_pass is False


def test_data_duplicates_detects_planted_dups(spark, corpus_ds):
    result = DataDuplicates().add_condition_ratio_less_or_equal(0.0).run(corpus_ds)
    assert result.value == pytest.approx(0.1, abs=0.02)
    assert result.conditions_results[0].is_pass is False


def test_feature_drift_on_time_split(spark, corpus_ds):
    # train = first 80% by warc_ts, test = rest: same generator → low drift
    df = corpus_ds.df
    cutoff = df.approxQuantile("warc_ts", [0.8], 0.001)[0] if False else None
    split = df.agg(F.expr("percentile(unix_timestamp(warc_ts), 0.8)")).first()[0]
    train_df = df.filter(F.unix_timestamp("warc_ts") <= split)
    test_df = df.filter(F.unix_timestamp("warc_ts") > split)
    mk = lambda d: Dataset(  # noqa: E731
        d.select("lang", F.length("text").alias("text_len")),
        cat_features=["lang"], infer_categorical=False,
    )
    result = FeatureDrift().add_condition_drift_score_less_than(0.2, 0.2).run(mk(train_df), mk(test_df))
    assert result.value["text_len"]["Method"] == "Kolmogorov-Smirnov"
    assert result.value["text_len"]["Drift score"] < 0.2  # same distribution
    assert result.value["lang"]["Drift score"] < 0.2


def test_integrity_suite_runs_clean(spark, corpus_ds):
    suite = data_integrity()
    result = suite.run(corpus_ds)
    failures = result.get_failures()
    assert not failures, [repr(f) for f in failures]
    # quirks planted → suite must NOT pass
    assert result.passed(fail_if_warning=True) is False
    headers = {r.header for r in result.get_not_passed_checks()}
    assert any("String Mismatch" in h or "Data Duplicates" in h for h in headers)
