"""Structured Streaming: incremental stats fold + stateless violation
monitor, driven synchronously with a file source + processAllAvailable."""

import pytest

from deepchecks_spark.corpus.generator import CORPUS_DDL
from deepchecks_spark.streaming import (
    IncrementalStats,
    incremental_stats_query,
    streaming_violations,
)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory, spark):
    from deepchecks_spark.corpus import generate_corpus_spark

    path = str(tmp_path_factory.mktemp("stream") / "in")
    df = generate_corpus_spark(spark, 300, seed=7, string_null_fraction=0.1)
    df.write.mode("overwrite").parquet(path)
    return path


def test_incremental_stats_match_batch(spark, stream_dir):
    batch = spark.read.parquet(stream_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(stream_dir)
    )
    stats = IncrementalStats()
    q = incremental_stats_query(stream, stats, columns=["url", "lang", "text"])
    q.processAllAvailable()
    q.stop()
    assert stats.n_rows == batch.count()
    # incremental fold equals the batch aggregate
    from pyspark.sql import functions as F

    want_n_lang = batch.filter(F.col("lang").isNotNull()).count()
    assert stats.per_column["lang"]["n"] == want_n_lang
    assert stats.per_column["text"]["max_len"] == batch.agg(F.max(F.length("text"))).first()[0]
    assert stats.percent_null("lang") == pytest.approx(1 - want_n_lang / stats.n_rows)


def test_streaming_violations_match_batch(spark, stream_dir):
    batch = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    out = streaming_violations(stream, ["lang", "url"])
    q = (
        out.writeStream.format("memory").queryName("violations_out")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM violations_out").collect()
    # batch twin over the same data
    from deepchecks_spark.runner import violation_rows

    want = violation_rows(batch, ["lang", "url"]).collect()
    want_total = sum(r["count"] for r in want if r["check"] == "MixedNulls")
    got_total = sum(1 for r in got if r["check"] == "MixedNulls")
    assert got_total == want_total > 0
