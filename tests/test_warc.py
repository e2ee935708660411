"""WARC container ingestion (corpus/warc.py): encode is pure JVM
expression arithmetic, parse is one shuffle-free mapInPandas pass, and
the two are exact inverses — verified on the synthetic corpus whose
payload bytes exercise multi-byte UTF-8, entities and embedded markup."""

import gzip
from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepchecks_spark.corpus.warc import (
    parse_warc,
    parse_warc_bytes,
    to_warc,
    warc_record_expr,
)


@pytest.fixture(scope="module")
def crawl_df(spark, corpus_df):
    # the synthetic corpus already has (url, warc_ts, html)
    return corpus_df.select("url", "warc_ts", "html")


def test_roundtrip_encode_parse_identity(spark, crawl_df):
    blobs = crawl_df.select(
        warc_record_expr("url", "warc_ts", "html").alias("content"))
    parsed = parse_warc(blobs, "content")
    orig = crawl_df.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts"),
        F.col("html").alias("payload"),
    ).collect()
    got = parsed.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts"),
        "payload",
    ).collect()
    key = lambda r: (r.url, r.ts, bytes(r.payload))  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, orig))
    assert parsed.schema["warc_ts"].dataType.typeName() == "timestamp"


def test_multi_record_blob_and_type_filter(spark, crawl_df):
    # two records per blob: a metadata record + the resource record;
    # the parser must find both and the type filter must drop one
    two = crawl_df.select(F.concat(
        warc_record_expr(F.lit("urn:meta"), "warc_ts",
                         F.encode(F.lit("meta-payload"), "UTF-8"),
                         record_type="metadata"),
        warc_record_expr("url", "warc_ts", "html", record_type="resource"),
    ).alias("content"))
    n_rows = crawl_df.count()
    all_recs = parse_warc(two, "content")
    assert all_recs.count() == 2 * n_rows
    only_res = parse_warc(two, "content", record_types=("resource",))
    assert only_res.count() == n_rows
    assert only_res.select("record_type").distinct().collect()[0][0] == "resource"


def test_gzip_member_stream(spark):
    # Common Crawl layout: one gzip member per record, concatenated
    recs = []
    for i in range(5):
        payload = f"<html><body>doc {i} café</body></html>".encode()
        rec = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: https://ex.org/{i}\r\n"
            f"WARC-Date: 2025-03-01T00:00:{i:02d}Z\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode() + payload + b"\r\n\r\n"
        recs.append(gzip.compress(rec, mtime=0))
    blob = b"".join(recs)
    pdf = pd.DataFrame({"content": [blob]})
    df = spark.createDataFrame(pdf, schema="content binary")
    out = parse_warc(df, "content", record_types=("response",)).collect()
    assert len(out) == 5
    assert sorted(r.url for r in out) == [f"https://ex.org/{i}" for i in range(5)]
    assert out[0].warc_ts.replace(second=0) == datetime(2025, 3, 1)
    assert b"caf\xc3\xa9" in bytes(next(r for r in out if r.url.endswith("/0")).payload)


def test_malformed_bytes_skip_vs_strict(spark):
    payload = b"<html>ok</html>"
    good = (
        f"WARC/1.0\r\nWARC-Type: resource\r\n"
        f"WARC-Target-URI: https://ex.org/good\r\n"
        f"WARC-Date: 2025-03-01T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"
    junky = b"JUNK-not-a-record\r\n" + good
    recs = parse_warc_bytes(junky, strict=False)
    assert len(recs) == 1 and recs[0][1] == payload
    with pytest.raises(ValueError):
        parse_warc_bytes(junky, strict=True)
    # truncated payload: lenient parse returns the short slice, strict raises
    truncated = good[: len(good) - 10]
    assert parse_warc_bytes(truncated, strict=False)[0][1] == payload[:-6]
    with pytest.raises(ValueError):
        parse_warc_bytes(truncated, strict=True)


def test_fractional_seconds_and_missing_headers(spark):
    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Date: 2025-03-01T00:00:01.500000Z\r\n"
        b"Content-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    df = spark.createDataFrame(pd.DataFrame({"content": [rec]}),
                               schema="content binary")
    row = parse_warc(df, "content").collect()[0]
    assert row.url is None  # no Target-URI header
    assert row.warc_ts.microsecond == 500000
    assert bytes(row.payload) == b"abc"
    assert row.record_type == "conversion"


def test_parse_plan_is_shuffle_free_and_pruned(spark, crawl_df):
    wide = to_warc(crawl_df).withColumn("extra", F.lit(1))
    parsed = parse_warc(wide, "warc")
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan → project → mapInPandas only
    # only the bytes column feeds the Python stage: no html/extra in its input
    pythonish = [ln for ln in plan.splitlines() if "MapInPandas" in ln]
    assert pythonish and "extra" not in pythonish[0]


def test_wet_style_conversion_export(spark, crawl_df, corpus_df):
    # WET export: extracted text as a conversion record, text/plain
    wet = corpus_df.select(warc_record_expr(
        "url", "warc_ts", F.encode("text", "UTF-8"),
        record_type="conversion", content_type="text/plain").alias("content"))
    back = parse_warc(wet, "content", record_types=("conversion",))
    texts = {r.url: bytes(r.payload).decode() for r in back.collect()}
    for r in corpus_df.select("url", "text").collect():
        assert texts[r.url] == r.text  # byte-identical per url
