"""Byte-identity invariant: Spark-side (pandas UDF) extraction equals the
row-wise reference extractor per url (BASELINE.json input_hint)."""

from deepchecks_spark.corpus import extract_text, make_extract_text_udf


def test_extract_text_basic():
    html = (
        "<html><head><title>T</title><style>p{}</style></head>"
        "<body><script>var x=1;</script><h1>Head</h1>"
        "<p>hello   world</p><p>a &amp; b &lt;c&gt;</p></body></html>"
    )
    text = extract_text(html)
    assert "var x" not in text
    assert "p{}" not in text
    lines = text.split("\n")
    assert "T" in lines
    assert "Head" in lines
    assert "hello world" in lines
    assert "a & b <c>" in lines


def test_extract_text_bytes_and_unicode():
    html = "<p>café — ok</p>".encode("utf-8")
    assert extract_text(html) == "café — ok"


def test_extractor_deterministic():
    html = "<div><p>x</p><br/><li>y</li></div>"
    assert extract_text(html) == extract_text(html)


def test_corpus_text_matches_extractor(corpus_pdf):
    for _, row in corpus_pdf.iterrows():
        assert extract_text(row["html"]) == row["text"]


def test_spark_udf_byte_identity(spark, corpus_df):
    """The vectorized Spark path produces the same bytes per url as the
    stored reference text (which was produced row-wise)."""
    from pyspark.sql import functions as F

    udf = make_extract_text_udf()
    mismatches = (
        corpus_df.withColumn("engine_text", udf(F.col("html")))
        .filter(~F.col("engine_text").eqNullSafe(F.col("text")))
        .count()
    )
    assert mismatches == 0
