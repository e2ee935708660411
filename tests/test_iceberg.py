"""Iceberg end-to-end smoke test, gated on connector availability
(ROADMAP #1 / VERDICT r1 next-10).

This container ships no Iceberg jars, so the write→snapshot→pin→read
round-trip is skipped here; if the image ever gains
iceberg-spark-runtime, the test runs without modification and exercises
snapshot pinning exactly as the north rule's resumable-checkpoint path
expects. The non-Iceberg fallback (parquet + snapshot_fingerprint) is
tested unconditionally below.
"""

import pytest

from deepchecks_spark.io import iceberg_available, read_table, snapshot_fingerprint


def test_iceberg_round_trip_when_jars_present(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jars in this image (ROADMAP #1)")
    # configure a local hadoop catalog and round-trip with snapshot pinning
    spark.conf.set("spark.sql.catalog.ci", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ci.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ci.warehouse", str(tmp_path / "wh"))
    df = spark.range(100).selectExpr("id", "cast(id % 7 as string) AS grp")
    df.writeTo("ci.db.t").createOrReplace()
    first = spark.sql("SELECT snapshot_id FROM ci.db.t.snapshots ORDER BY committed_at").first()[0]
    spark.range(100, 200).selectExpr("id", "cast(id % 7 as string) AS grp") \
        .writeTo("ci.db.t").append()
    pinned = read_table(spark, "ci.db.t", fmt="iceberg", snapshot_id=int(first))
    assert pinned.count() == 100  # snapshot pin ignores the later append
    assert read_table(spark, "ci.db.t", fmt="iceberg").count() == 200


def test_parquet_fingerprint_resume_semantics(spark, tmp_path):
    # the no-connector fallback: a rewrite of any data file changes the
    # fingerprint and invalidates resume
    p = str(tmp_path / "t")
    spark.range(50).write.parquet(p)
    fp1 = snapshot_fingerprint(p)
    assert fp1 == snapshot_fingerprint(p)  # stable while untouched
    import time

    time.sleep(1.1)  # mtime granularity
    spark.range(60).write.mode("overwrite").parquet(p)
    assert snapshot_fingerprint(p) != fp1
