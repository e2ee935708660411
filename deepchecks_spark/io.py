"""Table IO: parquet by default, Iceberg when the runtime has the
connector (reference ingest is pandas-only — dataset.py:130; our
engine's contract is the input_hint's Iceberg table of web pages).

Iceberg gives two load-bearing features at 10^12 rows: snapshot pinning
(``snapshot-id``) so a resumed run reads the exact same data, and
partition pruning. Without the connector (this container), parquet +
a content fingerprint provides the same resume semantics at test scale.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime jars are on the session's classpath.
    Must use Class.forName — a bare py4j package access (``spark._jvm.
    org.apache.iceberg.Table``) returns a lazy JavaPackage and never
    raises, reporting jars that aren't there."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, source: str, fmt: str = "parquet",
               snapshot_id: int | None = None) -> DataFrame:
    if fmt == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(source)
    if fmt == "parquet":
        return spark.read.parquet(source)
    if fmt == "orc":
        return spark.read.orc(source)
    if fmt == "json":
        return spark.read.json(source)
    if fmt == "csv":
        return spark.read.csv(source, header=True)
    raise ValueError(f"unsupported format {fmt!r}")


def snapshot_fingerprint(source: str, fmt: str = "parquet") -> str:
    """Stable identity of the input data for checkpoint pinning.

    Iceberg: the snapshot id IS the fingerprint (caller passes it).
    Parquet dir/file: hash of (relative path, size, mtime) of every data
    file — any rewrite changes the fingerprint and invalidates resume.
    """
    h = hashlib.sha256()
    if os.path.isdir(source):
        for root, _, files in sorted(os.walk(source)):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(root, f)
                st = os.stat(p)
                h.update(f"{os.path.relpath(p, source)}:{st.st_size}:{int(st.st_mtime)}".encode())
    elif os.path.exists(source):
        st = os.stat(source)
        h.update(f"{os.path.basename(source)}:{st.st_size}:{int(st.st_mtime)}".encode())
    else:
        h.update(source.encode())
    return h.hexdigest()[:16]


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    if fmt == "iceberg":
        df.writeTo(path).createOrReplace()
        return
    df.write.mode(mode).format(fmt).save(path)
