"""Input-parallelism guard for CPU-heavy map work (guide §2.5/§6).

Small or compacted parquet inputs arrive as fewer scan partitions than
the cluster has task slots (a 128 MB ``maxPartitionBytes`` split turns a
sub-128 MB table into ONE task), so every expensive per-row expression
downstream — shingle builds, window hashing, PQ encoding — runs on a
single core while the rest of the cluster idles. ``spread_input``
repartitions such inputs up to the slot count before the heavy work;
at real corpus scale the input already carries far more partitions than
slots and the call is a no-op (checked, never an unconditional shuffle).

This is the same guard ``runner.run_job`` and ``Context.persist`` apply
before their multi-pass workloads, shared so single-pass pipeline
operators can use it too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to ``defaultParallelism``
    partitions when (and only when) its current plan yields fewer —
    the under-partitioned-scan case. Results are unchanged: callers are
    aggregations/joins keyed on row VALUES (never ``spark_partition_id``
    or scan order), so partition placement is invisible to their output.

    The partition probe (``df.rdd.getNumPartitions()``) is plan-only —
    no job runs; the repartition itself moves at most one slot-count's
    worth of under-sized partitions, which is exactly the regime where
    the shuffle is cheap.
    """
    sc = df.sparkSession.sparkContext
    slots = sc.defaultParallelism
    try:
        n_parts = df.rdd.getNumPartitions()
    except Exception:  # exotic plans that refuse RDD conversion: leave as-is
        return df
    if n_parts < slots:
        return df.repartition(slots)
    return df
