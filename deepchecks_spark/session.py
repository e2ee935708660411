"""SparkSession factory tuned for this engine.

Local mode is the test harness; the configs are chosen so the same code
path runs unchanged on a real multi-executor cluster (AQE, adaptive
coalescing, Arrow UDFs, UTC timestamps for oracle parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deepchecks_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → local[*]. Shuffle partitions default to the core count:
    at local scale 200 partitions just adds scheduling overhead; on a
    real cluster the caller passes an explicit value sized to the data.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the engine's fused stats pass aggregates ~8 expressions per
        # column; keep wide plans inside WholeStageCodegen
        .config("spark.sql.codegen.maxFields", "500")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local mode = driver-only: the heap is the whole cluster's memory.
        # Undersizing it makes cache eviction + recompute loops dominate
        # (observed as 80-90% kernel time); size to the host.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "64g"))
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        # Spark 4.x routes lower()/upper()/initcap() under UTF8_BINARY
        # through ICU (spark.sql.icu.caseMappings.enabled defaults to
        # true); the first use pays CollationAwareUTF8String.<clinit>,
        # which builds a full code-point title-case cache — measured at
        # 200+ s of single-threaded CPU on this host, serializing every
        # executor thread behind one class-init monitor. The JVM case
        # mapping (pre-4.x behavior) differs only on locale-sensitive
        # exotic code points, none of which this engine's checks rely
        # on, so take the fast path everywhere.
        .config("spark.sql.icu.caseMappings.enabled", "false")
    )
    spark = builder.getOrCreate()
    # also apply on a pre-existing session getOrCreate() may have
    # returned (builder configs are ignored then); it's runtime-settable
    try:
        spark.conf.set("spark.sql.icu.caseMappings.enabled", "false")
    except Exception:  # pragma: no cover - conf absent on older Spark
        pass
    _prewarm_python_workers(spark)
    return spark


def _prewarm_python_workers(spark: SparkSession) -> None:
    """Fork the Python worker pool once at session build.

    With spark.python.worker.reuse (default true) every worker persists
    for the session's lifetime, but each one pays its pandas/pyarrow
    import (~0.5-1 s of single-core CPU) when IT first runs a task — so
    the first Arrow/pandas-UDF operator of a fresh session is charged
    the whole pool's startup. Running one trivial slot-per-core Arrow
    job here moves that one-off cost into session construction, the
    same place the JVM/codegen warm-up already lives. Skippable via
    SPARK_GRAFT_PREWARM_WORKERS=0; no-op on an already-warmed session.
    """
    if os.environ.get("SPARK_GRAFT_PREWARM_WORKERS", "1") == "0":
        return
    try:
        if spark.conf.get("spark.deepchecks.workersPrewarmed", None) == "true":
            return
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _identity(s: pd.Series) -> pd.Series:
            return s

        n = spark.sparkContext.defaultParallelism
        spark.range(0, n, 1, n).select(_identity("id")).collect()
        spark.conf.set("spark.deepchecks.workersPrewarmed", "true")
    except Exception:  # pragma: no cover — warm-up must never fail a build
        pass
