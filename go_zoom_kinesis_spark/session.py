"""SparkSession factory.

Local-mode defaults tuned for the driver harness (local[$SPARK_GRAFT_CPUS],
single JVM). At cluster scale the same session options hold: AQE handles
runtime re-planning/skew, shuffle partitions are sized explicitly, UTC
timezone pins timestamp semantics for oracle comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go-zoom-kinesis-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    AQE is enabled so skewed joins/aggregations re-plan at runtime —
    essential at 100 TB, harmless at sf0.001.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS); read as long, the
        # loader converts to micros (matches DuckDB's ns→µs truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # naive-micros parquet timestamps read as TIMESTAMP (UTC session
        # tz), not TIMESTAMP_NTZ — keeps epoch casts legal and matches
        # DuckDB's naive-timestamp epoch() semantics
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an externally-provided session.

    The driver hands us its own SparkSession; only runtime-mutable confs
    may be set here (UTC matters for oracle-comparable timestamps).
    """
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        # right-size shuffles for the local test scale (runtime-settable;
        # a cluster deployment would size this to cores × 2-3)
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        # restore runtime-bloom-filter injection gates to their cluster
        # defaults — operators/layout.py forces them per-query at local
        # test scale and this reset stops the override leaking into
        # whatever query the driver runs next on the shared session
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — keep going
    return spark
