"""Streaming sources (SURVEY.md §2.1 S1-S5 mapping).

``kinesis_stream`` is the production mapping of the reference's client
loop — shard discovery, positioning, batch pacing all become connector
options. This container has no Kinesis connector (or AWS), so the
builder raises a clear error at ``load()`` time unless the connector
jar is on the classpath; tests use ``file_stream``/``rate_stream``,
which exercise the identical downstream plan.

Reference mapping (file:line into /root/reference):
- shard discovery (src/client.rs:98-106)        → connector-internal
- initial position enum (src/processor.rs:313-322) → startingPosition
- GetRecords batch size (src/processor.rs:373)  → maxFetchRecordsPerShard
- batch accumulation floor (src/processor.rs:383) → trigger interval
- resharding re-list loop (src/processor.rs:535-548) → connector-internal
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Bounded/test stream over files — the micro-batch pacing analog of
    the reference's GetRecords accumulation loop (maxFilesPerTrigger ≈
    max_batch_retrieval_loops)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic load source (columns: timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    initial_position: str | datetime = "TRIM_HORIZON",
    max_fetch_records_per_shard: int = 100,
) -> DataFrame:
    """Production Kinesis source. Emits the same envelope the reference
    exposes as RecordMetadata (src/processor.rs:204-267): data,
    streamName, partitionKey, sequenceNumber, approximateArrivalTimestamp,
    shardId.

    initial_position: 'TRIM_HORIZON' | 'LATEST' | a datetime
    (AT_TIMESTAMP). AtSequenceNumber resumes are expressed by restarting
    from a checkpointLocation instead — Structured Streaming's offset
    log has the same precedence the reference gives stored checkpoints
    (src/processor.rs:807-837)."""
    pos = (
        initial_position.isoformat()
        if isinstance(initial_position, datetime)
        else initial_position.upper()
    )
    if not isinstance(initial_position, datetime) and pos not in (
        "TRIM_HORIZON",
        "LATEST",
    ):
        raise ValueError(
            "initial_position must be TRIM_HORIZON, LATEST, or a datetime"
        )
    return (
        spark.readStream.format("aws-kinesis")
        .option("streamName", stream_name)
        .option("region", region)
        .option("initialPosition", pos)
        .option("maxFetchRecordsPerShard", str(max_fetch_records_per_shard))
        .load()
    )
