"""Batch file-format scans & sinks (SURVEY.md §2.2 row 1).

Thin, declarative wrappers — Catalyst owns pushdown/pruning; the only
engine-added value is consistent option defaults and partitioned-write
ergonomics. CSV/JSON timestamp handling is pinned so a round-trip is
lossless at microsecond precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_READ_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "timestampFormat": TS_FMT, "mode": "FAILFAST"},
    "json": {"timestampFormat": TS_FMT, "mode": "FAILFAST"},
    "parquet": {},
    "orc": {},
}

_WRITE_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "timestampFormat": TS_FMT},
    "json": {"timestampFormat": TS_FMT},
    "parquet": {},
    "orc": {},
}


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``. Pass an explicit schema for csv/json in
    production — inference is a full extra pass over the data."""
    if fmt not in _READ_DEFAULTS:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(_READ_DEFAULTS)}")
    reader = spark.read.format(fmt).options(**{**_READ_DEFAULTS[fmt], **options})
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path``. ``partition_by`` produces the
    hive-layout directories that make partition pruning work on read —
    the 100 TB layout lever (prune before scan, not after)."""
    if fmt not in _WRITE_DEFAULTS:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(_WRITE_DEFAULTS)}")
    writer = df.write.format(fmt).mode(mode).options(
        **{**_WRITE_DEFAULTS[fmt], **options}
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
