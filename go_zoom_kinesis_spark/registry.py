"""Merged query/oracle registry for the driver contract.

Every operator module contributes ``QUERIES`` (name → callable(spark,
sf_dir) → DataFrame) and ``ORACLE`` (name → DuckDB SQL with identical
output column names). ``__spark_entry__`` re-exports these.

Each callable is wrapped to pin runtime session confs (UTC timezone,
AQE) on the driver-provided SparkSession before the plan is built, so
timestamp values hash identically to the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import configure_session


def _modules():
    from .operators import (
        behavior,
        dedup,
        graph,
        multimodal,
        pipeline,
        privacy,
        relational,
        relational2,
        relational3,
        sampling,
        search,
        similarity,
        skew,
        streaming_analogs,
        text,
        timeseries,
        udf_surface,
    )

    return [
        behavior,
        graph,
        streaming_analogs,
        relational,
        relational2,
        relational3,
        dedup,
        sampling,
        similarity,
        text,
        multimodal,
        skew,
        udf_surface,
        pipeline,
        timeseries,
        privacy,
        search,
    ]


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        return fn(spark, sf_dir)

    run.__name__ = fn.__name__
    run.__doc__ = fn.__doc__
    return run


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = _wrap(fn)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLE", {}).items():
            out[name] = sql
    return out
