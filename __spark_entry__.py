"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``go_zoom_kinesis_spark`` (see SURVEY.md §2/§7).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_zoom_kinesis_spark import registry  # noqa: E402
from go_zoom_kinesis_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-shard tumbling-window metrics + checkpoint analog — the
    reference's core computation (SURVEY.md §2 A2/A3/K1) over `events`.
    """
    configure_session(spark)
    from go_zoom_kinesis_spark.operators.streaming_analogs import windowed_metrics

    return windowed_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (identical column names)."""
    return registry.all_oracle_sql()
