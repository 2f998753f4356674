"""Bucketed-table co-location — the shuffle-elimination lever for
repeated fact⋈fact joins at 100 TB (SURVEY.md §7 phase 4).

A lineitem⋈orders join shuffles both sides on every run. Bucketing both
tables by the join key at write time moves that cost to ingestion: every
subsequent join (and groupBy on the key) reads co-located buckets and
plans ZERO exchanges. ``tests/test_bucketing.py`` pins exactly that —
same rows as the shuffle plan, no Exchange in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally enables merge-join
    without a sort step."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner emits
    a shuffle-free SortMergeJoin when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on)
