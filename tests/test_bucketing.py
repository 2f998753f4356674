"""Bucketed co-located joins: same rows, zero exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_by="o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey", 8, sort_by="o_orderkey")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed_tables):
    """With broadcast off (forcing the join shape big tables get), the
    bucketed join must plan a SortMergeJoin with NO shuffle exchange."""
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:600]}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_shuffle_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = (
        bucketed_join(spark, left, right, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    expected = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_groupby_on_bucket_key_no_shuffle(spark, sf_dir, bucketed_tables):
    """Aggregation on the bucket key also reuses the bucketing (no
    exchange before the final aggregate)."""
    _, right = bucketed_tables
    agg = spark.table(right).groupBy("o_orderkey").agg(F.count("*").alias("n"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
