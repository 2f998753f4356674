"""Scale-amplification smoke: run headline plans on 8×-amplified facts.

Amplification unions key-shifted copies, so the expected results are
exactly derivable (counts and decimal-exact sums scale ×8) — this
checks that partial aggregation, broadcast choices, and the window
top-k survive a data-volume jump with answers that stay exact, i.e. the
plan scales, not just the test passes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from go_zoom_kinesis_spark.io import load_table

AMP = 8
KEY_STRIDE = 10_000_000  # beyond any real orderkey


@pytest.fixture(scope="module")
def amplified(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li_amp = None
    ord_amp = None
    for i in range(AMP):
        shift = F.lit(i * KEY_STRIDE)
        li_i = li.withColumn("l_orderkey", F.col("l_orderkey") + shift)
        ord_i = orders.withColumn("o_orderkey", F.col("o_orderkey") + shift)
        li_amp = li_i if li_amp is None else li_amp.unionByName(li_i)
        ord_amp = ord_i if ord_amp is None else ord_amp.unionByName(ord_i)
    return li_amp, ord_amp


def test_amplified_aggregation_exact(spark, sf_dir, amplified):
    li_amp, _ = amplified
    li = load_table(spark, sf_dir, "lineitem")
    base = {
        r["l_returnflag"]: (r["n"], r["sum_qty"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("sum_qty"),
        )
        .collect()
    }
    amp = {
        r["l_returnflag"]: (r["n"], r["sum_qty"])
        for r in li_amp.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("sum_qty"),
        )
        .collect()
    }
    assert set(amp) == set(base)
    for k, (n, s) in base.items():
        assert amp[k] == (n * AMP, s * AMP), k


def test_amplified_join_agg_exact(spark, sf_dir, amplified):
    li_amp, ord_amp = amplified
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    base = dict(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    amp = dict(
        li_amp.join(ord_amp, li_amp.l_orderkey == ord_amp.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert amp == {k: v * AMP for k, v in base.items()}


def test_amplified_window_topk(spark, sf_dir, amplified):
    """Every amplified copy of a customer must produce the identical
    per-copy top-3 (window partitions scale horizontally)."""
    _, ord_amp = amplified
    w = Window.partitionBy("o_custkey", (F.col("o_orderkey") / KEY_STRIDE).cast("int")).orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    topk = ord_amp.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    orders = load_table(spark, sf_dir, "orders")
    w0 = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    base_n = orders.withColumn("rk", F.row_number().over(w0)).filter(F.col("rk") <= 3).count()
    assert topk.count() == base_n * AMP
