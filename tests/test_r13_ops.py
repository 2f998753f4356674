"""Round-13 referees: optimizations that changed an operator's
internals must reproduce the prior semantics bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from go_zoom_kinesis_spark.io import load_table


def test_percentile_stats_matches_builtin_percentile(spark):
    """r13 rewrote percentile_stats from ObjectHashAggregate
    percentile() to a codegen window plan that replicates Spark
    Percentile's interpolation arithmetic exactly — referee: the old
    form, inlined here, must agree bit-for-bit (pre-round doubles are
    compared via the same round(…, 6), identical to the query's own
    output contract)."""
    from go_zoom_kinesis_spark.operators.relational2 import percentile_stats

    pct = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.95))")
    old = {
        r["l_returnflag"]: r.asDict()
        for r in (
            load_table(spark, SF_DIR, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.round(pct.getItem(0), 6).alias("p25"),
                F.round(pct.getItem(1), 6).alias("p50"),
                F.round(pct.getItem(2), 6).alias("p95"),
                F.count("*").alias("n_rows"),
            )
            .collect()
        )
    }
    new = {
        r["l_returnflag"]: r.asDict()
        for r in percentile_stats(spark, SF_DIR).collect()
    }
    assert old == new


def test_percentile_stats_plan_has_no_object_hash_aggregate(spark):
    """The rewrite's point: no boxed aggregation buffers anywhere —
    the plan must be Window + codegen HashAggregate only."""
    from go_zoom_kinesis_spark.operators.relational2 import percentile_stats

    plan = percentile_stats(spark, SF_DIR)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ObjectHashAggregate" not in plan
    assert "Window" in plan
