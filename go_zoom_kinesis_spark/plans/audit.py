"""Physical-plan audit — the 100 TB design-review tool.

``plan_summary(df)`` extracts the scale-relevant facts from the
executed plan: what reached the parquet scan (pushed filters, read
schema), how joins were planned (broadcast vs shuffle vs cartesian),
how many exchanges (shuffles) the plan pays for, and whether hot paths
stayed in whole-stage codegen. tests/test_plans.py pins these for the
headline queries so a regression (lost pushdown, surprise cartesian)
fails CI rather than surfacing as a 100× slowdown at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _executed_plan(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # an executed AQE plan prints Final AND Initial sections — audit the
    # final one only, or every node would be counted twice
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    return plan


def explain_formatted(df: DataFrame) -> str:
    """The formatted explain string (same as df.explain('formatted'))."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        qe, "formatted"
    )


def plan_summary(df: DataFrame) -> dict:
    """Scale-relevant plan facts. Keys:

    pushed_filters   list[str]  per-scan pushed-filter blocks
    read_schemas     list[str]  per-scan column sets actually read
    n_exchanges      int        shuffle count (Exchange hashpartitioning/rangepartitioning/SinglePartition)
    broadcast_joins  int
    sortmerge_joins  int
    cartesian        bool       any CartesianProduct / unconditioned BNLJ
    has_codegen      bool       at least one whole-stage codegen stage
    """
    plan = _executed_plan(df)
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", plan),
        "n_exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "cartesian": "CartesianProduct" in plan,
        "has_codegen": "*(" in plan,
    }
