"""A/B: percentile_stats exact-window rewrite vs current form.

Checks bit-exact result equality at sf0.001/sf0.01/sf0.1 and times
both isolated (min-of-3 noop) at sf0.1.

The candidate replicates Spark Percentile's exact arithmetic:
  position = (N-1) * p            (Long * Double)
  lower = floor(position).toLong; higher = ceil(position).toLong
  if higher == lower or v_hi == v_lo: v_lo
  else (higher - position) * v_lo + (position - lower) * v_hi
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.relational2 import percentile_stats
from go_zoom_kinesis_spark.session import get_spark

PS = (0.25, 0.5, 0.95)
NAMES = ("p25", "p50", "p95")


def percentile_stats_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    wp = Window.partitionBy("l_returnflag")
    wo = wp.orderBy("l_extendedprice")
    vals = (
        li.withColumn("n_rows", F.count(F.lit(1)).over(wp))
        .where(F.col("l_extendedprice").isNotNull())
        .select(
            "l_returnflag",
            "l_extendedprice",
            "n_rows",
            F.row_number().over(wo).alias("rn"),
            F.count("l_extendedprice").over(wp).alias("nv"),
        )
    )
    idx = F.col("rn") - 1
    conds = []
    aggs = [F.max("n_rows").alias("n_rows"), F.max("nv").alias("nv")]
    for name, p in zip(NAMES, PS):
        pos = (F.col("nv") - 1) * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        conds += [idx == lo, idx == hi]
        aggs += [
            F.max(F.when(idx == lo, F.col("l_extendedprice"))).alias(f"vlo_{name}"),
            F.max(F.when(idx == hi, F.col("l_extendedprice"))).alias(f"vhi_{name}"),
        ]
    picked = vals.where(
        conds[0] | conds[1] | conds[2] | conds[3] | conds[4] | conds[5]
    )
    agg = picked.groupBy("l_returnflag").agg(*aggs)
    outs = ["l_returnflag"]
    sel = []
    for name, p in zip(NAMES, PS):
        pos = (F.col("nv") - 1) * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        vlo, vhi = F.col(f"vlo_{name}"), F.col(f"vhi_{name}")
        interp = F.when((hi == lo) | (vhi == vlo), vlo).otherwise(
            (hi - pos) * vlo + (pos - lo) * vhi
        )
        sel.append(F.round(interp, 6).alias(name))
    return agg.select("l_returnflag", *sel, F.col("n_rows").alias("n_rows"))


def percentile_stats_window_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pre-filter Window node for both counts, then the rn window."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    wp = Window.partitionBy("l_returnflag")
    wo = wp.orderBy("l_extendedprice")
    base = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.count(F.lit(1)).over(wp).alias("n_rows"),
        F.count("l_extendedprice").over(wp).alias("nv"),
    )
    vals = base.where(F.col("l_extendedprice").isNotNull()).select(
        "*", F.row_number().over(wo).alias("rn")
    )
    return _finish(vals)


def percentile_stats_window_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts via a tiny broadcast-joined aggregate; single rn window."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    counts = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_extendedprice").alias("nv"),
    )
    wo = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    vals = (
        li.where(F.col("l_extendedprice").isNotNull())
        .join(F.broadcast(counts), "l_returnflag")
        .select("*", F.row_number().over(wo).alias("rn"))
    )
    return _finish(vals)


def _finish(vals: DataFrame) -> DataFrame:
    idx = F.col("rn") - 1
    conds = []
    aggs = [F.max("n_rows").alias("n_rows"), F.max("nv").alias("nv")]
    for name, p in zip(NAMES, PS):
        pos = (F.col("nv") - 1) * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        conds += [idx == lo, idx == hi]
        aggs += [
            F.max(F.when(idx == lo, F.col("l_extendedprice"))).alias(f"vlo_{name}"),
            F.max(F.when(idx == hi, F.col("l_extendedprice"))).alias(f"vhi_{name}"),
        ]
    picked = vals.where(
        conds[0] | conds[1] | conds[2] | conds[3] | conds[4] | conds[5]
    )
    agg = picked.groupBy("l_returnflag").agg(*aggs)
    sel = []
    for name, p in zip(NAMES, PS):
        pos = (F.col("nv") - 1) * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        vlo, vhi = F.col(f"vlo_{name}"), F.col(f"vhi_{name}")
        interp = F.when((hi == lo) | (vhi == vlo), vlo).otherwise(
            (hi - pos) * vlo + (pos - lo) * vhi
        )
        sel.append(F.round(interp, 6).alias(name))
    return agg.select("l_returnflag", *sel, F.col("n_rows").alias("n_rows"))


def main() -> None:
    spark = get_spark(app_name="pctl-ab")
    spark.range(1).count()
    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        old = {
            r["l_returnflag"]: r.asDict()
            for r in percentile_stats(spark, d).collect()
        }
        for label, cand in (
            ("A", percentile_stats_window),
            ("B", percentile_stats_window_b),
            ("C", percentile_stats_window_c),
        ):
            new = {
                r["l_returnflag"]: r.asDict()
                for r in cand(spark, d).collect()
            }
            ok = old == new
            print(f"sf{sf} {label}: equal={ok}")
            if not ok:
                for k in old:
                    if old[k] != new.get(k):
                        print("  OLD", old[k])
                        print("  NEW", new.get(k))
    d = "/root/testdata/sf0.1"
    for label, fn in (
        ("old", percentile_stats),
        ("A", percentile_stats_window),
        ("B", percentile_stats_window_b),
        ("C", percentile_stats_window_c),
    ):
        spark.catalog.clearCache()
        df = fn(spark, d)
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
