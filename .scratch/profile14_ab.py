"""profile_columns variant A/B (r14): where does the ~1s floor live?

Variants:
  pin_ser  — committed r14 shape: pinned (SER) 5-col projection, 5 typed aggs
  pin_des  — same, default deserialized pin level
  nopin    — 5 direct parquet scans (each pruned to its own column), fanned
  branch:<col> — single typed branch over a SER pin (cost breakdown)
  unpivot  — the r13 registered shape (for same-session reference)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "5"))

from functools import reduce

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rollup(per_val):
    return per_val.groupBy("column_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("v").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_nulls"),
        F.count("v").alias("n_distinct"),
        F.min("v").alias("min_str"),
        F.max("v").alias("max_str"),
    )


def _branch(src, c):
    return (
        src.groupBy(c)
        .agg(F.count("*").alias("cnt"))
        .select(
            F.lit(c).alias("column_name"),
            F.col(c).cast("string").alias("v"),
            "cnt",
        )
    )


def build(spark, variant):
    from go_zoom_kinesis_spark.io import fan_out_narrow, load_table
    from go_zoom_kinesis_spark.operators.quality import PROFILE_COLS
    from go_zoom_kinesis_spark.persist import pin

    if variant == "unpivot":
        li = fan_out_narrow(
            load_table(spark, SF_DIR, "lineitem").select(*PROFILE_COLS)
        )
        pairs = li.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column_name"),
                            F.col(c).cast("string").alias("v"),
                        )
                        for c in PROFILE_COLS
                    ]
                )
            ).alias("p")
        ).select("p.*")
        per_val = pairs.groupBy("column_name", "v").agg(
            F.count("*").alias("cnt")
        )
        return _rollup(per_val)
    if variant == "nopin":
        branches = [
            _branch(
                fan_out_narrow(
                    load_table(spark, SF_DIR, "lineitem").select(c)
                ),
                c,
            )
            for c in PROFILE_COLS
        ]
        return _rollup(reduce(DataFrame.unionByName, branches))
    level = StorageLevel.MEMORY_AND_DISK if variant != "pin_des" else None
    li = pin(
        fan_out_narrow(
            load_table(spark, SF_DIR, "lineitem").select(*PROFILE_COLS)
        ),
        storage_level=level,
    )
    if variant.startswith("branch:"):
        return _branch(li, variant.split(":", 1)[1])
    return _rollup(
        reduce(DataFrame.unionByName, [_branch(li, c) for c in PROFILE_COLS])
    )


def main() -> None:
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-prof14-ab")
    spark.range(1).count()
    for variant in sys.argv[1:]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = build(spark, variant)
        b = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"pc:{variant}:warm")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        runs = []
        for i in range(N):
            spark.sparkContext.setJobDescription(f"pc:{variant}:{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            f"{variant}: build={b:.3f} warm={w:.3f} min={min(runs):.3f} "
            f"runs={runs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
