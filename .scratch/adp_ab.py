"""approx_distinct_parts fan-out A/B (r14)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from pyspark.sql import functions as F


def build(spark, fan: bool):
    from go_zoom_kinesis_spark.io import fan_out_narrow, load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_partkey"
    )
    if fan:
        li = fan_out_narrow(li)
    dd = li.groupBy("l_returnflag", "l_partkey").agg(F.count("*").alias("c"))
    exact = F.count("l_partkey")
    approx = F.approx_count_distinct("l_partkey", 0.01)
    return dd.groupBy("l_returnflag").agg(
        exact.alias("n_parts_exact"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            / exact.cast("double")
            <= 0.03
        ).alias("approx_within_3pct"),
        F.sum("c").alias("n_rows"),
    )


def main() -> None:
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-adp-ab")
    spark.range(1).count()
    for name, fan in (("plain", False), ("fanned", True), ("plain2", False), ("fanned2", True)):
        spark.catalog.clearCache()
        df = build(spark, fan)
        spark.sparkContext.setJobDescription(f"adp:{name}:warm")
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(5):
            spark.sparkContext.setJobDescription(f"adp:{name}:{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(runs):.3f} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
