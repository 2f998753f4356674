"""q1_pricing_summary fan-out A/B (r14)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from pyspark.sql import functions as F


def build(spark, fan: bool):
    from go_zoom_kinesis_spark.io import fan_out_narrow, load_table
    from go_zoom_kinesis_spark.operators import relational as R
    import go_zoom_kinesis_spark.io as io_mod

    if fan:
        orig = io_mod.load_table
        def patched(spark2, sf_dir2, name2):
            df = orig(spark2, sf_dir2, name2)
            return fan_out_narrow(df) if name2 == "lineitem" else df
        io_mod_load = patched
        R.load_table_patched = patched
        # call q1 with a fanned lineitem by monkeypatching the module ref
        saved = R._t
        def _t2(spark3, sf_dir3, name3):
            df = saved(spark3, sf_dir3, name3)
            return fan_out_narrow(df) if name3 == "lineitem" else df
        R._t = _t2
        try:
            return R.q1_pricing_summary(spark, SF_DIR)
        finally:
            R._t = saved
    return R.q1_pricing_summary(spark, SF_DIR)


def main() -> None:
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-q1-ab")
    spark.range(1).count()
    for name, fan in (("plain", False), ("fanned", True), ("plain2", False), ("fanned2", True)):
        spark.catalog.clearCache()
        df = build(spark, fan)
        spark.sparkContext.setJobDescription(f"q1:{name}:warm")
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(5):
            spark.sparkContext.setJobDescription(f"q1:{name}:{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(runs):.3f} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
