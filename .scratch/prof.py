"""Per-query isolated profiler (recreated after sandbox restart).

Usage: python .scratch/prof.py [-n RUNS] [--explain SUFFIX] NAME [NAME...]

For each query name: clearCache(), build the DataFrame, one warm-up
noop write, then min-of-N timed noop writes (guide §1.4), with
setJobDescription labels.  --explain SUFFIX dumps
plans/r13/<name>_<SUFFIX>.txt with explain("formatted").
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--explain", default=None)
    args = ap.parse_args()

    from go_zoom_kinesis_spark import registry
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-prof")
    jvm = spark._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    queries = registry.all_queries()
    spark.range(1).count()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in args.names:
        fn = queries.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND")
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        build = time.perf_counter() - t0
        if args.explain:
            out = os.path.join(repo, "plans", "r13", f"{name}_{args.explain}.txt")
            with open(out, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription(f"prof:{name}:warmup")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        best = float("inf")
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"prof:{name}:run{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
        print(
            f"{name}: build={build:.3f} warm={warm:.3f} "
            f"min={best:.3f} runs={runs}"
        )


if __name__ == "__main__":
    main()
