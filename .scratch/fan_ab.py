"""Global fan-out A/B: for every registered query whose plan changes
when io._FAN_OUT_DISABLED is flipped, time fanned vs unfanned
(isolated, min-of-3 noop) at sf0.1 on this host.

Usage: python .scratch/fan_ab.py [--only name1,name2] [--detect-only]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from go_zoom_kinesis_spark import io as gio
from go_zoom_kinesis_spark import registry
from go_zoom_kinesis_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def _plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def _time(spark, fn):
    spark.catalog.clearCache()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--detect-only", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="fan-ab")
    jvm = spark._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    spark.range(1).count()
    queries = registry.all_queries()
    names = (
        args.only.split(",") if args.only else sorted(queries)
    )
    if args.only:
        affected = names
        print("AFFECTED (explicit):", len(affected))
        _run_ab(spark, queries, affected, args)
        return

    affected = []
    for name in names:
        fn = queries[name]
        try:
            gio._FAN_OUT_DISABLED = False
            p1 = _plan(spark, fn(spark, SF_DIR))
            gio._FAN_OUT_DISABLED = True
            p0 = _plan(spark, fn(spark, SF_DIR))
        finally:
            gio._FAN_OUT_DISABLED = False
        if p1.count("RoundRobinPartitioning") != p0.count(
            "RoundRobinPartitioning"
        ):
            affected.append(name)
    print("AFFECTED:", len(affected))
    for n in affected:
        print(" ", n)
    if args.detect_only:
        return
    _run_ab(spark, queries, affected, args)


def _run_ab(spark, queries, affected, args):
    print("name,fanned,unfanned,delta")
    for name in affected:
        fn = queries[name]
        try:
            gio._FAN_OUT_DISABLED = False
            t_fan = _time(spark, fn)
            gio._FAN_OUT_DISABLED = True
            t_nofan = _time(spark, fn)
        except Exception as e:
            print(f"AB {name},ERROR,{e}", flush=True)
            continue
        finally:
            gio._FAN_OUT_DISABLED = False
        print(
            f"AB {name},{t_fan:.3f},{t_nofan:.3f},{t_fan - t_nofan:+.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
