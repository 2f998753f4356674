"""profile_columns A/B: 2-slot typed unpivot (cast-after-dedup) vs
current string unpivot. Equality at 3 SFs + isolated timing at sf0.1."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import fan_out_narrow, load_table
from go_zoom_kinesis_spark.operators.quality import PROFILE_COLS, profile_columns
from go_zoom_kinesis_spark.session import get_spark

# slot assignment: integer-typed columns ride a long slot (no string
# render pre-shuffle); the timestamp rides the long slot as epoch
# seconds and is rendered back post-dedup; string/double columns ride
# the string slot (double -> string rendering is not reconstructible
# from a long).
LONG_COLS = {"l_orderkey", "l_partkey"}
TS_COLS = {"l_shipdate"}


def profile_columns_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = fan_out_narrow(
        load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLS)
    )
    structs = []
    for c in PROFILE_COLS:
        if c in LONG_COLS:
            vl = F.col(c).cast("long")
            vs = F.lit(None).cast("string")
        elif c in TS_COLS:
            vl = F.unix_timestamp(F.col(c))
            vs = F.lit(None).cast("string")
        else:
            vl = F.lit(None).cast("long")
            vs = F.col(c).cast("string")
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                vl.alias("vl"),
                vs.alias("vs"),
            )
        )
    pairs = li.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    per_val = pairs.groupBy("column_name", "vl", "vs").agg(
        F.count("*").alias("cnt")
    )
    isnull = F.col("vl").isNull() & F.col("vs").isNull()
    rendered = F.when(
        F.col("column_name").isin(*sorted(LONG_COLS)),
        F.col("vl").cast("string"),
    ).when(
        F.col("column_name").isin(*sorted(TS_COLS)),
        F.date_format(F.timestamp_seconds(F.col("vl")), "yyyy-MM-dd HH:mm:ss"),
    ).otherwise(F.col("vs"))
    per_val = per_val.select(
        "column_name", "cnt", F.when(~isnull, rendered).alias("v")
    )
    return per_val.groupBy("column_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("v").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_nulls"),
        F.count("v").alias("n_distinct"),
        F.min("v").alias("min_str"),
        F.max("v").alias("max_str"),
    )


def main() -> None:
    spark = get_spark(app_name="profile-ab")
    spark.range(1).count()
    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        old = {
            r["column_name"]: r.asDict()
            for r in profile_columns(spark, d).collect()
        }
        new = {
            r["column_name"]: r.asDict()
            for r in profile_columns_typed(spark, d).collect()
        }
        print(f"sf{sf}: equal={old == new}", flush=True)
        if old != new:
            for k in old:
                if old[k] != new.get(k):
                    print("  OLD", old[k])
                    print("  NEW", new.get(k))
    d = "/root/testdata/sf0.1"
    for label, fn in (("old", profile_columns), ("typed", profile_columns_typed)):
        spark.catalog.clearCache()
        df = fn(spark, d)
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: min={min(runs)} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
