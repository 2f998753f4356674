"""Phase breakdown of the streaming bench's single micro-batch.

Replays process_batch's operations on the same 2M-row envelope as a
static frame, timing each phase, to locate where the 7s goes:
  cache+rollup | sink count | checkpoint agg | (sum) vs end-to-end run.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-stream-phase")
    n, k = 2_000_000, 8
    work = tempfile.mkdtemp(prefix="gzk_phase_")
    src = os.path.join(work, "src")
    (
        spark.range(n)
        .select(
            F.concat(F.lit("shard-"), (F.col("id") % k)).alias("shard_id"),
            F.col("id").alias("sequence_number"),
            (F.lit(1_700_000_000) + F.col("id") / 1000)
            .cast("timestamp")
            .alias("ts"),
            F.concat(F.lit("pk"), F.col("id") % 1000).alias("partition_key"),
            F.sha1(F.col("id").cast("string")).alias("data"),
        )
        .repartition(k, "shard_id")
        .write.mode("overwrite")
        .parquet(src)
    )

    def transform(df):
        return df.withColumn("decoded_len", F.length("data")).withColumn(
            "outcome", F.lit("success")
        )

    for trial in range(3):
        spark.catalog.clearCache()
        t_all = time.perf_counter()
        batch = spark.read.parquet(src).filter(F.lit(True))
        pending = batch.withColumn("attempt", F.lit(0))
        t0 = time.perf_counter()
        from pyspark import StorageLevel
        out = transform(pending).persist(StorageLevel.MEMORY_AND_DISK)
        rows = out.groupBy("shard_id", "outcome").count().collect()
        t_rollup = time.perf_counter() - t0
        t0 = time.perf_counter()
        items = out.filter(F.col("outcome") == "success")
        n_sunk = items.count()
        t_sink = time.perf_counter() - t0
        t0 = time.perf_counter()
        ck = (
            items.groupBy("shard_id")
            .agg(F.max(F.col("sequence_number")).cast("string").alias("max_seq"))
            .collect()
        )
        t_ckpt = time.perf_counter() - t0
        total = time.perf_counter() - t_all
        out.unpersist()
        print(
            f"trial{trial}: rollup={t_rollup:.2f} sink_count={t_sink:.2f} "
            f"ckpt={t_ckpt:.2f} total={total:.2f} "
            f"(rows={sum(r['count'] for r in rows)}, sunk={n_sunk}, "
            f"shards={len(ck)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
