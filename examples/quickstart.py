"""Quickstart — what a go-zoom-kinesis user writes here instead.

The reference's minimal program (its README): implement
``RecordProcessor::process_record``, pick a ``CheckpointStore``, build
``KinesisProcessor`` and run. The equivalent here, plus the analytics
layer the reference doesn't have:

    python examples/quickstart.py [sf_dir]

runs three stages on the driver test data:
1. the streaming capability layer — classify/retry/quarantine a batch
   of envelope records, checkpoint per shard, print the typed batch
   metrics;
2. the same engine surface through streaming (availableNow trigger);
3. two analytics queries from the registry (TPC-H Q1 and MinHash
   near-dup) — the layer a training-data pipeline actually lives in.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_zoom_kinesis_spark.io import load_table  # noqa: E402
from go_zoom_kinesis_spark.session import get_spark  # noqa: E402
from go_zoom_kinesis_spark.streaming import monitoring as M  # noqa: E402
from go_zoom_kinesis_spark.streaming.checkpoint import (  # noqa: E402
    InMemoryCheckpointStore,
)
from go_zoom_kinesis_spark.streaming.processor import (  # noqa: E402
    ProcessorConfig,
    StreamProcessor,
)

N_SHARDS = 4


def classify(df):
    """The user map (reference: RecordProcessor::process_record):
    tag each record success / soft-retry / hard-fail."""
    return df.withColumn(
        "outcome",
        F.when(F.col("event_type") == "error", F.lit("hard"))
        .when(
            (F.col("sequence_number") % 17 == 0) & (F.col("attempt") < 1),
            F.lit("soft"),
        )
        .otherwise(F.lit("success")),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="gzk-quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. batch through the processor (record envelope from events)
    records = load_table(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(N_SHARDS)).cast("string").alias("shard_id"),
        F.col("event_id").alias("sequence_number"),
        "ts",
        "event_type",
        F.col("props").alias("data"),
        "value",
    )
    store = InMemoryCheckpointStore()
    agg = M.MetricsAggregator()
    sunk: list = []
    with tempfile.TemporaryDirectory() as tmp:
        proc = StreamProcessor(
            spark,
            processor=classify,
            store=store,
            config=ProcessorConfig(checkpoint_location=os.path.join(tmp, "ck")),
            aggregator=agg,
            sink=lambda df, epoch: sunk.extend(df.collect()),
        )
        proc.run_batch(records.limit(500))
    (bm,) = [
        e.detail["metrics"]
        for e in agg.events
        if e.event_type == M.BATCH_METRICS
    ]
    print(
        f"processed={bm.records_success} failed={bm.records_failed} "
        f"soft_retries={bm.soft_retries} passes={bm.attempt_passes} "
        f"checkpoints={bm.checkpoints_saved} in {bm.duration_ms:.0f} ms"
    )
    print("per-shard checkpoints:", store.all_checkpoints())

    # --- 2. the analytics layer (what the reference doesn't have)
    from go_zoom_kinesis_spark.registry import all_queries

    queries = all_queries()
    print("\nTPC-H Q1 pricing summary:")
    queries["q1_pricing_summary"](spark, sf_dir).show(4, truncate=False)
    print("MinHash-LSH near-duplicate pairs:")
    queries["dedup_minhash_lsh"](spark, sf_dir).show(4, truncate=False)


if __name__ == "__main__":
    main()
