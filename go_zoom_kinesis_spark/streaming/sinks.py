"""Idempotent streaming sinks — exactly-once parquet output from an
at-least-once stream.

The reference guarantees at-least-once delivery and leans on the
checkpoint store to avoid duplicate *processing*
(/root/reference/src/processor.rs checkpoint-before-ack, src/store/).
On the batch-output side the same discipline is the idempotent
``foreachBatch`` sink: Structured Streaming replays a failed/restarted
micro-batch with the SAME ``batch_id``, so a sink that writes each
batch to its own ``batch_id=<n>`` partition with overwrite semantics
converges to exactly-once output no matter how many times a batch is
retried — replay rewrites identical bytes over the same directory
instead of appending duplicates.

This is the documented Spark recipe for exactly-once file output
(Structured Streaming programming guide, foreachBatch + idempotent
writes); no transaction log is needed because (path, batch_id) IS the
idempotency key.

Scale notes: each micro-batch writes its partitions in parallel from
the executors; the only driver-side work is directory bookkeeping.
Downstream batch readers scan ``out_dir`` recursively and see each
record exactly once; the ``batch_id=`` layout also gives them free
partition pruning for incremental consumption ("new batches since N").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_parquet_sink(out_dir: str):
    """Return a ``foreachBatch`` function writing each micro-batch to
    ``{out_dir}/batch_id={id}`` with overwrite — replay-safe by
    construction (same batch_id ⇒ same directory ⇒ same final bytes).
    """

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write


def start_idempotent_stream(
    df: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Wire a streaming DataFrame into the idempotent sink with an
    availableNow trigger (the drain-the-backlog mode the test harness
    and batch-catchup jobs use)."""
    return (
        df.writeStream.foreachBatch(idempotent_parquet_sink(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
