"""Streaming-state introspection — Spark's state data source read
against a query checkpoint: the production debugging surface that
turns a running (or stopped) streaming query's internal state into an
ordinary DataFrame.

The reference exposes its per-shard state only through log lines and
the metrics channel (src/monitoring/types.rs); on Spark the state
store itself is queryable: ``statestore`` reads one operator's keyed
state (key struct, value struct, partition id), ``state-metadata``
lists the operators, state store names and batch id range available
in a checkpoint. Together they answer the two incident-time questions
— "what IS the state for key X right now?" and "which operators/
batches does this checkpoint even hold?" — with zero custom tooling.

Scale: the state source reads the HDFS/RocksDB store files directly,
one task per state partition — no need to stop or rewind the query;
a 10k-partition store reads as a 10k-task scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_query_state(
    spark: SparkSession,
    checkpoint_dir: str,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
    join_side: str | None = None,
) -> DataFrame:
    """Keyed state of one stateful operator from a checkpoint.

    Defaults to the latest committed batch of operator 0 — the common
    single-stateful-operator query. ``store_name``/``join_side``
    address the multi-store operators (stream-stream joins keep four
    stores; pass ``join_side="left"/"right"`` instead of guessing
    store names)."""
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if operator_id:
        r = r.option("operatorId", operator_id)
    if store_name:
        r = r.option("storeName", store_name)
    if join_side:
        r = r.option("joinSide", join_side)
    return r.load(checkpoint_dir)


def read_state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator/store inventory of a checkpoint: operator ids + names,
    state store names, partition counts, and the [min, max] batch-id
    range still readable — the map you consult before
    ``read_query_state``."""
    return spark.read.format("state-metadata").load(checkpoint_dir)
