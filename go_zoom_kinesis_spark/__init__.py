"""go_zoom_kinesis_spark — a PySpark-native analytics engine with the
capabilities of the `cgorski/go-zoom-kinesis` reference (a Rust Kinesis
stream processor: shard-parallel ordered consumption → user map with
retry classification → at-least-once checkpointing → windowed metrics),
re-expressed Spark-first, plus a relational/LLM-data-pipeline analytics
layer designed for 100 TB scale.

Layout:
  session     — SparkSession factory (local test defaults, AQE on)
  io          — parquet table loading over the driver test data
  operators/  — batch query library (the driver-checkable surface)
  sources/    — file-format scans/sinks + stream source builders
  streaming/  — Structured Streaming capability layer (checkpointing,
                retry/DLQ classification, monitoring, event-time
                windows, keyed state) mirroring the reference's
                processor semantics
  plans/      — physical-plan audit utilities
"""

__version__ = "0.1.0"
