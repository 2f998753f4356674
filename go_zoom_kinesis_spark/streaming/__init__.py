"""Structured-Streaming capability layer — the faithful re-expression
of the reference's stream processor (SURVEY.md §2.1 / §3):

  backoff     — exponential/fixed backoff w/ jitter (P4)
  retry       — bounded interruptible retry engine (P3)
  checkpoint  — pluggable checkpoint stores (K1/K3/K4)
  processor   — foreachBatch harness: per-record map, soft/hard retry
                classification, DLQ, before_checkpoint barrier,
                checkpoint-preferred resume, timeouts (T1-T4, S2-S5, K2)
  monitoring  — processing events + per-shard metrics (M1/A2/A3)
"""

from .backoff import ExponentialBackoff, FixedBackoff
from .checkpoint import InMemoryCheckpointStore, JsonFileCheckpointStore
from .limits import limit_shard_concurrency, record_timeout_transform
from .monitoring import MetricsAggregator, MonitoringEvent
from .processor import (
    AtSequenceNumber,
    AtTimestamp,
    Latest,
    ProcessorConfig,
    StreamProcessor,
    TrimHorizon,
)
from .retry import RetryExhausted, RetryHandle, ShutdownRequested

__all__ = [
    "AtSequenceNumber",
    "AtTimestamp",
    "ExponentialBackoff",
    "FixedBackoff",
    "InMemoryCheckpointStore",
    "JsonFileCheckpointStore",
    "Latest",
    "limit_shard_concurrency",
    "MetricsAggregator",
    "record_timeout_transform",
    "MonitoringEvent",
    "ProcessorConfig",
    "RetryExhausted",
    "RetryHandle",
    "ShutdownRequested",
    "StreamProcessor",
    "TrimHorizon",
]
