"""Streaming KMV distinct sketch — the stream tier of the mergeable-
sketch architecture.

Batch twin: ``operators/stats.kmv_distinct_sketch`` (same 56-bit md5
hash, same K, same integer estimator). KMV's defining property —
sketches merge by keeping the K smallest of a union — is exactly what
makes it streaming-friendly: the keyed state is ONE K-row list per
group, each micro-batch folds its new hashes into it, and the emitted
estimate after the last batch is bit-identical to the batch operator
run over the same rows (pinned in ``tests/test_kmv.py``). The
reference's running per-shard metrics (src/monitoring/types.rs) are
the streaming-counter cousin; KMV is what "distinct users so far"
should be at 100 TB — O(K) state per group instead of a
distinct-set that grows with the corpus.

SESSION-CONF SIDE EFFECT (contract): building the query SETS
``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
provider on the caller's SparkSession — ``transformWithState``
requires it (same rule as ``streaming/stateful_v2``), and the setting
persists for later streaming queries on the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.stats import KMV_HEX, KMV_K, KMV_SPACE

KMV_STREAM_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("k_used", LongType()),
        StructField("kth_min_hash", LongType()),
        StructField("est_distinct", LongType()),
    ]
)


def _kmv_processor():
    from pyspark.sql.streaming import StatefulProcessor

    class KmvSketchProcessor(StatefulProcessor):
        """One K-row ListState (the k smallest hashes) per group key —
        bounded state by construction, merged per micro-batch."""

        def init(self, handle) -> None:
            self._sk = handle.getListState("kmin", "h bigint")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            hs = set()
            for pdf in rows:
                hs.update(int(x) for x in pdf["h"])
            if not hs:
                return
            prev = [int(v[0]) for v in self._sk.get()]
            merged = sorted(set(prev) | hs)[:KMV_K]
            self._sk.put([(h,) for h in merged])
            k_used = len(merged)
            kth = merged[-1]
            est = (
                k_used
                if k_used < KMV_K
                else (KMV_K - 1) * KMV_SPACE // kth
            )
            yield pd.DataFrame(
                {
                    "event_type": [str(key[0])],
                    "k_used": [k_used],
                    "kth_min_hash": [kth],
                    "est_distinct": [est],
                }
            )

        def close(self) -> None:
            pass

    return KmvSketchProcessor()


def streaming_kmv_sketch(
    events: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Per-event-type running distinct-``key_col`` estimate over a
    stream. Emits the refreshed (k_used, kth_min_hash, est_distinct)
    row for every group touched by a micro-batch (Update mode); the
    hash runs JVM-side BEFORE the stateful operator so the Python
    processor only ever sees 64-bit integers."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, KMV_HEX),
        16,
        10,
    ).cast("bigint")
    return (
        events.select("event_type", h.alias("h"))
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=_kmv_processor(),
            outputStructType=KMV_STREAM_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )
