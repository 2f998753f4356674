"""Streaming Holt linear-trend smoothing — the stream tier of
``operators/timeseries.ts_holt_linear``.

Unlike the KMV sketch (order-insensitive set union), Holt is an
ORDERED fold, so the stream tier's contract is conditional on input
order: micro-batches must arrive in event-time order and each batch's
rows are sorted by the batch twin's exact (ts, event_id, value) key
before folding. Under that discipline — which a per-shard Kinesis
consumer provides within a shard by construction (the reference's
per-shard ordering guarantee, src/processor.rs shard loop; the O1
``ordering_audit`` pins the batch analog) — the final emitted row per
user is BIT-IDENTICAL to the batch operator over the same rows
(pinned in ``tests/test_r9_ops.py``).

State per user is four scalars (n, level, trend, first value) — the
first value must persist because the textbook init (l = x₂,
b = x₂ − x₁) can straddle a micro-batch boundary. O(1) state per key;
contrast the batch form, which collects each user's full history into
one row (fine batch-side, impossible on an unbounded stream).

SESSION-CONF SIDE EFFECT (contract): building the query SETS
``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
provider on the caller's SparkSession — ``transformWithState``
requires it (same rule as ``streaming/kmv_stream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

HOLT_STREAM_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("holt_level", DoubleType()),
        StructField("holt_trend", DoubleType()),
        StructField("forecast_next", DoubleType()),
    ]
)


def _holt_processor():
    from pyspark.sql.streaming import StatefulProcessor

    class HoltProcessor(StatefulProcessor):
        """ValueState (n, level, trend, x1) per user; every step is the
        batch twin's IEEE add/sub/halve sequence, applied in the same
        (ts, event_id, value) order."""

        def init(self, handle) -> None:
            self._st = handle.getValueState(
                "holt", "n bigint, l double, b double, x1 double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            recs = []
            for pdf in rows:
                recs.extend(
                    zip(pdf["ts"], pdf["event_id"], pdf["value"])
                )
            if not recs:
                return
            recs.sort()  # the batch twin's (ts, event_id, value) order
            st = self._st.get()
            n, level, trend, x1 = (
                (int(st[0]), float(st[1]), float(st[2]), float(st[3]))
                if st is not None
                else (0, 0.0, 0.0, 0.0)
            )
            for _, _, v in recs:
                x = float(v)
                if n == 0:
                    n, level, trend, x1 = 1, x, 0.0, x
                elif n == 1:
                    # textbook init consumes the first two observations
                    n, level, trend = 2, x, x - x1
                else:
                    l_new = ((x + level) + trend) / 2
                    trend = ((l_new - level) + trend) / 2
                    level = l_new
                    n += 1
            self._st.update((n, level, trend, x1))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_events": [n],
                    "holt_level": [level],
                    "holt_trend": [trend],
                    "forecast_next": [level + trend],
                }
            )

        def close(self) -> None:
            pass

    return HoltProcessor()


def streaming_holt_linear(events: DataFrame) -> DataFrame:
    """Per-user running Holt (level, trend, one-step forecast) over a
    stream; emits the refreshed row for every user touched by a
    micro-batch (Update mode)."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_holt_processor(),
            outputStructType=HOLT_STREAM_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )
