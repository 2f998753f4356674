"""Streaming twins of the LLM-pipeline curation stages — the batch
operators in ``operators/privacy.py`` / ``operators/dedup.py`` applied
to unbounded streams, the way an ingest pipeline runs them before
documents ever land in the lake.

Reference relevance: the reference is an unbounded-stream system
(per-record delivery, ref src/processor.rs:1490-1525); these close the
loop by running the curation surface *inside* the stream instead of as
a post-hoc batch pass.

- ``streaming_exact_dedup`` uses ``dropDuplicatesWithinWatermark``:
  state is keyed by content hash and evicted once the event-time
  watermark passes, so state size is bounded by (dup horizon ×
  ingest rate), not by corpus history — the only shape that survives
  an unbounded 100 TB/day stream. Cross-micro-batch duplicates within
  the horizon are dropped exactly like a batch ``groupBy(sha)``.
- ``scrub_text`` is the stateless PII projection shared verbatim
  between batch and streaming plans (same Column expression tree), so
  the batch-vs-stream equivalence test is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.privacy import EMAIL_RE, IP_RE, PHONE_RE


def scrub_text(col: Column) -> Column:
    """Stateless PII redaction expression (email → phone → ip, fixed
    order) — usable identically in batch and streaming projections."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )


def scrub_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch/stream-agnostic scrub projection: adds redacted text and
    per-class counts. Pure per-row codegen — no state, no watermark
    requirements."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "redacted_text": scrub_text(c),
            "n_emails": F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)),
            "n_phones": F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0)),
            "n_ips": F.size(F.regexp_extract_all(c, F.lit(IP_RE), 0)),
        }
    )


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact content dedup over a stream: first arrival of each
    content hash within the watermark horizon survives; later
    duplicates — same micro-batch or a later one — are dropped.
    State per key is just the hash + timestamp and is evicted at the
    watermark, so this runs forever at constant memory per key-horizon.
    """
    hashed = docs.withColumn(
        "content_sha", F.sha2(F.col(text_col), 256)
    )
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_sha"]
    )
