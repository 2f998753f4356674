"""Multimodal column plumbing — north-star extension (SURVEY.md §2.2).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, exactly like the reference's opaque Kinesis record payload
(`/root/reference/src/lib.rs:69`: the engine never interprets bytes;
the user decode step does). The *Spark-side plumbing* here is real and
tested — schemas, Arrow batch shapes, mapInPandas signatures,
partitioning — while the actual media decode is stubbed (no image/audio
libraries in this container):

- ``decode_image`` raises NotImplementedError (clearly-marked STUB)
- ``fake_decode_features`` is the deterministic stand-in used by the
  pipeline and tests: features derived from the payload bytes

Because no binary test table exists, payloads are synthesized from
``documents.text`` (utf-8 encode) — at 100 TB the same pipeline reads
parquet binary columns directly.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, features array<double>"
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct — the
    multimodal storage model (binary + metadata, never decoded by the
    engine)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col("text")).alias("n_bytes"),
            # fake modality assignment — deterministic from content size
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.octet_length(F.col("text")) % 3 + 1).cast("int"),
            ).alias("modality"),
            F.sha2(F.col("text"), 256).alias("content_sha"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """STUB: real image decode (PIL/opencv not in this container).

    The production implementation decodes inside ``mapInPandas`` batches
    (see ``multimodal_features_pipeline``) so bytes never leave the
    executor; only derived features flow on.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this environment; "
        "use fake_decode_features for the deterministic test path"
    )


def fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a media feature extractor: a rolling
    byte histogram. Same bytes → same features, any language."""
    acc = [0.0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += float(b)
    n = max(len(payload), 1)
    return [round(v / n, 6) for v in acc]


def multimodal_features_pipeline(docs: DataFrame) -> DataFrame:
    """The real Spark plumbing: binary payloads → Arrow batches →
    per-batch vectorized feature extraction via ``mapInPandas``.
    Partition-parallel; batch-shaped exactly like a GPU decode stage."""
    src = with_payload(docs).select(
        "doc_id", "payload", F.col("meta.modality").alias("modality")
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": pdf["payload"].map(fake_decode_features),
                }
            )

    return src.mapInPandas(extract, schema=FEATURES_SCHEMA)


# --- driver-checkable queries ------------------------------------------


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payloads — engine-side, no decode:
    byte length, content hash, modality tag (all codegen'd)."""
    docs = load_table(spark, sf_dir, "documents")
    wp = with_payload(docs)
    return wp.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.modality").alias("modality"),
        F.col("meta.content_sha").alias("content_sha"),
    )


def multimodal_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-style rollup per modality (the 'how much of each media
    type' scan a training pipeline runs before sampling)."""
    docs = load_table(spark, sf_dir, "documents")
    wp = with_payload(docs)
    return wp.groupBy(F.col("meta.modality").alias("modality")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("meta.n_bytes").cast("bigint")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (deterministic fake decode) — no
    SQL oracle (Python batch stage); driver records rows-only check."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal_features_pipeline(docs)


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_modality_stats": multimodal_modality_stats,
    "multimodal_features": multimodal_features,
}

ORACLE = {
    "multimodal_meta": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
               sha256(text) AS content_sha
        FROM documents
    """,
    "multimodal_modality_stats": """
        SELECT CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
               count(*) AS n_items,
               sum(CAST(octet_length(encode(text)) AS BIGINT)) AS total_bytes,
               max(octet_length(encode(text))) AS max_bytes
        FROM documents
        GROUP BY 1
    """,
}
