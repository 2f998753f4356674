"""Semantic invariants for the chunking/BPE/reservoir operators
(operators/chunking.py) — beyond the oracle parity the registry suite
already enforces."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.operators.chunking import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    RESERVOIR_K,
    bpe_pair_stats,
    chunk_documents,
    reservoir_topk_per_lang,
)


def test_chunks_cover_every_char(spark, sf_dir):
    """Sum of per-doc covered prefix (last chunk start + its length)
    equals the doc length; consecutive chunks overlap by size-stride."""
    chunks = chunk_documents(spark, sf_dir).cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("n")
    )
    last = chunks.groupBy("doc_id").agg(
        F.max("chunk_idx").alias("last_idx"),
        F.max("chunk_start").alias("last_start"),
        F.count("*").alias("n_chunks"),
    )
    j = last.join(docs, "doc_id")
    # contiguous indexes 0..last
    assert j.filter(F.col("n_chunks") != F.col("last_idx") + 1).count() == 0
    # last chunk reaches the end of the document
    end = chunks.join(docs, "doc_id").filter(
        F.col("chunk_start") + F.col("chunk_len") < F.col("n")
    )
    tail_short = end.filter(F.col("chunk_len") < CHUNK_SIZE)
    assert tail_short.count() == 0  # only the final chunk may be short
    # every non-final chunk is exactly CHUNK_SIZE
    nonfinal = chunks.join(last, "doc_id").filter(
        F.col("chunk_idx") < F.col("last_idx")
    )
    assert nonfinal.filter(F.col("chunk_len") != CHUNK_SIZE).count() == 0
    assert CHUNK_STRIDE < CHUNK_SIZE  # windows genuinely overlap
    chunks.unpersist()


def test_bpe_pairs_match_local_reference(spark, sf_dir):
    """Top pair counts equal a pure-Python recount on the same corpus."""
    rows = bpe_pair_stats(spark, sf_dir).collect()
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    from collections import Counter

    counts = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    for r in rows:
        assert counts[r["pair"]] == r["n_occurrences"], r["pair"]
    # output really is the global top by count
    top = sorted(counts.values(), reverse=True)[: len(rows)]
    assert sorted((r["n_occurrences"] for r in rows), reverse=True) == top


def test_reservoir_exact_k_and_deterministic(spark, sf_dir):
    out1 = reservoir_topk_per_lang(spark, sf_dir)
    sizes = out1.groupBy("lang").count().collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lang_totals = {
        r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()
    }
    for r in sizes:
        assert r["count"] == min(RESERVOIR_K, lang_totals[r["lang"]])
    # deterministic across invocations
    a = sorted(map(tuple, out1.collect()))
    b = sorted(map(tuple, reservoir_topk_per_lang(spark, sf_dir).collect()))
    assert a == b
