"""Document chunking + tokenizer-training primitives — the
RAG-ingest / BPE-training half of an LLM data pipeline.

The reference (go-zoom-kinesis) ends at per-record delivery
(src/processor.rs); what a training/RAG pipeline does with delivered
documents — split them into overlapping windows, count merge-candidate
symbol pairs, draw fixed-size per-stratum samples — is the analytics
completion this module adds (SURVEY.md §2 north-star extensions).

All three operators are pure built-in column ops (split / sequence /
explode / substring / window) — no Python in the hot path, so the
whole stage is JVM codegen.

Scale notes (100 TB):
- ``chunk_documents``: explode(sequence) is a NARROW transform — chunk
  rows are produced inside the scan stage, no shuffle at all; output
  partitioning follows the input file splits. Chunk count per task is
  bounded by doc length / stride, so no task amplification skew beyond
  the document-length skew already present in the input.
- ``bpe_pair_stats``: the double explode (tokens × positions) fans out
  ~n_chars rows per document, all map-side; the only exchange is the
  final pair-count aggregate (map-side partial combine collapses to
  |alphabet|² ≈ small), then a tiny top-k sort on the aggregated set.
  This is exactly one BPE merge-selection iteration; a full BPE train
  loops this with a shrinking pair table.
- ``reservoir_topk_per_lang``: deterministic fixed-k reservoir per
  stratum via rank-over-content-hash. One shuffle on the stratum key;
  at extreme per-key cardinality swap the window for the two-phase
  per-partition top-k + merge (same result by hash-order determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashes as H
from ..io import fan_out_narrow, load_table

CHUNK_SIZE = 120
CHUNK_STRIDE = 80
RESERVOIR_K = 5
TOP_PAIRS = 30


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan out the single-file scan before the CPU-heavy explodes
    return fan_out_narrow(load_table(spark, sf_dir, "documents"))


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width character windows per document
    (size 120, stride 80) — the RAG-ingest chunker. Chunk count is
    ``floor((max(len-size,0)+stride-1)/stride)+1`` so every char is
    covered and a short document still yields one chunk; the final
    chunk may be shorter. chunk_id = doc_id·10^4 + idx is a stable
    global key (guarded: idx < 10^4)."""
    docs = _docs(spark, sf_dir)
    n = F.length("text")
    n_chunks = (
        F.floor(
            (F.greatest(n - CHUNK_SIZE, F.lit(0)) + (CHUNK_STRIDE - 1))
            / CHUNK_STRIDE
        )
        + 1
    ).cast("int")
    chunks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        "text",
    )
    chunk_text = F.expr(
        f"substring(text, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})"
    )
    return chunks.select(
        (F.col("doc_id") * 10000 + F.col("chunk_idx")).alias("chunk_id"),
        "doc_id",
        "lang",
        "chunk_idx",
        (F.col("chunk_idx") * CHUNK_STRIDE).alias("chunk_start"),
        chunk_text.alias("chunk_text"),
        F.length(chunk_text).alias("chunk_len"),
    )


def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge-selection iteration: adjacent character-pair
    frequencies inside whitespace tokens, over the full corpus — the
    pair table a byte-pair tokenizer trainer maximizes over. Returns
    the top 30 pairs (count desc, pair asc — deterministic
    tie-break) with occurrence and distinct-word support counts."""
    docs = _docs(spark, sf_dir)
    words = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        "w",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
    ).select("w", F.expr("substring(w, i, 2)").alias("pair"))
    counted = pairs.groupBy("pair").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("w").alias("n_words"),
    )
    return counted.orderBy(
        F.desc("n_occurrences"), F.asc("pair")
    ).limit(TOP_PAIRS)


def reservoir_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k reservoir sample per language: rank
    documents inside each stratum by md5(doc_id) (content-hash order =
    an arbitrary-but-reproducible permutation, the property a seeded
    reservoir gives a single machine) and keep the first k=5. Unlike
    the rate-based stratified sampler (sampling.py), the output size
    per stratum is exact."""
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("lang", "rk", "doc_id", "source", "n_chars")
    )



def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-document repetition removal (the RefinedWeb/CCNet-style
    exact-substring dedup, at chunk granularity): hash every chunk,
    keep the globally FIRST occurrence of each distinct chunk text
    (min chunk_id — deterministic), and report per document how many
    chunks were duplicates and how many characters survive.

    Composes ``chunk_documents`` (narrow explode) with one
    hash-partitioned window — the same single shuffle an exact-dedup
    groupBy would pay; no pairwise work at any scale."""
    ch = chunk_documents(spark, sf_dir)
    marked = ch.select(
        "doc_id",
        "chunk_id",
        "chunk_len",
        F.md5("chunk_text").alias("h"),
    ).withColumn("first_chunk", F.min("chunk_id").over(Window.partitionBy("h")))
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum((F.col("chunk_id") != F.col("first_chunk")).cast("bigint")).alias(
            "n_dup_chunks"
        ),
        F.sum(
            F.when(
                F.col("chunk_id") == F.col("first_chunk"), F.col("chunk_len")
            ).otherwise(0)
        ).alias("chars_retained"),
    )


QUERIES = {
    "chunk_documents": chunk_documents,
    "bpe_pair_stats": bpe_pair_stats,
    "reservoir_topk_per_lang": reservoir_topk_per_lang,
    "chunk_dedup_stats": chunk_dedup_stats,
}

ORACLE = {
    "chunk_documents": f"""
        WITH c AS (
            SELECT doc_id, lang, text,
                   unnest(generate_series(0,
                       CAST(floor((greatest(length(text) - {CHUNK_SIZE}, 0)
                                   + {CHUNK_STRIDE - 1}) / {CHUNK_STRIDE})
                            AS INTEGER))) AS chunk_idx
            FROM documents
        )
        SELECT doc_id * 10000 + chunk_idx AS chunk_id,
               doc_id, lang,
               CAST(chunk_idx AS INTEGER) AS chunk_idx,
               CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
               substring(text, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})
                   AS chunk_text,
               CAST(length(substring(text, chunk_idx * {CHUNK_STRIDE} + 1,
                                     {CHUNK_SIZE})) AS INTEGER) AS chunk_len
        FROM c
    """,
    "bpe_pair_stats": f"""
        WITH words AS (
            SELECT unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents
        ),
        pairs AS (
            SELECT w, substring(w, i, 2) AS pair
            FROM (
                SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
                FROM words WHERE length(w) >= 2
            )
        )
        SELECT pair,
               count(*) AS n_occurrences,
               count(DISTINCT w) AS n_words
        FROM pairs
        GROUP BY pair
        ORDER BY n_occurrences DESC, pair ASC
        LIMIT {TOP_PAIRS}
    """,
    "reservoir_topk_per_lang": f"""
        SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id, source, n_chars
        FROM (
            SELECT lang, doc_id, source, n_chars,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        WHERE rk <= {RESERVOIR_K}
    """,
}

ORACLE["chunk_dedup_stats"] = f"""
    WITH c AS (
        SELECT doc_id, lang, text,
               unnest(generate_series(0,
                   CAST(floor((greatest(length(text) - {CHUNK_SIZE}, 0)
                               + {CHUNK_STRIDE - 1}) / {CHUNK_STRIDE})
                        AS INTEGER))) AS chunk_idx
        FROM documents
    ),
    ch AS (
        SELECT doc_id,
               doc_id * 10000 + chunk_idx AS chunk_id,
               length(substring(text, chunk_idx * {CHUNK_STRIDE} + 1,
                                {CHUNK_SIZE})) AS chunk_len,
               md5(substring(text, chunk_idx * {CHUNK_STRIDE} + 1,
                             {CHUNK_SIZE})) AS h
        FROM c
    ),
    marked AS (
        SELECT doc_id, chunk_id, chunk_len,
               min(chunk_id) OVER (PARTITION BY h) AS first_chunk
        FROM ch
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN chunk_id <> first_chunk THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_chunks,
           CAST(sum(CASE WHEN chunk_id = first_chunk THEN chunk_len
                         ELSE 0 END) AS BIGINT) AS chars_retained
    FROM marked GROUP BY doc_id
"""


# --- staged for round 8: unigram^0.75 negative-sampling table -----------
#
# QUERIES_R8/ORACLE_R8 are collected by registry.staged_* only; they do
# NOT enter the driver registry until the round-8 merge (the round-7
# registration freeze keeps the driver window on tier-3 re-checks).

NS_VOCAB = 100  # sampling table size (top tokens by frequency)
NS_FP = 1_000_000  # fixed-point scale for the smoothed weight


def negative_sampling_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative-sampling table: the classic
    unigram^(3/4) smoothing (Mikolov et al. NeurIPS'13, public
    literature) over corpus token counts, emitted as an integer
    cumulative-ppm sampling table a trainer binary-searches into.

    Cross-engine exactness without pow(): c^0.75 = c / c^0.25 and
    c^0.25 = sqrt(sqrt(c)) — two chained correctly-rounded IEEE sqrts
    of an EXACT small integer (token counts are < 2^53 far past 100 TB
    of text), then ONE multiply + ONE divide + floor, the identical op
    sequence on both engines. The quantized weight
    ``floor({NS_FP} * c / sqrt(sqrt(c)))`` is bigint from there on:
    probabilities are exact integer divisions of weight sums (valid
    while {NS_FP}·c < 2^63, i.e. c < 9.2e12 occurrences — beyond any
    single token's count at 100 TB).

    Scale: one explode + one vocabulary-bounded hash-aggregate, then a
    TakeOrdered top-{NS_VOCAB}; the cumulative window runs over the
    {NS_VOCAB}-row result only (bounded by construction, never by the
    corpus)."""
    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(F.explode(H.tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    top = counts.orderBy(F.desc("c"), F.asc("token")).limit(NS_VOCAB)
    w = F.floor(
        F.lit(float(NS_FP)) * F.col("c") / F.sqrt(F.sqrt(F.col("c")))
    ).cast("long")
    weighted = top.select("token", "c", w.alias("w"))
    total = weighted.agg(F.sum("w").alias("total_w"))
    cum_w = Window.orderBy(F.desc("c"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        weighted.crossJoin(F.broadcast(total))
        .withColumn(
            "prob_ppm",
            F.expr(f"(w * {NS_FP}) div total_w"),
        )
        .withColumn(
            "cum_ppm",
            F.expr(f"(sum(w) OVER (ORDER BY c DESC, token ASC "
                   f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                   f"* {NS_FP}) div total_w"),
        )
        .select("token", "c", "w", "prob_ppm", "cum_ppm")
    )


QUERIES_R8 = {
    "negative_sampling_unigram": negative_sampling_unigram,
}

_NS_TOKS = H.TOKENS_SQL.format(text="text")

ORACLE_R8 = {
    "negative_sampling_unigram": f"""
        WITH counts AS (
            SELECT tok AS token, count(*) AS c
            FROM (SELECT unnest({_NS_TOKS}) AS tok FROM documents)
            GROUP BY tok
        ),
        top AS (
            SELECT token, c FROM counts
            ORDER BY c DESC, token ASC LIMIT {NS_VOCAB}
        ),
        weighted AS (
            SELECT token, c,
                   CAST(floor({float(NS_FP)} * c / sqrt(sqrt(c))) AS BIGINT)
                       AS w
            FROM top
        ),
        tot AS (SELECT sum(w) AS total_w FROM weighted)
        SELECT token, c, w,
               CAST((w * {NS_FP}) // total_w AS BIGINT) AS prob_ppm,
               CAST((sum(w) OVER (ORDER BY c DESC, token ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * {NS_FP}) // total_w AS BIGINT) AS cum_ppm
        FROM weighted CROSS JOIN tot
    """,
}
