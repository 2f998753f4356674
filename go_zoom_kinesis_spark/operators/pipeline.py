"""Training-data pipeline assembly operators — north-star extension
(SURVEY.md §2.2): sequence packing and weighted corpus mixing. The
reference engine has no batch-assembly layer (it stops at per-record
delivery, /root/reference/src/processor.rs:1490-1525); these are the
operators a 100 TB pretraining pipeline runs AFTER dedup/quality
filtering to turn documents into fixed-budget training sequences with
a controlled source mix.

Both are integer-exact end to end (token counts, cumulative offsets,
md5 buckets), so the DuckDB oracles hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table

PACK_BUDGET = 512  # tokens per training pack

# Per-language mixing rates (fraction of the 16-bit hash space kept).
# The shape of a real corpus-mix config: upsample scarce high-quality
# sources, downsample the web crawl.
MIX_RATES = {"en": 0.50, "fr": 0.25, "es": 0.25, "de": 0.75, "zh": 1.00}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate each language's document stream in
    doc_id order and chunk it into fixed ``PACK_BUDGET``-token packs
    (documents straddle pack boundaries, exactly like concat-then-chunk
    pretraining tokenization).

    One window cumsum per language stream — parallel across languages;
    at 100 TB the stream key widens to (lang, shard) and a second pass
    prefix-sums the per-shard totals (two scans, no global sort —
    the standard distributed prefix-sum), which changes the partition
    key but not this operator's contract.
    """
    docs = _docs(spark, sf_dir)
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_off = docs.select(
        "doc_id",
        "lang",
        n_tok.cast("bigint").alias("n_tok"),
    ).withColumn("off_excl", F.sum("n_tok").over(w) - F.col("n_tok"))
    return with_off.select(
        "doc_id",
        "lang",
        "n_tok",
        "off_excl",
        F.expr(f"off_excl div {PACK_BUDGET}").alias("pack_id"),
        (F.col("off_excl") % PACK_BUDGET).alias("offset_in_pack"),
    )


def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: per-language deterministic sampling
    rates applied via the engine-portable md5 bucket (same selection on
    any engine / partitioning / day — reproducible at 100 TB where
    seeded sample() is not), audited per (lang, source).

    Single scan, shuffle-free selection; the rollup is one shuffle on
    the (lang, source) audit key.
    """
    docs = _docs(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    rate_cut = None
    for lang, rate in MIX_RATES.items():
        cond, cut = F.col("lang") == lang, F.lit(int(rate * 0xFFFF))
        rate_cut = F.when(cond, cut) if rate_cut is None else rate_cut.when(cond, cut)
    rate_cut = rate_cut.otherwise(F.lit(0))
    return (
        docs.filter(bucket < rate_cut)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


QUERIES = {
    "pack_sequences": pack_sequences,
    "corpus_mix_sample": corpus_mix_sample,
}

_BUCKET = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)"

_RATE_CUT = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {int(rate * 0xFFFF)}"
    for lang, rate in MIX_RATES.items()
) + " ELSE 0 END"

ORACLE = {
    "pack_sequences": f"""
        SELECT doc_id, lang, n_tok, off_excl,
               off_excl // {PACK_BUDGET} AS pack_id,
               off_excl % {PACK_BUDGET} AS offset_in_pack
        FROM (
            SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   CAST(sum(len(string_split(text, ' '))) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) - CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS off_excl
            FROM documents
        )
    """,
    "corpus_mix_sample": f"""
        SELECT lang, source,
               count(*) AS n_kept,
               CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
               min(doc_id) AS min_doc_id
        FROM documents
        WHERE {_BUCKET} < {_RATE_CUT}
        GROUP BY lang, source
    """,
}
