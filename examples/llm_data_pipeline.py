"""End-to-end training-data curation pipeline — the composed product.

What a pretraining-data team runs nightly, assembled from the engine's
registry operators (each individually oracle-verified):

    raw documents
      → quality gate        (text_quality: TTR / length / stopword score)
      → exact dedup         (dedup_exact: sha256 canonical per content)
      → near-dup removal    (dedup_minhash_lsh: keep the smaller doc of
                             every verified ≥0.5-Jaccard pair)
      → decontamination     (decontaminate_ngram: drop train docs
                             sharing a 5-gram with the eval slice)
      → k-anonymity gate    (k_anonymity_audit shape over the
                             survivors: refuse to ship risky classes)
      → exact split         (stratified_split_exact shape: per-language
                             hash-ordered train/val/test quotas)
      → sequence packing    (pack budget offsets per language stream)
      → batch manifest      (minibatch_pack_plan shape: padding-waste
                             accounting the trainer reads)
      → partitioned shard write (parquet, partitionBy(lang))

    python examples/llm_data_pipeline.py [sf_dir] [out_dir]

Prints a funnel report (docs surviving each stage) and the output
shard layout. Every stage is a DataFrame composition — one driver
program, lazy end-to-end; Catalyst sees the whole graph and shares
the document scan between stages where plans allow.

Scale notes: the stage set mirrors the individually-audited operators
(SCALE.md) — quality is scan-parallel, dedup shuffles on content hash,
LSH joins on band keys, decontamination broadcasts the eval shingles,
packing windows per language. Nothing here collects rows to the
driver; the funnel counts are O(1) aggregates.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from go_zoom_kinesis_spark.io import load_table  # noqa: E402
from go_zoom_kinesis_spark.operators.dedup import (  # noqa: E402
    dedup_exact,
    dedup_minhash_lsh,
)
from go_zoom_kinesis_spark.operators.pipeline import (  # noqa: E402
    EVAL_MOD,
    PACK_BUDGET,
    contamination_longest_run,
    decontaminate_ngram,
)
from go_zoom_kinesis_spark.operators.sampling import (  # noqa: E402
    stratified_split_assign,
)
from go_zoom_kinesis_spark.operators.text import text_quality  # noqa: E402
from go_zoom_kinesis_spark.session import get_spark  # noqa: E402

def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    docs = load_table(spark, sf_dir, "documents")
    funnel = {"raw": docs.count()}

    # 1. quality gate — keep the top half by score. The cut point is a
    #    single collected scalar (O(1) driver state); at corpus scale
    #    swap percentile for approx_percentile (mergeable sketch).
    scored = text_quality(spark, sf_dir)
    cut = scored.agg(
        F.expr("percentile(quality_score, 0.5)").alias("cut")
    ).collect()[0]["cut"]
    quality_keep = scored.filter(F.col("quality_score") >= cut).select(
        "doc_id"
    )
    kept = docs.join(quality_keep, "doc_id", "left_semi")
    funnel["quality"] = kept.count()

    # 2. exact dedup — keep each content's canonical (min doc_id)
    canon = dedup_exact(spark, sf_dir).select(
        F.col("canonical_id").alias("doc_id")
    )
    kept = kept.join(canon, "doc_id", "left_semi")
    funnel["exact_dedup"] = kept.count()

    # 3. near-dup removal — every verified pair keeps only the smaller
    near_losers = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    )
    kept = kept.join(near_losers, "doc_id", "left_anti")
    funnel["near_dedup"] = kept.count()

    # 4. decontamination — drop the eval slice and any train doc that
    #    shares a 5-gram with it
    contaminated = decontaminate_ngram(spark, sf_dir).select("doc_id")
    kept = kept.filter(F.col("doc_id") % EVAL_MOD != 0).join(
        contaminated, "doc_id", "left_anti"
    )
    funnel["decontaminated"] = kept.count()

    # 4a. contiguous-span decontamination (r9) — the stricter PaLM-style
    #     criterion on top of the scattered-overlap scan: any doc with a
    #     long CONTIGUOUS shared run vs the eval slice goes too. On this
    #     corpus stage 4 usually subsumes it (a contiguous run implies
    #     shared n-grams), but the stage order documents the policy:
    #     count-based first (cheap, broad), span-based second (strict).
    span_contaminated = contamination_longest_run(spark, sf_dir).select(
        "doc_id"
    )
    kept = kept.join(span_contaminated, "doc_id", "left_anti")
    funnel["span_decontaminated"] = kept.count()

    # 4b. k-anonymity release gate over the SURVIVORS (the registry's
    #     k_anonymity_audit shape applied post-filter): quasi-id
    #     classes smaller than K are dropped rather than shipped —
    #     curation filters concentrate rare (lang, source) combos, so
    #     the gate must run after them, not on the raw corpus.
    #     K=2 (drop singleton classes) keeps the toy corpus
    #     demonstrative; production gates use K ≥ 10 (the registry
    #     operator's constant).
    K_ANON = 2
    safe_classes = (
        kept.groupBy("lang", "source")
        .agg(F.count("*").alias("class_size"))
        .filter(F.col("class_size") >= K_ANON)
        .select("lang", "source")
    )
    kept = kept.join(F.broadcast(safe_classes), ["lang", "source"], "left_semi")
    funnel["k_anonymous"] = kept.count()

    # 4c. exact-quota train/val/test split over the SURVIVORS (the
    #     registry's stratified_split_exact applied post-filter): split
    #     AFTER curation so quota math sees the shipped population, and
    #     by content hash so the assignment is reproducible run-to-run.
    kept = stratified_split_assign(kept, "lang", "doc_id")
    split_counts = {
        r["split"]: r["n"]
        for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    for s in ("train", "val", "test"):
        funnel[s] = split_counts.get(s, 0)

    # 5. pack offsets over the SURVIVING stream (same contract as the
    #    registry's pack_sequences, applied post-filter)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = (
        kept.withColumn(
            "n_tok", F.size(F.split(F.col("text"), " ")).cast("bigint")
        )
        .withColumn("off_excl", F.sum("n_tok").over(w) - F.col("n_tok"))
        .withColumn("pack_id", F.expr(f"off_excl div {PACK_BUDGET}"))
    )

    # 5b. batch manifest with padding-waste accounting (the registry's
    #     minibatch_pack_plan shape over the surviving stream): the
    #     trainer reads this to budget fixed-shape tensor batches.
    manifest = packed.groupBy("lang", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tok"),
        F.max("n_tok").alias("max_tok"),
        (F.max("n_tok") * F.count("*") - F.sum("n_tok")).alias("padding_tok"),
    )
    funnel["batches"] = manifest.count()

    # 6. shard write — partitioned by language for downstream loaders
    (
        packed.select(
            "doc_id", "lang", "source", "split", "text", "n_tok", "pack_id"
        )
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out_dir)
    )
    manifest.write.mode("overwrite").parquet(
        os.path.join(out_dir, "_manifest")
    )
    funnel["written"] = spark.read.parquet(out_dir).count()
    return funnel


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join("/tmp", "gzk_train_shards")
    )
    spark = get_spark()
    funnel = run(spark, sf_dir, out_dir)
    width = max(len(k) for k in funnel)
    print("\n=== curation funnel ===")
    for stage, n in funnel.items():
        print(f"{stage:<{width}}  {n:>8}")
    langs = sorted(
        d for d in os.listdir(out_dir) if d.startswith("lang=")
    )
    print(f"\nwrote {len(langs)} language shards under {out_dir}: {langs}")


if __name__ == "__main__":
    main()
