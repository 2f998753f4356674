"""The composed curation-pipeline example must run end-to-end and keep
its funnel invariants: monotone non-increasing stage counts, a real cut
at the quality gate, and language-partitioned output shards readable
back with the written row count.
"""

from __future__ import annotations

import os

from examples.llm_data_pipeline import run


def test_pipeline_example_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    funnel = run(spark, sf_dir, out)
    stages = [
        "raw",
        "quality",
        "exact_dedup",
        "near_dedup",
        "decontaminated",
        "k_anonymous",
    ]
    counts = [funnel[s] for s in stages]
    assert counts == sorted(counts, reverse=True)
    assert funnel["quality"] < funnel["raw"]  # the median cut bites
    assert funnel["written"] == funnel["k_anonymous"]
    assert funnel["written"] > 0
    assert 0 < funnel["batches"] <= funnel["written"]
    # exact split partitions the shipped population, train dominating
    assert (
        funnel["train"] + funnel["val"] + funnel["test"]
        == funnel["k_anonymous"]
    )
    assert funnel["train"] >= funnel["val"] >= 0
    assert funnel["train"] >= funnel["test"] >= 0
    # the split column ships in the shards
    out_df = spark.read.parquet(out)
    assert set(
        r["split"] for r in out_df.select("split").distinct().collect()
    ) <= {"train", "val", "test"}
    shards = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert shards, "expected partitionBy(lang) shard directories"
    back = spark.read.parquet(out)
    assert back.count() == funnel["written"]
    assert "pack_id" in back.columns
