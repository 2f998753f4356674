"""Semantic invariants for the round-4c operators (nested HOF audit,
weighted priority sampling, Bloom novelty gate, erasure audit,
winsorization, zone-map audit) — independent recomputation or
mathematical properties, not engine agreement.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from go_zoom_kinesis_spark.operators.dedup import bloom_novelty_filter
from go_zoom_kinesis_spark.operators.layout import (
    datafile_zonemap_audit,
    datafile_zonemap_detail,
)
from go_zoom_kinesis_spark.operators.privacy import (
    ERASE_MOD,
    erasure_impact_audit,
)
from go_zoom_kinesis_spark.operators.quality import winsorize_values
from go_zoom_kinesis_spark.operators.relational3 import (
    nested_order_items_hof,
)
from go_zoom_kinesis_spark.operators.sampling import (
    WEIGHTED_K,
    sample_weighted_priority,
)


def test_nested_hof_matches_flat_aggregation(spark, sf_dir):
    """The HOF answers over the nested array must equal plain flat
    aggregation over the exploded relation."""
    got = {
        r["o_orderkey"]: (r["n_items"], r["n_big_items"], r["total_price_cents"])
        for r in nested_order_items_hof(spark, sf_dir).collect()
    }
    flat = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 20 == 0)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.floor(F.col("l_quantity") * 100) > 2500).cast("int")
            ).alias("big"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "tot"
            ),
        )
        .collect()
    )
    want = {r["l_orderkey"]: (r["n"], r["big"], r["tot"]) for r in flat}
    assert got == want and got


def test_weighted_priority_favors_heavy_docs(spark, sf_dir):
    """Exactly k per language, and the kept set is exactly the k lowest
    (priority, doc_id) pairs — recomputed in Python."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT lang, doc_id, n_chars,
               ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                 AS BIGINT) + 1) * 1000000000)
               // greatest(n_chars, 1) AS pri
        FROM '{sf_dir}/documents.parquet'
        """
    ).fetchall()
    by_lang = {}
    for lang, doc_id, n_chars, pri in rows:
        by_lang.setdefault(lang, []).append((pri, doc_id, n_chars))
    want = {
        lang: {d for _, d, _ in sorted(v)[:WEIGHTED_K]}
        for lang, v in by_lang.items()
    }
    out = sample_weighted_priority(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    assert got == want
    for lang, v in by_lang.items():
        assert len(got[lang]) == min(WEIGHTED_K, len(v))


def test_bloom_never_misses_and_summary_is_consistent(spark, sf_dir):
    row = bloom_novelty_filter(spark, sf_dir).collect()[0]
    # a Bloom filter has no false negatives — every true duplicate hits
    assert row["n_missed"] == 0
    assert row["n_bloom_hits"] == row["n_true_dups"] + row["n_false_positives"]
    n_incoming = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 1)
        .count()
    )
    assert row["n_incoming"] == n_incoming
    assert 0 <= row["n_bloom_hits"] <= n_incoming


def test_erasure_audit_matches_direct_counts(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    erased_users = (
        ev.filter(F.col("user_id") % ERASE_MOD == 0)
        .select("user_id")
        .distinct()
        .count()
    )
    out = erasure_impact_audit(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in out) == ev.count()
    assert sum(r["n_erased"] for r in out) == ev.filter(
        F.col("user_id") % ERASE_MOD == 0
    ).count()
    for r in out:
        assert 0 <= r["erased_ppm"] <= 1_000_000
        assert r["erased_cents"] <= r["total_cents"]
        assert r["n_users_erased"] <= erased_users


def test_winsorize_bounds_and_conservation(spark, sf_dir):
    for r in winsorize_values(spark, sf_dir).collect():
        assert r["p01"] <= r["p99"]
        # clipping is one-sided per tail and bounded by 1% + 1 row each
        assert r["n_clipped_lo"] <= r["n_rows"] * 0.01 + 1
        assert r["n_clipped_hi"] <= r["n_rows"] * 0.01 + 1
        # winsorized mean sits inside [p01, p99]
        mean = r["winsorized_sum_cents"] / r["n_rows"]
        assert r["p01"] - 1e-9 <= mean <= r["p99"] + 1e-9


def test_zonemap_audit_one_row_per_file(spark, sf_dir, tmp_path):
    """Multi-file behavior: a 4-file copy yields 4 detail rows whose
    counts and spans union back to the whole table, and the registered
    rollup audit reports identical stats for both layouts (the
    layout-invariance its oracle relies on)."""
    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dst = str(tmp_path / "li4")
    src.repartition(4, "l_orderkey").write.parquet(dst)
    fname = F.regexp_extract(F.col("_metadata.file_path"), r"([^/]+)$", 1)
    per_file = (
        spark.read.parquet(dst)
        .select(fname.alias("f"), "l_orderkey")
        .groupBy("f")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(per_file) == 4
    assert sum(r["n"] for r in per_file) == src.count()
    # detail layer: one row per physical file with the canonical name
    detail = datafile_zonemap_detail(spark, sf_dir).collect()
    assert [r["file_name"] for r in detail] == ["lineitem.parquet"]
    assert detail[0]["n_rows"] == src.count()
    # registered rollup: layout-invariant — single-file dir and the
    # 4-file copy must produce the same audit row
    one = datafile_zonemap_audit(spark, sf_dir).collect()[0]
    # point the audit at the 4-file copy by staging it as lineitem
    alt = str(tmp_path / "alt_sf")
    import os, shutil
    os.makedirs(alt, exist_ok=True)
    shutil.copytree(dst, os.path.join(alt, "lineitem.parquet"))
    four = datafile_zonemap_audit(spark, alt).collect()[0]
    assert one == four
    assert one["n_rows"] == src.count()
