"""Semantic invariants for the round-4 operators, beyond oracle parity:
each test checks the MEANING of the result (dominance, packing bounds,
digest mergeability, chain well-formedness) rather than engine
agreement, so a bug mirrored into both the Spark query and its oracle
still fails here.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from go_zoom_kinesis_spark.operators.dedup import (
    dedup_canonical_chain,
    dedup_minhash_lsh,
    minhash_user_overlap,
)
from go_zoom_kinesis_spark.operators.layout import (
    _COMPACT_TARGET,
    compaction_plan,
    integrity_checksum_audit,
)
from go_zoom_kinesis_spark.operators.relational3 import skyline_parts_2d


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    """The prefix-max skyline must equal the O(n²) NOT-EXISTS dominance
    definition (computed independently in DuckDB)."""
    got = {
        r["p_partkey"]
        for r in skyline_parts_2d(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'"
    )
    want = {
        r[0]
        for r in con.execute(
            """
            SELECT p_partkey FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_retailprice <= p.p_retailprice
                  AND q.p_size >= p.p_size
                  AND (q.p_retailprice < p.p_retailprice
                       OR q.p_size > p.p_size)
            )
            """
        ).fetchall()
    }
    assert got == want and got


def test_compaction_bins_are_bounded_and_contiguous(spark, sf_dir):
    rows = compaction_plan(spark, sf_dir).collect()
    max_file = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.max("n_chars"))
        .collect()[0][0]
    )
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
        # first-fit on start offsets: a bin exceeds the target only by
        # the one file that straddles its boundary
        assert r["total_bytes"] <= _COMPACT_TARGET + max_file
        assert r["n_files"] >= 1
        assert r["first_doc"] <= r["last_doc"]
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["bin_id"])
        # bin ids dense from 0; doc spans contiguous and non-overlapping
        assert [b["bin_id"] for b in bins] == list(range(len(bins)))
        for prev, nxt in zip(bins, bins[1:]):
            assert prev["last_doc"] < nxt["first_doc"]


def test_checksum_merges_by_xor(spark, sf_dir):
    """The per-partition digests must XOR-combine to the whole-table
    digest — the property that makes replica comparison O(partitions)."""
    from go_zoom_kinesis_spark.functions import hashes as H
    from go_zoom_kinesis_spark.io import load_table

    per_part = integrity_checksum_audit(spark, sf_dir).collect()
    merged = 0
    for r in per_part:
        merged ^= r["checksum"]
    whole = (
        load_table(spark, sf_dir, "documents")
        .select(H.char_hash_col(F.col("text")).alias("h"))
        .agg(F.expr("bit_xor(h)"))
        .collect()[0][0]
    )
    assert merged == whole


def test_minhash_overlap_sketch_is_consistent(spark, sf_dir):
    for r in minhash_user_overlap(spark, sf_dir).collect():
        assert 0 <= r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0.0 <= r["jaccard_exact"] <= 1.0
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert r["sketch_matches"] == round(r["jaccard_est"] * 16)


def test_canonical_chain_wellformed(spark, sf_dir):
    chain = dedup_canonical_chain(spark, sf_dir).collect()
    pairs = dedup_minhash_lsh(spark, sf_dir).collect()
    children = {r["doc_b"] for r in pairs}
    roots = {r["root_id"] for r in chain}
    by_doc = {r["doc_id"]: r for r in chain}
    assert len(by_doc) == len(chain), "one terminal row per doc"
    for r in chain:
        assert r["root_id"] <= r["doc_id"]
        assert (r["chain_len"] == 0) == (r["doc_id"] not in children)
    # a terminal root never appears as a child (it would have a parent)
    assert not (roots & children)
