"""Exactness pin for dedup_ngram_jaccard's intersection-bound prune.

The round-7 prune drops candidate pairs whose intersection UPPER BOUND
``n_shared + min(hot_a, hot_b)`` cannot reach the jaccard threshold
(13·i ≥ 3·(|A|+|B|) for τ = 3/10). ``n_shared`` only counts shared
shingles whose posting survived the df-cap, so the ``min(hot)``
correction is load-bearing: a pair whose overlap lives mostly in HOT
(capped-away) shingles has a tiny ``n_shared`` but can still clear the
threshold. This corpus constructs exactly that pair; a naive
``n_shared``-only prune (13·n_shared < 3·(|A|+|B|)) would drop it and
this test would fail. Oracle parity can't pin this case: the testdata
corpora never push a shingle past MAX_DOC_FREQ.
"""

from __future__ import annotations

import os

import pytest

from go_zoom_kinesis_spark.io import TABLES
from go_zoom_kinesis_spark.operators.dedup import (
    MAX_DOC_FREQ,
    dedup_ngram_jaccard,
)

# word-3-gram shingles: a doc of w distinct words carries w-2 shingles
H_WORDS = [f"hot{i}" for i in range(20)]  # 18 H-internal shingles
M_WORDS = [f"mid{i}" for i in range(4)]  # 4 shared capped shingles
A_TAIL = ["aone", "atwo", "athree"]
B_TAIL = ["bone", "btwo", "bthree"]


@pytest.fixture(scope="module")
def hot_sf_dir(spark, sf_dir, tmp_path_factory):
    """documents = 101 carrier docs with text H (so every H-internal
    shingle lands in 103 docs > MAX_DOC_FREQ once A and B join them),
    plus near-dup docs A = H+M+ta and B = H+M+tb; every other table
    symlinks to the base dir."""
    assert MAX_DOC_FREQ == 100, "corpus sized for the committed df-cap"
    rows = []
    for i in range(101):
        rows.append((100 + i, " ".join(H_WORDS)))
    rows.append((1, " ".join(H_WORDS + M_WORDS + A_TAIL)))
    rows.append((2, " ".join(H_WORDS + M_WORDS + B_TAIL)))
    docs = spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("hot_sf")
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    for t in TABLES:
        if t == "documents":
            continue
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    return str(d)


def test_hot_overlap_pair_survives_bound_prune(spark, hot_sf_dir):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, hot_sf_dir).collect()
    }
    # |A| = |B| = 25 shingles, i = 22 (18 hot + 4 capped-shared), so
    # jaccard = 22/28; n_shared = 4 alone fails the integer test
    # (13*4 = 52 < 3*50 = 150) while the corrected bound passes
    # (13*(4+18) = 286 >= 150)
    assert (1, 2) in out, "hot-overlap near-dup pair was pruned away"
    assert out[(1, 2)] == round(22 / 28, 6)
    # carrier-carrier and carrier-A/B overlaps are all-hot (n_shared =
    # 0 < MIN_SHARED_SHINGLES): never candidates, by the documented
    # candidate policy — the only reported pair is (A, B)
    assert set(out) == {(1, 2)}


def test_prune_preserves_output_on_real_corpus(spark, sf_dir):
    """Belt and braces on real testdata: the pruned operator's output
    must equal the unpruned candidates->exact-verify path (which the
    DuckDB oracle states independently)."""
    from pyspark.sql import functions as F

    from go_zoom_kinesis_spark.operators.dedup import (
        MIN_SHARED_SHINGLES,
        NGRAM_THRESHOLD,
        _docs,
        _pair_jaccard,
        _shingle_arrays,
    )

    docs = _docs(spark, sf_dir)
    arrs = _shingle_arrays(docs)
    sh = arrs.select("doc_id", F.explode("hs").alias("shash"))
    postings = (
        sh.groupBy("shash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= MAX_DOC_FREQ))
    )
    pairs = postings.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + F.lit(2), F.size("ds") - i - 1),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    cand = (
        pairs.groupBy("p.doc_a", "p.doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED_SHINGLES)
        .select("doc_a", "doc_b")
    )
    unpruned = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard_raw"], 6)
        for r in _pair_jaccard(cand, arrs)
        .filter(F.col("jaccard_raw") >= NGRAM_THRESHOLD)
        .collect()
    }
    pruned = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert pruned == unpruned
