"""Exactness of the prefix-filtered similarity join: it must find
EXACTLY the pairs a brute-force all-pairs Jaccard scan finds — the
no-false-negatives guarantee that distinguishes it from the LSH path."""

from __future__ import annotations

from itertools import combinations

from go_zoom_kinesis_spark.operators.simjoin import (
    THETA_DEN,
    THETA_NUM,
    similarity_prefix_join,
)


def _shingles(text: str) -> set[str]:
    ws = [w for w in text.lower().split(" ") if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_prefix_join_equals_bruteforce(spark, sf_dir):
    got = {
        (r["a_id"], r["b_id"]): r
        for r in similarity_prefix_join(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: _shingles(r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    want = {}
    for a, b in combinations(sorted(docs), 2):
        sa, sb = docs[a], docs[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if THETA_DEN * inter >= THETA_NUM * union:
            want[(a, b)] = (len(sa), len(sb), inter, union)
    assert set(got) == set(want)
    for k, (size_a, size_b, inter, union) in want.items():
        r = got[k]
        assert (r["size_a"], r["size_b"], r["inter_size"], r["union_size"]) == (
            size_a, size_b, inter, union
        )
        assert r["jaccard_ppm"] == inter * 1000000 // union


def test_containment_join_equals_bruteforce(spark, sf_dir):
    """The containment join must find EXACTLY the ordered pairs a
    brute-force scan finds with |a ∩ b| / |a| ≥ 0.8 — the asymmetric
    no-false-negatives guarantee (a prefix on the contained side only)."""
    from itertools import permutations

    from go_zoom_kinesis_spark.operators.simjoin import (
        CONT_DEN,
        CONT_NUM,
        similarity_containment_join,
    )

    got = {
        (r["a_id"], r["b_id"]): r
        for r in similarity_containment_join(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: _shingles(r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    want = {}
    for a, b in permutations(sorted(docs), 2):
        sa, sb = docs[a], docs[b]
        if not sa:
            continue
        inter = len(sa & sb)
        if CONT_DEN * inter >= CONT_NUM * len(sa):
            want[(a, b)] = (len(sa), len(sb), inter)
    assert set(got) == set(want)
    for k, (size_a, size_b, inter) in want.items():
        r = got[k]
        assert (r["size_a"], r["size_b"], r["inter_size"]) == (size_a, size_b, inter)
        assert r["containment_ppm"] == inter * 1000000 // size_a
