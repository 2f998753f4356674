"""Semantic invariants for the pipeline-assembly operators
(connected components, TF-IDF top-K, sequence packing, corpus mixing)
— oracle parity is covered by test_oracle_parity; these check the
properties the oracle hash can't express directly."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.dedup import (
    dedup_components,
    dedup_minhash_lsh,
)
from go_zoom_kinesis_spark.operators.pipeline import (
    MIX_RATES,
    PACK_BUDGET,
    corpus_mix_sample,
    pack_sequences,
)
from go_zoom_kinesis_spark.operators.text import (
    TFIDF_TOP_K,
    text_tfidf_topterms,
)


def test_components_consistent_with_pairs(spark, sf_dir):
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").collect()
    comp_rows = dedup_components(spark, sf_dir).collect()
    comp = {r["doc_id"]: r["component_id"] for r in comp_rows}
    # every edge's endpoints landed in the same component
    for p in pairs:
        assert comp[p["doc_a"]] == comp[p["doc_b"]]
    # the component label is its min member (the survivor)
    members = defaultdict(list)
    for d, c in comp.items():
        members[c].append(d)
    for c, ds in members.items():
        assert c == min(ds)
    # n_members matches the actual member count
    for r in comp_rows:
        assert r["n_members"] == len(members[r["component_id"]])
    # node set = exactly the docs that appear in some pair
    in_pairs = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    assert set(comp) == in_pairs


def test_pack_sequences_invariants(spark, sf_dir):
    rows = pack_sequences(spark, sf_dir).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        # offsets are the exclusive prefix sum of token counts
        run = 0
        for r in rs:
            assert r["off_excl"] == run
            assert r["pack_id"] == r["off_excl"] // PACK_BUDGET
            assert r["offset_in_pack"] == r["off_excl"] % PACK_BUDGET
            run += r["n_tok"]
        # packs are dense: every pack index up to the last appears
        packs = {r["pack_id"] for r in rs}
        assert packs == set(range(max(packs) + 1))


def test_corpus_mix_rates_approximate(spark, sf_dir):
    from go_zoom_kinesis_spark.io import load_table

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept = defaultdict(int)
    for r in corpus_mix_sample(spark, sf_dir).collect():
        kept[r["lang"]] += r["n_kept"]
    for lang, rate in MIX_RATES.items():
        if totals.get(lang, 0) < 30:
            continue  # too small for a rate assertion
        frac = kept[lang] / totals[lang]
        # md5 buckets are uniform; generous tolerance for small strata
        assert abs(frac - rate) < 0.2, (lang, frac, rate)


def test_tfidf_topk_shape(spark, sf_dir):
    rows = text_tfidf_topterms(spark, sf_dir).collect()
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r)
    for doc, rs in per_doc.items():
        rks = sorted(r["rk"] for r in rs)
        assert rks == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_TOP_K
        # scores are non-increasing with rank
        rs.sort(key=lambda r: r["rk"])
        for a, b in zip(rs, rs[1:]):
            assert a["tfidf"] >= b["tfidf"]


def test_decontaminate_flags_true_overlaps(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.pipeline import (
        DECON_N,
        EVAL_MOD,
        decontaminate_ngram,
    )

    rows = decontaminate_ngram(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()

    def shingles(text):
        toks = [t for t in text.lower().split(" ") if t]
        return {
            " ".join(toks[i : i + DECON_N])
            for i in range(len(toks) - DECON_N + 1)
        }

    eval_sh = {}
    train_sh = {}
    for d in docs:
        (eval_sh if d["doc_id"] % EVAL_MOD == 0 else train_sh)[
            d["doc_id"]
        ] = shingles(d["text"])
    all_eval = set().union(*eval_sh.values()) if eval_sh else set()
    expected = {
        did: sh & all_eval
        for did, sh in train_sh.items()
        if sh & all_eval
    }
    got = {r["doc_id"]: r for r in rows}
    assert set(got) == set(expected)
    for did, shared in expected.items():
        assert got[did]["n_shared_ngrams"] == len(shared)
        assert got[did]["first_shared_ngram"] == min(shared)
        hit_docs = {
            ed for ed, esh in eval_sh.items() if esh & train_sh[did]
        }
        assert got[did]["n_eval_docs_hit"] == len(hit_docs)


def test_pipeline_funnel_monotone(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.pipeline import pipeline_funnel

    rows = pipeline_funnel(spark, sf_dir).collect()
    assert rows
    total_docs = sum(r["n_docs"] for r in rows)
    assert total_docs == load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert r["n_kept"] <= r["n_quality_passed"] <= r["n_docs"]
        assert (r["tokens_kept"] > 0) == (r["n_kept"] > 0)
