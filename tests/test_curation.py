"""Semantic invariants for the round-3 curation operators (exact
oracle parity is covered by tests/test_oracle_parity.py; these pin the
*meaning* of the outputs, which a hash cannot)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.curation import (
    N_BINS,
    curriculum_quantile_bins,
    embedding_quantize_error,
    ngram_lm_score,
    split_leakage_audit,
    tokenizer_vocab_coverage,
)


def test_curriculum_bins_partition_each_language(spark, sf_dir):
    rows = curriculum_quantile_bins(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, bins in by_lang.items():
        bins.sort(key=lambda r: r["bin"])
        # bins partition the language's docs, sizes differ by <= 1
        assert sum(r["n_docs"] for r in bins) == per_lang[lang]
        sizes = [r["n_docs"] for r in bins]
        assert max(sizes) - min(sizes) <= 1
        assert [r["bin"] for r in bins] == list(range(1, len(bins) + 1))
        assert len(bins) <= N_BINS
        # ordered by n_chars: earlier bins never exceed later bins
        for a, b in zip(bins, bins[1:]):
            assert a["max_chars"] <= b["min_chars"]
        for r in bins:
            assert r["min_chars"] <= r["max_chars"]


def test_vocab_coverage_accounts_every_token(spark, sf_dir):
    rows = tokenizer_vocab_coverage(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(
            F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != ""))
        ).alias("n")
    ).collect()[0]["n"]
    assert sum(r["n_tokens"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0 <= r["n_oov_types"] <= r["n_oov"]


def test_split_leakage_counts_are_consistent(spark, sf_dir):
    rows = split_leakage_audit(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["n_leaked"] <= r["n_holdout"]
        # every leaked doc contributes >= 1 cross pair; a doc with no
        # train duplicate contributes 0
        assert r["n_cross_pairs"] >= r["n_leaked"]


def test_lm_score_probabilities_bounded(spark, sf_dir):
    rows = ngram_lm_score(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("n"),
        ).collect()
    }
    for r in rows:
        # add-one smoothing keeps every bigram probability in (0, 1]
        assert 0.0 < r["avg_prob"] <= 1.0
        assert 0.0 < r["sum_prob"] <= r["n_bigrams"]
        assert 0 <= r["n_singleton"] <= r["n_bigrams"]
        assert r["n_bigrams"] == n_toks[r["doc_id"]] - 1


def test_quantize_error_bounded_by_half_step(spark, sf_dir):
    rows = embedding_quantize_error(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["sse"] >= 0.0
        # half-up rounding bounds each dim's error by scale/2
        bound = r["n_dims"] * (r["scale"] / 2.0) ** 2
        assert r["sse"] <= bound * (1 + 1e-9)
        # the max-|x| dim lands exactly on +-127
        assert r["n_saturated"] >= 1
        assert r["n_saturated"] <= r["n_dims"]


def test_countmin_never_underestimates(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.search import countmin_heavy_hitters

    rows = countmin_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the defining CM guarantee: estimate >= true count
        assert r["overcount"] >= 0
        assert r["cm_est"] == r["exact_count"] + r["overcount"]


def test_recall_eval_bounds_and_truth_size(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.similarity import (
        IVF_TOP_K,
        N_QUERIES,
        similarity_recall_eval,
    )

    rows = similarity_recall_eval(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert r["n_truth"] == IVF_TOP_K
        assert 0 <= r["n_hits"] <= min(r["n_truth"], r["n_retrieved"])
        assert 0 <= r["recall_ppm"] <= 1000000


def test_profile_columns_consistent(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.quality import PROFILE_COLS, profile_columns

    rows = {r["column_name"]: r for r in profile_columns(spark, sf_dir).collect()}
    assert set(rows) == set(PROFILE_COLS)
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1  # every column profiled over the same scan
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= r["n_rows"]
        assert 1 <= r["n_distinct"] <= r["n_rows"]
        assert r["min_str"] <= r["max_str"]


def test_constraints_pass_on_clean_testdata(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.quality import validate_constraints

    rows = {r["constraint_name"]: r for r in validate_constraints(spark, sf_dir).collect()}
    assert set(rows) == {
        "pk_unique_orders",
        "fk_lineitem_orders",
        "nonneg_quantity",
        "discount_range",
        "returnflag_enum",
    }
    for r in rows.values():
        assert r["passed"] and r["n_violations"] == 0, r


def test_chi_square_reasonable(spark, sf_dir):
    import math

    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.operators.quality import chi_square_lang_source

    r = chi_square_lang_source(spark, sf_dir).collect()[0]
    assert r["chi2"] >= 0.0 and math.isfinite(r["chi2"])
    docs = load_table(spark, sf_dir, "documents")
    n_langs = docs.select("lang").distinct().count()
    n_sources = docs.select("source").distinct().count()
    assert r["dof"] == (n_langs - 1) * (n_sources - 1)
    assert r["n_cells"] <= n_langs * n_sources


def test_distribution_drift_bounds(spark, sf_dir):
    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.operators.quality import distribution_drift

    rows = distribution_drift(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    for r in rows:
        # L1 distance between two probability vectors lies in [0, 2]
        assert 0.0 <= r["drift_l1"] <= 2.0
        assert r["n_docs"] >= 1
        assert r["n_buckets"] >= 1
