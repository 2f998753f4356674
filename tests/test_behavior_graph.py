"""Semantic invariants for the behavioral-analytics and graph
operators — properties the oracle hash gate can't express: funnel
monotonicity, retention cohort structure, transition-share algebra,
PageRank mass conservation, path-count consistency, cap enforcement,
and the incremental-merge equivalence re-proved against an
independent in-Python aggregate."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.behavior import (
    DOMAIN_CAP,
    cohort_retention,
    domain_cap_documents,
    event_transitions,
    funnel_stages,
)
from go_zoom_kinesis_spark.operators.graph import (
    DAMPING,
    N_NATIONS,
    N_SWEEPS,
    pagerank_nation_trade,
    session_paths_topk,
)
from go_zoom_kinesis_spark.operators.timeseries import (
    incremental_agg_merge,
    robust_outliers_mad,
)


def test_funnel_counts_non_increasing(spark, sf_dir):
    row = funnel_stages(spark, sf_dir).collect()[0]
    assert row["n_view"] >= row["n_click_after_view"] >= row["n_purchase_after_click"]
    assert row["n_view"] > 0


def test_cohort_retention_week0_is_cohort_size(spark, sf_dir):
    rows = cohort_retention(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    # every user appears in their own cohort's week-0 row (their first
    # event is trivially in offset 0), so week-0 sizes sum to n_users
    week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    assert week0 == n_users
    assert all(r["week_offset"] >= 0 for r in rows)


def test_transition_shares_sum_to_one(spark, sf_dir):
    rows = event_transitions(spark, sf_dir).collect()
    by_from = defaultdict(int)
    for r in rows:
        by_from[r["from_type"]] += r["share_ppm"]
    # floor'd parts-per-million shares: each from-group sums to 1e6
    # minus at most (n_targets - 1) flooring loss
    targets = defaultdict(int)
    for r in rows:
        targets[r["from_type"]] += 1
    for ft, total in by_from.items():
        assert 1_000_000 - (targets[ft] - 1) <= total <= 1_000_000


def test_pagerank_mass_and_floor(spark, sf_dir):
    rows = pagerank_nation_trade(spark, sf_dir).collect()
    assert len(rows) == int(N_NATIONS)
    base = (1.0 - DAMPING) / N_NATIONS
    for r in rows:
        assert r["pr"] >= base - 1e-15
    # without dangling redistribution total mass stays within
    # [ (1-d), 1 ]: each sweep keeps at most the full propagated mass
    total = sum(r["pr"] for r in rows)
    assert (1.0 - DAMPING) - 1e-9 <= total <= 1.0 + 1e-9


def test_session_paths_counts_match_python(spark, sf_dir):
    got = {r["path"]: r["n_paths"] for r in session_paths_topk(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts = defaultdict(int)
    for seq in seqs.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            counts[">".join(types[i : i + 3])] += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == dict(top)


def test_domain_cap_never_exceeded(spark, sf_dir):
    rows = domain_cap_documents(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_kept"] <= DOMAIN_CAP
        assert r["n_kept"] == min(DOMAIN_CAP, per_source[r["source"]])
        assert r["n_total"] == per_source[r["source"]]


def test_incremental_merge_equals_direct(spark, sf_dir):
    got = {r["event_type"]: r for r in incremental_agg_merge(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    agg = defaultdict(lambda: [0, 0.0, math.inf, -math.inf])
    for r in ev:
        a = agg[r["event_type"]]
        a[0] += 1
        a[1] += r["value"]
        a[2] = min(a[2], r["value"])
        a[3] = max(a[3], r["value"])
    assert set(got) == set(agg)
    for et, (n, s, mn, mx) in agg.items():
        g = got[et]
        assert g["n_events"] == n
        assert abs(g["sum_value"] - s) < 1e-6 * max(1.0, abs(s))
        assert g["min_value"] == mn and g["max_value"] == mx


def test_mad_outliers_bounded_fraction(spark, sf_dir):
    # MAD flags are robust: on any distribution at most half the rows
    # can sit beyond 3*1.4826 MADs unless MAD is 0; sanity-bound it
    for r in robust_outliers_mad(spark, sf_dir).collect():
        assert 0 <= r["n_outliers"] <= r["n_total"]
        if r["mad"] > 0:
            assert r["n_outliers"] < r["n_total"] / 2
        assert r["mad"] >= 0
