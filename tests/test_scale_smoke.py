"""Scale-amplification smoke: run headline plans on 8×-amplified facts.

Amplification unions key-shifted copies, so the expected results are
exactly derivable (counts and decimal-exact sums scale ×8) — this
checks that partial aggregation, broadcast choices, and the window
top-k survive a data-volume jump with answers that stay exact, i.e. the
plan scales, not just the test passes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from go_zoom_kinesis_spark.io import load_table

AMP = 8
KEY_STRIDE = 10_000_000  # beyond any real orderkey


@pytest.fixture(scope="module")
def amplified(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li_amp = None
    ord_amp = None
    for i in range(AMP):
        shift = F.lit(i * KEY_STRIDE)
        li_i = li.withColumn("l_orderkey", F.col("l_orderkey") + shift)
        ord_i = orders.withColumn("o_orderkey", F.col("o_orderkey") + shift)
        li_amp = li_i if li_amp is None else li_amp.unionByName(li_i)
        ord_amp = ord_i if ord_amp is None else ord_amp.unionByName(ord_i)
    return li_amp, ord_amp


def test_amplified_aggregation_exact(spark, sf_dir, amplified):
    li_amp, _ = amplified
    li = load_table(spark, sf_dir, "lineitem")
    base = {
        r["l_returnflag"]: (r["n"], r["sum_qty"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("sum_qty"),
        )
        .collect()
    }
    amp = {
        r["l_returnflag"]: (r["n"], r["sum_qty"])
        for r in li_amp.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("sum_qty"),
        )
        .collect()
    }
    assert set(amp) == set(base)
    for k, (n, s) in base.items():
        assert amp[k] == (n * AMP, s * AMP), k


def test_amplified_join_agg_exact(spark, sf_dir, amplified):
    li_amp, ord_amp = amplified
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    base = dict(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    amp = dict(
        li_amp.join(ord_amp, li_amp.l_orderkey == ord_amp.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert amp == {k: v * AMP for k, v in base.items()}


def test_amplified_window_topk(spark, sf_dir, amplified):
    """Every amplified copy of a customer must produce the identical
    per-copy top-3 (window partitions scale horizontally)."""
    _, ord_amp = amplified
    w = Window.partitionBy("o_custkey", (F.col("o_orderkey") / KEY_STRIDE).cast("int")).orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    topk = ord_amp.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    orders = load_table(spark, sf_dir, "orders")
    w0 = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    base_n = orders.withColumn("rk", F.row_number().over(w0)).filter(F.col("rk") <= 3).count()
    assert topk.count() == base_n * AMP


DOC_STRIDE = 1_200_000  # divisible by 6: preserves doc_id % 2 and % 3


@pytest.fixture(scope="module")
def amp_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    amp = None
    for i in range(AMP):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * DOC_STRIDE))
        amp = d if amp is None else amp.unionByName(d)
    return amp


@pytest.fixture(scope="module")
def amp_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    amp = None
    for i in range(AMP):
        e = ev.withColumn("event_id", F.col("event_id") + F.lit(i * KEY_STRIDE))
        amp = e if amp is None else amp.unionByName(e)
    return amp


def _token_counts(docs):
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("token")
    )
    return {
        r["token"]: r["n"]
        for r in toks.groupBy("token").agg(F.count("*").alias("n")).collect()
    }


def test_amplified_heavy_hitters_exact(spark, sf_dir, amp_docs):
    base = _token_counts(load_table(spark, sf_dir, "documents"))
    amp = _token_counts(amp_docs)
    assert set(amp) == set(base)
    for tok, n in base.items():
        assert amp[tok] == n * AMP, tok
    # identical ranking => identical heavy-hitter set at any multiple
    rank = lambda d: sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert [t for t, _ in rank(base)] == [t for t, _ in rank(amp)]


def test_amplified_pii_totals_exact(spark, sf_dir, amp_docs):
    from go_zoom_kinesis_spark.operators.privacy import EMAIL_RE, PHONE_RE

    def totals(docs):
        did = F.col("doc_id")
        aug = docs.withColumn(
            "aug",
            F.concat(
                F.col("text"),
                F.lit(" u"), did.cast("string"), F.lit("@example.com"),
                F.when(
                    did % 2 == 0,
                    F.concat(
                        F.lit(" 555-"),
                        F.lpad((did % 10000).cast("string"), 4, "0"),
                    ),
                ).otherwise(F.lit("")),
            ),
        )
        row = aug.agg(
            F.sum(
                F.size(F.regexp_extract_all(F.col("aug"), F.lit(EMAIL_RE), 0))
            ).alias("e"),
            F.sum(
                F.size(F.regexp_extract_all(F.col("aug"), F.lit(PHONE_RE), 0))
            ).alias("p"),
        ).collect()[0]
        return row["e"], row["p"]

    be, bp = totals(load_table(spark, sf_dir, "documents"))
    ae, ap = totals(amp_docs)
    # stride divisible by 2 preserves the phone-injection parity
    assert (ae, ap) == (be * AMP, bp * AMP)


def test_amplified_time_rollup_exact(spark, sf_dir, amp_events):
    def rollup(ev):
        return {
            (r["event_type"], r["h"]): (r["n"], r["s"])
            for r in ev.groupBy(
                "event_type", F.date_trunc("hour", "ts").alias("h")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
            )
            .collect()
        }

    base = rollup(load_table(spark, sf_dir, "events"))
    amp = rollup(amp_events)
    assert set(amp) == set(base)
    for k, (n, s) in base.items():
        assert amp[k] == (n * AMP, s * AMP), k


# --- round-3 operators at 8x volume (operators run UNMODIFIED over an
# --- amplified table dir, so the invariants exercise the real plans)


@pytest.fixture(scope="module")
def amp_sf_dir(spark, sf_dir, tmp_path_factory, amp_docs):
    """A scale-factor dir whose documents table is the 8x amplification;
    every other table symlinks to the base dir unchanged."""
    import os

    from go_zoom_kinesis_spark.io import TABLES

    d = tmp_path_factory.mktemp("amp_sf")
    amp_docs.coalesce(4).write.parquet(str(d / "documents.parquet"))
    for t in TABLES:
        if t == "documents":
            continue
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    return str(d)


def test_amplified_vocab_coverage_linear(spark, sf_dir, amp_sf_dir):
    from go_zoom_kinesis_spark.operators.curation import tokenizer_vocab_coverage

    base = {r["source"]: r for r in tokenizer_vocab_coverage(spark, sf_dir).collect()}
    amp = {r["source"]: r for r in tokenizer_vocab_coverage(spark, amp_sf_dir).collect()}
    assert set(amp) == set(base)
    for s, b in base.items():
        a = amp[s]
        # token volume and OOV occurrences scale; the uniform 8x keeps
        # the fitted vocabulary identical, so OOV *types* do not
        assert a["n_tokens"] == b["n_tokens"] * AMP
        assert a["n_oov"] == b["n_oov"] * AMP
        assert a["n_oov_types"] == b["n_oov_types"]


def test_amplified_countmin_mergeable_linear(spark, sf_dir, amp_sf_dir):
    from go_zoom_kinesis_spark.operators.search import countmin_heavy_hitters

    base = {r["token"]: r for r in countmin_heavy_hitters(spark, sf_dir).collect()}
    amp = {r["token"]: r for r in countmin_heavy_hitters(spark, amp_sf_dir).collect()}
    # uniform scaling preserves the exact top-K ranking
    assert set(amp) == set(base)
    for t, b in base.items():
        a = amp[t]
        assert a["exact_count"] == b["exact_count"] * AMP
        # every sketch cell is a pure sum => the min-estimate is linear,
        # which is exactly the mergeability claim
        assert a["cm_est"] == b["cm_est"] * AMP


def test_amplified_curriculum_bins(spark, sf_dir, amp_sf_dir):
    # ntile spreads the remainder over the first bins, so per-bin sizes
    # scale exactly only when a language's count divides N_BINS; the
    # scale invariants are per-language totals and bin balance
    from collections import defaultdict

    from go_zoom_kinesis_spark.operators.curation import curriculum_quantile_bins

    def per_lang(rows):
        out = defaultdict(list)
        for r in rows:
            out[r["lang"]].append(r)
        return out

    base = per_lang(curriculum_quantile_bins(spark, sf_dir).collect())
    amp = per_lang(curriculum_quantile_bins(spark, amp_sf_dir).collect())
    assert set(amp) == set(base)
    for lang, brows in base.items():
        arows = amp[lang]
        assert len(arows) == len(brows)
        assert sum(r["n_docs"] for r in arows) == sum(r["n_docs"] for r in brows) * AMP
        assert (
            sum(r["total_chars"] for r in arows)
            == sum(r["total_chars"] for r in brows) * AMP
        )
        sizes = [r["n_docs"] for r in arows]
        assert max(sizes) - min(sizes) <= 1
        # bins stay value-ordered after amplification
        arows.sort(key=lambda r: r["bin"])
        for x, y in zip(arows, arows[1:]):
            assert x["max_chars"] <= y["min_chars"]


# --- round-4 operators at 8x volume ------------------------------------


@pytest.fixture(scope="module")
def amp_events_dir(spark, sf_dir, tmp_path_factory, amp_events):
    """A scale-factor dir whose events table is the 8x amplification
    (event_id shifted, user_id/event_type/value duplicated); every
    other table symlinks to the base dir."""
    import os

    from go_zoom_kinesis_spark.io import TABLES

    d = tmp_path_factory.mktemp("amp_ev_sf")
    amp_events.coalesce(4).write.parquet(str(d / "events.parquet"))
    for t in TABLES:
        if t == "events":
            continue
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    return str(d)


def test_amplified_compaction_totals_linear(spark, sf_dir, amp_sf_dir):
    from go_zoom_kinesis_spark.operators.layout import compaction_plan

    def per_source(rows):
        out: dict[str, list] = {}
        for r in rows:
            agg = out.setdefault(r["source"], [0, 0])
            agg[0] += r["n_files"]
            agg[1] += r["total_bytes"]
        return out

    base = per_source(compaction_plan(spark, sf_dir).collect())
    amp_rows = compaction_plan(spark, amp_sf_dir).collect()
    amp = per_source(amp_rows)
    assert set(amp) == set(base)
    for s, (nf, nb) in base.items():
        assert amp[s] == [nf * AMP, nb * AMP], s
    # bins stay dense per source after the 8x jump
    by_src: dict[str, list] = {}
    for r in amp_rows:
        by_src.setdefault(r["source"], []).append(r["bin_id"])
    for s, bins in by_src.items():
        assert sorted(bins) == list(range(len(bins))), s


def test_amplified_checksum_xor_cancels(spark, sf_dir, amp_sf_dir):
    """8 identical copies of every row XOR to zero — duplication is
    VISIBLE to the digest (a sum of hashes would scale instead and a
    count-insensitive digest would hide it); counts and bytes still
    scale linearly."""
    from go_zoom_kinesis_spark.operators.layout import (
        integrity_checksum_audit,
    )

    base = {
        r["source"]: r for r in integrity_checksum_audit(spark, sf_dir).collect()
    }
    amp = {
        r["source"]: r
        for r in integrity_checksum_audit(spark, amp_sf_dir).collect()
    }
    assert set(amp) == set(base)
    for s, b in base.items():
        a = amp[s]
        assert a["n_rows"] == b["n_rows"] * AMP
        assert a["bytes_total"] == b["bytes_total"] * AMP
        assert a["checksum"] == 0, s  # even copy count cancels


def test_amplified_overlap_and_correlation_duplication_invariant(
    spark, sf_dir, amp_events_dir
):
    """Event duplication must not move set sketches (distinct user
    sets unchanged) nor profile correlations (hourly means unchanged) —
    the invariants that make both operators trustworthy on re-delivered
    / at-least-once input."""
    from go_zoom_kinesis_spark.operators.dedup import minhash_user_overlap
    from go_zoom_kinesis_spark.operators.timeseries import (
        ts_profile_correlation,
    )

    def keyed(rows):
        return {
            (r["type_a"], r["type_b"]): tuple(r) for r in rows
        }

    assert keyed(minhash_user_overlap(spark, sf_dir).collect()) == keyed(
        minhash_user_overlap(spark, amp_events_dir).collect()
    )
    base = {
        (r["type_a"], r["type_b"]): round(r["pearson_r"], 9)
        for r in ts_profile_correlation(spark, sf_dir).collect()
    }
    amp = {
        (r["type_a"], r["type_b"]): round(r["pearson_r"], 9)
        for r in ts_profile_correlation(spark, amp_events_dir).collect()
    }
    assert base == amp
