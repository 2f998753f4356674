"""Round-9 operator cohort referees — semantic checks that are
INDEPENDENT of the DuckDB oracle replay (which test_oracle_parity.py
already applies to every registered query):

- dsir_importance_weights: target-language docs must outrank the rest
  on average, and the selected flag must equal sign(weight).
- ts_seasonal_decompose:    seasonal components are mean deviations, so
  their n-weighted sum per type telescopes to ~0; level is constant
  within a type.
- contamination_longest_run: a PLANTED contiguous overlap in a
  hand-built corpus is found with exactly the planted run length,
  and scattered (non-contiguous) overlap is NOT reported.
- shard_rendezvous_assign:  the HRW minimal-movement law — growing the
  fleet by one moves shards ONLY onto the new worker — plus
  conservation and balance.
- conformal_threshold_audit: the distribution-free coverage guarantee
  within finite-sample slack.
"""

from __future__ import annotations

import os

import pytest

from go_zoom_kinesis_spark import registry
from go_zoom_kinesis_spark.operators.curation import DSIR_TARGET_LANG
from go_zoom_kinesis_spark.operators.pipeline import (
    EVAL_MOD,
    RUN_MIN_SHINGLES,
    RUN_N,
)
from go_zoom_kinesis_spark.operators.streaming_analogs import (
    HRW_VSHARDS,
    HRW_W,
)
from go_zoom_kinesis_spark.operators.stats import CONF_ALPHA_PCT

Q = registry.all_queries()

R9_NAMES = (
    "dsir_importance_weights",
    "ts_seasonal_decompose",
    "contamination_longest_run",
    "shard_rendezvous_assign",
    "conformal_threshold_audit",
)


def test_r9_cohort_registered():
    oracles = registry.all_oracle_sql()
    for name in R9_NAMES:
        assert name in Q, name
        assert name in oracles, name


# --- dsir_importance_weights ---------------------------------------------


def test_dsir_target_docs_outrank_rest(spark, sf_dir):
    rows = Q["dsir_importance_weights"](spark, sf_dir).collect()
    tgt = [r.dsir_weight_fp for r in rows if r.lang == DSIR_TARGET_LANG]
    rest = [r.dsir_weight_fp for r in rows if r.lang != DSIR_TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
    for r in rows:
        assert r.selected == (r.dsir_weight_fp > 0)
        assert r.n_feats > 0


# --- ts_seasonal_decompose -----------------------------------------------


def test_seasonal_components_telescope(spark, sf_dir):
    rows = Q["ts_seasonal_decompose"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(rows) == sum(len(v) for v in by_type.values())
    for t, rs in by_type.items():
        hods = sorted(r.hod for r in rs)
        assert hods == list(range(24)), t
        levels = {r.level for r in rs}
        assert len(levels) == 1, t  # level is a per-type constant
        slopes = {r.trend_per_day for r in rs}
        assert len(slopes) == 1, t
        n0 = sum(r.n_obs for r in rs)
        # Σ_h n_h · seasonal_h = Σv − n0·level = 0 (up to the 6dp
        # rounding of each published component)
        resid = sum(r.n_obs * r.seasonal for r in rs)
        assert abs(resid) < n0 * 1e-5, (t, resid)
        for r in rs:
            assert abs(r.hod_mean - r.level - r.seasonal) < 2e-6


# --- contamination_longest_run: planted-corpus referee --------------------


def _write_docs(spark, tmp_path, docs):
    """docs: list of (doc_id, text) — writes a minimal documents table."""
    df = spark.createDataFrame(
        [
            (i, t, "en", "src0", len(t))
            for i, t in docs
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = os.path.join(str(tmp_path), "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_longest_run_finds_planted_overlap(spark, tmp_path):
    # eval doc 0 (0 % EVAL_MOD == 0) carries tokens e1..e10; train doc 1
    # copies the contiguous span e3..e8 (6 tokens ⇒ 6-RUN_N+1 = 4
    # consecutive 3-gram windows); train doc 2 shares the same 6 tokens
    # but SCATTERED, so no window (3 consecutive tokens) ever matches.
    eval_toks = [f"e{i}" for i in range(1, 11)]
    planted = eval_toks[2:8]
    scattered = []
    for i, tok in enumerate(planted):
        scattered.extend([tok, f"x{i}"])
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, " ".join(eval_toks)),
            (1, "a b " + " ".join(planted) + " c d"),
            (2, " ".join(scattered)),
        ],
    )
    rows = {r.doc_id: r for r in Q["contamination_longest_run"](spark, sf).collect()}
    assert 1 in rows
    r = rows[1]
    assert r.run_shingles == len(planted) - RUN_N + 1  # 4
    assert r.run_tokens == len(planted)  # 6
    assert r.best_eval_doc_id == 0
    assert 2 not in rows  # scattered overlap must not be flagged


def test_longest_run_threshold(spark, tmp_path):
    # an overlap shorter than RUN_MIN_SHINGLES windows is not reported
    short = [f"s{i}" for i in range(RUN_N + RUN_MIN_SHINGLES - 2)]
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, " ".join(f"e{i}" for i in range(6)) + " " + " ".join(short)),
            (1, "p q " + " ".join(short) + " r"),
        ],
    )
    rows = Q["contamination_longest_run"](spark, sf).collect()
    assert rows == []


def test_longest_run_flags_real_duplicates(spark, sf_dir):
    # on the driver corpus the flagged docs (if any) respect the floor
    for r in Q["contamination_longest_run"](spark, sf_dir).collect():
        assert r.run_shingles >= RUN_MIN_SHINGLES
        assert r.run_tokens == r.run_shingles + RUN_N - 1
        assert r.doc_id % EVAL_MOD != 0
        assert r.best_eval_doc_id % EVAL_MOD == 0


# --- shard_rendezvous_assign ----------------------------------------------


def test_rendezvous_minimal_movement(spark, sf_dir):
    rows = {r.worker: r for r in Q["shard_rendezvous_assign"](spark, sf_dir).collect()}
    assert set(rows) <= set(range(HRW_W + 1))
    total_now = sum(r.n_owned_now for r in rows.values())
    total_next = sum(r.n_owned_next for r in rows.values())
    # every present shard owned exactly once in both fleets (sf0.001
    # populates only a subset of the HRW_VSHARDS key space)
    assert total_now == total_next
    assert 0 < total_now <= HRW_VSHARDS
    for w, r in rows.items():
        assert r.n_kept + r.n_moved_in == r.n_owned_next
        if w < HRW_W:
            # HRW law: an existing worker NEVER gains when the fleet grows
            assert r.n_moved_in == 0, w
            assert r.n_owned_next <= r.n_owned_now, w
        else:
            assert r.n_kept == 0
            assert r.n_moved_in == r.n_owned_next > 0
    # balance sanity (only meaningful with a reasonably full key space):
    # no worker owns more than 2.5x its fair share
    if total_now >= HRW_VSHARDS // 2:
        fair = total_now / HRW_W
        for w, r in rows.items():
            if w < HRW_W:
                assert r.n_owned_now <= 2.5 * fair, (w, r.n_owned_now)


# --- conformal_threshold_audit --------------------------------------------


def test_conformal_coverage_guarantee(spark, sf_dir):
    rows = Q["conformal_threshold_audit"](spark, sf_dir).collect()
    assert len(rows) > 0
    alpha = CONF_ALPHA_PCT / 100.0
    for r in rows:
        assert r.threshold > 0
        assert 0.0 <= r.coverage <= 1.0
        # finite-sample conformal slack: ±3·sqrt(α(1−α)/n) + 1/n_cal
        slack = 3 * (alpha * (1 - alpha) / max(r.n_test, 1)) ** 0.5
        slack += 1.0 / max(r.n_cal, 1)
        assert r.coverage >= alpha - slack - 0.02, (r.event_type, r.coverage)
        assert r.n_covered <= r.n_test


# --- ts_holt_linear: pure-Python fold replay ------------------------------


def test_holt_linear_python_replay(spark, sf_dir):
    from go_zoom_kinesis_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    hist: dict[int, list] = {}
    for r in ev.collect():
        hist.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    out = {r.user_id: r for r in Q["ts_holt_linear"](spark, sf_dir).collect()}
    assert set(out) == set(hist)
    for uid, h in hist.items():
        vals = [v for _, _, v in sorted(h)]
        if len(vals) == 1:
            level, trend = vals[0], 0.0
        else:
            level, trend = vals[1], vals[1] - vals[0]
            for x in vals[2:]:
                l_new = ((x + level) + trend) / 2
                trend = ((l_new - level) + trend) / 2
                level = l_new
        r = out[uid]
        assert r.n_events == len(vals)
        assert r.holt_level == level, uid  # bit-exact, no tolerance
        assert r.holt_trend == trend, uid
        assert r.forecast_next == level + trend, uid


# --- ivf_probe_sweep: frontier-shape referee ------------------------------


def test_ivf_probe_sweep_frontier(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.similarity import (
        IVF_SWEEP,
        IVF_TOP_K,
    )

    rows = sorted(
        Q["ivf_probe_sweep"](spark, sf_dir).collect(), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == sorted(IVF_SWEEP)
    truths = {r.n_truth for r in rows}
    assert len(truths) == 1  # denominator shared across sweep points
    for a, b in zip(rows, rows[1:]):
        # more probes can only ADD candidates and never lose a hit:
        # recall is monotone non-decreasing, cost strictly increasing
        assert b.n_candidates > a.n_candidates
        assert b.recall_ppm >= a.recall_ppm
        assert b.n_queries_hit >= a.n_queries_hit
    for r in rows:
        assert 0 <= r.n_hits <= r.n_truth
        assert r.n_hits <= r.n_queries_hit * IVF_TOP_K


# --- streaming Holt: batch==stream bit-exact pin --------------------------


def test_streaming_holt_matches_batch(spark, tmp_path, sf_dir):
    """The stream tier (ValueState per user, O(1) state) must land on
    EXACTLY the batch ts_holt_linear row for every user when the
    corpus arrives as two event-time-ordered micro-batches. Holt is an
    ordered fold, so unlike the KMV pin this one is conditional on
    input order — which the chunking below supplies and a per-shard
    Kinesis consumer guarantees within a shard. The final emission per
    user is the one with the highest n_events (monotone per user)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.streaming.holt_stream import (
        streaming_holt_linear,
    )

    rows = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r["ts"], r["event_id"], r["value"]),
    )
    half = len(rows) // 2
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "holt_src")
    for chunk in (rows[:half], rows[half:]):
        spark.createDataFrame(
            [tuple(r) for r in chunk], schema
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_holt_linear(stream)
        .writeStream.format("memory")
        .queryName("holt_stream_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "holt_ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    emitted = spark.sql("select * from holt_stream_t").collect()
    assert emitted, "stream emitted nothing - pin is vacuous"
    final = {}
    for r in emitted:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    batch = {r["user_id"]: r for r in Q["ts_holt_linear"](spark, sf_dir).collect()}
    assert sorted(final) == sorted(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert s["n_events"] == b["n_events"], uid
        # bit-exact, no tolerance: same IEEE op sequence, same order
        assert s["holt_level"] == b["holt_level"], uid
        assert s["holt_trend"] == b["holt_trend"], uid
        assert s["forecast_next"] == b["forecast_next"], uid


# --- watermark_lateness_sweep ---------------------------------------------


def test_lateness_sweep_monotone(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.streaming_analogs import (
        N_SHARDS,
        WM_SWEEP_SEC,
    )

    rows = sorted(
        Q["watermark_lateness_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.lateness_sec,
    )
    assert [r.lateness_sec for r in rows] == sorted(WM_SWEEP_SEC)
    totals = {r.n_kept + r.n_dropped for r in rows}
    assert len(totals) == 1  # every event classified at every threshold
    maxlate = {r.max_late_by_sec for r in rows}
    assert len(maxlate) == 1  # threshold-independent observation
    for a, b in zip(rows, rows[1:]):
        # a larger allowed lateness can only keep MORE events
        assert b.n_dropped <= a.n_dropped
        assert b.n_kept >= a.n_kept
    for r in rows:
        assert 0 <= r.n_shards_dropping <= N_SHARDS
        assert (r.n_dropped == 0) == (r.n_shards_dropping == 0)
        assert r.dropped_ppm == r.n_dropped * 1_000_000 // (
            r.n_kept + r.n_dropped
        )


# --- entity_resolution_pipeline: union-find replay referee ----------------


def test_entity_resolution_matches_python_union_find(spark, sf_dir):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    pair_rows = Q["fuzzy_match_parts"](spark, sf_dir).collect()
    for r in pair_rows:
        union(r.pk_a, r.pk_b)
    comps: dict[int, set] = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    expect = {root: len(members) for root, members in comps.items()}
    got = {
        r.entity_id: r
        for r in Q["entity_resolution_pipeline"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)  # entity id = min member, exactly
    pair_count: dict[int, int] = {}
    worst: dict[int, int] = {}
    for r in pair_rows:
        root = find(r.pk_a)
        pair_count[root] = pair_count.get(root, 0) + 1
        worst[root] = max(worst.get(root, 0), r.edit_dist)
    for root, n in expect.items():
        assert got[root].n_members == n, root
        assert got[root].n_members >= 2
        assert got[root].n_matched_pairs == pair_count[root], root
        assert got[root].max_intra_edit_dist == worst[root], root
