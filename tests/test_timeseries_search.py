"""Semantic invariants for the time-series, merge/SCD, privacy and
search operators — oracle parity is covered by the preflight/driver
hash gate; these assert the properties the hash can't express
(interval tilings, fold recurrences, redaction completeness,
ranking monotonicity)."""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.privacy import pii_scrub
from go_zoom_kinesis_spark.operators.search import (
    BM25_TERMS,
    HEAVY_HITTER_K,
    POSTINGS_CAP,
    search_bm25_topk,
    search_heavy_hitters,
    search_inverted_postings,
)
from go_zoom_kinesis_spark.operators.timeseries import (
    Z_THRESHOLD,
    merge_upsert_state,
    scd2_user_status,
    ts_ewma_user,
    ts_gapfill_hours,
    ts_zscore_outliers,
)


def test_ewma_matches_python_recurrence(spark, sf_dir):
    got = {r["user_id"]: r for r in ts_ewma_user(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    hist = defaultdict(list)
    for r in ev:
        hist[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    for uid, seq in hist.items():
        seq.sort()
        ewma = seq[0][2]
        for _, _, v in seq[1:]:
            ewma = (ewma + v) / 2
        assert got[uid]["ewma_value"] == ewma  # bit-exact, by design
        assert got[uid]["n_events"] == len(seq)
        assert got[uid]["last_value"] == seq[-1][2]


def test_gapfill_grid_is_dense_and_locf_monotone(spark, sf_dir):
    rows = ts_gapfill_hours(spark, sf_dir).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    grids = set()
    for typ, rs in by_type.items():
        rs.sort(key=lambda r: r["bucket_hour"])
        hours = [r["bucket_hour"] for r in rs]
        # dense hourly grid: every consecutive delta is exactly 1h
        assert all(
            (b - a).total_seconds() == 3600 for a, b in zip(hours, hours[1:])
        )
        grids.add((hours[0], hours[-1]))
        # gap rows have zero count, and locf never un-sets once observed
        seen = False
        for r in rs:
            assert (r["n_events"] == 0) == r["gap_filled"]
            seen = seen or not r["gap_filled"]
            if seen:
                assert r["locf_sum_value"] is not None
    # all types share the same global [lo, hi] grid
    assert len(grids) == 1


def test_scd2_intervals_tile_each_user(spark, sf_dir):
    rows = scd2_user_status(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["version_no"])
        # versions are 1..n, adjacent statuses differ, intervals chain
        assert [r["version_no"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["status"] != b["status"]
            assert a["valid_to"] == b["valid_from"]
        assert all(not r["is_current"] for r in rs[:-1])
        assert rs[-1]["is_current"] and rs[-1]["valid_to"] is None


def test_merge_upsert_classification(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.timeseries import MERGE_CUTOFF

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")
    pre = {r["user_id"] for r in ev.filter(F.col("ts") < cutoff).select("user_id").distinct().collect()}
    post = {r["user_id"] for r in ev.filter(F.col("ts") >= cutoff).select("user_id").distinct().collect()}
    got = {r["user_id"]: r for r in merge_upsert_state(spark, sf_dir).collect()}
    assert set(got) == pre | post
    for uid, r in got.items():
        expected = (
            "insert" if uid not in pre
            else "carry" if uid not in post
            else "update"
        )
        assert r["change_kind"] == expected
        assert (r["n_updates_applied"] > 0) == (uid in post)


def test_zscore_outliers_are_actual_outliers(spark, sf_dir):
    rows = ts_zscore_outliers(spark, sf_dir).collect()
    for r in rows:
        assert abs(r["zscore"]) > Z_THRESHOLD


def test_pii_scrub_removes_all_pii(spark, sf_dir):
    rows = pii_scrub(spark, sf_dir).collect()
    for r in rows:
        assert r["n_emails"] >= 1  # every doc gets an injected email
        assert r["n_phones"] == (1 if r["doc_id"] % 2 == 0 else 0)
        assert r["n_ips"] == (1 if r["doc_id"] % 3 == 0 else 0)
    # independently re-scrub one augmented doc in Python and compare
    from go_zoom_kinesis_spark.operators.privacy import (
        EMAIL_RE,
        IP_RE,
        PHONE_RE,
        _augmented,
    )

    sample = _augmented(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    got = {r["doc_id"]: r for r in rows}
    for s in sample:
        red = re.sub(EMAIL_RE, "<EMAIL>", s["aug_text"])
        red = re.sub(PHONE_RE, "<PHONE>", red)
        red = re.sub(IP_RE, "<IP>", red)
        assert got[s["doc_id"]]["redacted_len"] == len(red)
        assert "@" not in red and "10.0." not in red


def test_inverted_postings_consistent(spark, sf_dir):
    rows = search_inverted_postings(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    posting_truth = defaultdict(set)
    tf_truth = defaultdict(int)
    for d in docs:
        toks = [t for t in d["text"].lower().split(" ") if t]
        for t in toks:
            tf_truth[t] += 1
            posting_truth[t].add(d["doc_id"])
    for r in rows:
        assert r["df"] == len(posting_truth[r["token"]])
        assert r["total_tf"] == tf_truth[r["token"]]
        head = sorted(posting_truth[r["token"]])[:POSTINGS_CAP]
        assert r["postings_head"] == ",".join(str(x) for x in head)


def test_bm25_ranking_sane(spark, sf_dir):
    rows = search_bm25_topk(spark, sf_dir).collect()
    assert rows, "query terms must hit the corpus"
    scores = [r["bm25_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r["n_terms_hit"] <= len(BM25_TERMS)
        assert r["bm25_score"] > 0


def test_heavy_hitters_exact(spark, sf_dir):
    rows = search_heavy_hitters(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    counts = defaultdict(int)
    for d in docs:
        for t in d["text"].lower().split(" "):
            if t:
                counts[t] += 1
    truth = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    k = min(HEAVY_HITTER_K, len(truth))
    assert [(r["token"], r["cnt"]) for r in rows] == truth[:k]
    total = sum(counts.values())
    for r in rows:
        assert r["share"] == r["cnt"] / total


def test_time_range_window_matches_python(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.timeseries import (
        window_time_range_sum,
    )

    rows = window_time_range_sum(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (int(r["ts"].timestamp()), r["event_id"])
        )
    got = {r["event_id"]: r for r in rows}
    for uid, pts in by_user.items():
        for es, eid in pts:
            n = sum(1 for s, _ in pts if es - 3600 <= s <= es)
            assert got[eid]["n_trailing_1h"] == n
            assert got[eid]["epoch_s"] == es


def test_fuzzy_match_symmetric_and_bounded(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.search import (
        FUZZY_MAX_DIST,
        fuzzy_match_parts,
    )

    rows = fuzzy_match_parts(spark, sf_dir).collect()
    parts = {
        r["p_partkey"]: (r["p_name"], r["p_size"])
        for r in load_table(spark, sf_dir, "part").collect()
    }
    for r in rows:
        assert r["pk_a"] < r["pk_b"]
        # 0 = exact duplicate names within the block (legit match)
        assert 0 <= r["edit_dist"] <= FUZZY_MAX_DIST
        name_a, size_a = parts[r["pk_a"]]
        name_b, size_b = parts[r["pk_b"]]
        # same blocking key
        assert name_a.split(" ")[-1] == name_b.split(" ")[-1]
        assert size_a == size_b


def _numpy_gram(sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    from go_zoom_kinesis_spark.operators.similarity import INT8_MAX

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    M = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
    amax = np.abs(M).max(axis=1)
    scale = np.where(amax == 0.0, 1.0, amax / INT8_MAX)
    q = np.floor(M / scale[:, None] + 0.5)
    return q.T @ q


def test_pca_eigensolve_matches_numpy_eigh(spark, sf_dir):
    """embedding_pca_eigensolve's loading vector must align with the
    top eigenvector of the exact int8 Gram computed directly in numpy
    (|cos| -> 1) with a matching top eigenvalue."""
    import numpy as np

    from go_zoom_kinesis_spark.operators.similarity import (
        embedding_pca_eigensolve,
    )

    G = _numpy_gram(sf_dir)
    evals, evecs = np.linalg.eigh(G)
    top_val, top_vec = evals[-1], evecs[:, -1]

    out = embedding_pca_eigensolve(spark, sf_dir).orderBy("dim_idx").collect()
    v = np.array([r["loading"] for r in out])
    assert abs(abs(v @ top_vec) - 1.0) < 1e-6
    assert abs(out[0]["eigenvalue"] - top_val) / top_val < 1e-9
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_pca_invariants_referee(spark, sf_dir):
    """The registered embedding_pca_top invariants recomputed by an
    exact-integer Python referee over the numpy Gram, plus the
    spectral laws they encode: rq0 ≤ rq1 ≤ λ_max ≤ tr(G) and
    ‖G‖_F² = q·tr + r with 0 ≤ r < tr."""
    import numpy as np

    from go_zoom_kinesis_spark.operators.similarity import (
        DIM,
        PCA_FP,
        PCA_U_SCALE,
        embedding_pca_top,
    )

    G = np.rint(_numpy_gram(sf_dir)).astype(object)  # exact python ints
    row = embedding_pca_top(spark, sf_dir).collect()[0]

    trace = int(sum(G[d][d] for d in range(DIM)))
    frob = int(sum(int(G[i][j]) ** 2 for i in range(DIM) for j in range(DIM)))
    sum_all = int(sum(int(G[i][j]) for i in range(DIM) for j in range(DIM)))
    w = [int(sum(int(G[i][j]) for j in range(DIM))) for i in range(DIM)]
    m = max(max(abs(x) for x in w), 1)
    u = [((x + m) * PCA_U_SCALE) // m - PCA_U_SCALE for x in w]
    den = sum(x * x for x in u)
    num = sum(
        u[i] * int(G[i][j]) * u[j] for i in range(DIM) for j in range(DIM)
    )

    assert row["trace_g"] == trace
    assert row["frob_div_trace"] == frob // trace
    assert row["frob_mod_trace"] == frob % trace
    assert row["rq0_fp6"] == (sum_all * PCA_FP) // DIM
    assert row["v1_max_abs"] == m
    assert row["u_norm_sq"] == den
    assert row["rq1_int"] == num // den
    assert row["rq1_frac_fp6"] == ((num % den) * PCA_FP) // den

    # spectral laws: any Rayleigh quotient is ≤ λ_max, and one exact
    # power step cannot decrease it (u is the 10-bit quantization of
    # v₁, so allow its ~2⁻¹⁰ relative perturbation on the comparison)
    lam_max = float(np.linalg.eigvalsh(_numpy_gram(sf_dir))[-1])
    rq0 = row["rq0_fp6"] / PCA_FP
    rq1 = row["rq1_int"] + row["rq1_frac_fp6"] / PCA_FP
    assert rq0 <= rq1 * (1 + 1e-2) + 1e-6
    assert rq1 <= lam_max * (1 + 1e-9)
    assert lam_max <= trace + 1e-6
    assert 0 <= row["frob_mod_trace"] < trace
