"""Semantic invariants for the round-4b operators (sessionization with
dual caps, linear attribution, CUSUM change points, trending momentum,
status dwell time): each test recomputes the semantics independently in
plain Python over the raw parquet, so a bug mirrored into both the
Spark query and its DuckDB oracle still fails here.
"""

from __future__ import annotations

import duckdb

from go_zoom_kinesis_spark.operators.behavior import (
    ATTRIB_WINDOW_US,
    SESSION_CAP_US,
    SESSION_GAP_US,
    attribution_linear,
    session_split_dual_cap,
)
from go_zoom_kinesis_spark.operators.timeseries import (
    status_dwell_time,
    trending_momentum,
    ts_cusum_shift,
)


def _events_rows(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               CAST(ts AS DATE) AS d
        FROM '{sf_dir}/events.parquet'
        ORDER BY user_id, us, event_id
        """
    ).fetchall()


def _python_sessions(rows):
    """Reference sessionizer: gap-break then duration slices."""
    sessions = {}
    cur_user, seq, start_us, prev_us = None, 0, None, None
    for user, _eid, _tp, us, cents, _d in rows:
        if user != cur_user:
            cur_user, seq, start_us, prev_us = user, 1, us, us
        elif us - prev_us > SESSION_GAP_US:
            seq, start_us = seq + 1, us
        prev_us = us
        slice_no = (us - start_us) // SESSION_CAP_US
        key = (user, seq, slice_no)
        n, lo, hi, sc = sessions.get(key, (0, us, us, 0))
        sessions[key] = (n + 1, min(lo, us), max(hi, us), sc + cents)
    return sessions


def test_session_split_matches_python_reference(spark, sf_dir):
    rows = _events_rows(sf_dir)
    want = _python_sessions(rows)
    got = {
        (r["user_id"], r["session_seq"], r["slice_no"]): (
            r["n_events"],
            r["duration_us"],
            r["sum_cents"],
        )
        for r in session_split_dual_cap(spark, sf_dir).collect()
    }
    assert len(got) == len(want)
    for key, (n, lo, hi, sc) in want.items():
        gn, gdur, gsc = got[key]
        assert (gn, gsc) == (n, sc)
        assert gdur == hi - lo
        # the split cap really caps: no slice spans >= CAP
        assert gdur < SESSION_CAP_US


def test_session_split_covers_every_event(spark, sf_dir):
    out = session_split_dual_cap(spark, sf_dir)
    total = out.groupBy().sum("n_events").collect()[0][0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events


def test_attribution_matches_python_reference(spark, sf_dir):
    rows = _events_rows(sf_dir)
    # next purchase strictly after each row, per user
    per_type = {}
    conv_touch_counts = {}
    touches = []
    by_user = {}
    for r in rows:
        by_user.setdefault(r[0], []).append(r)
    for user, evs in by_user.items():
        next_p = [None] * len(evs)
        best = None
        for i in range(len(evs) - 1, -1, -1):
            next_p[i] = best
            if evs[i][2] == "purchase":
                best = evs[i][3] if best is None else min(best, evs[i][3])
        for r, np_us in zip(evs, next_p):
            if (
                r[2] in ("view", "click")
                and np_us is not None
                and np_us - r[3] <= ATTRIB_WINDOW_US
            ):
                touches.append((user, np_us, r[2]))
                conv_touch_counts[(user, np_us)] = (
                    conv_touch_counts.get((user, np_us), 0) + 1
                )
    for user, np_us, tp in touches:
        credit = 1_000_000 // conv_touch_counts[(user, np_us)]
        n, s, convs = per_type.get(tp, (0, 0, set()))
        convs.add((user, np_us))
        per_type[tp] = (n + 1, s + credit, convs)
    got = {
        r["event_type"]: (
            r["n_touches"],
            r["sum_credit_ppm"],
            r["n_conversions"],
        )
        for r in attribution_linear(spark, sf_dir).collect()
    }
    want = {tp: (n, s, len(c)) for tp, (n, s, c) in per_type.items()}
    assert got == want and got


def test_cusum_matches_python_argmax(spark, sf_dir):
    rows = _events_rows(sf_dir)
    series = {}
    for _u, eid, tp, us, cents, _d in rows:
        series.setdefault(tp, []).append((us, eid, cents))
    want = {}
    for tp, evs in series.items():
        evs.sort()
        n = len(evs)
        total = sum(c for _, _, c in evs)
        s, best = 0, None
        for k, (us, eid, c) in enumerate(evs, start=1):
            s += c
            d = abs(n * s - k * total)
            # ties keep the earliest (us, event_id) — mirror the query
            if best is None or d > best[0]:
                best = (d, k, s)
        want[tp] = best
    got = {
        r["event_type"]: (r["max_abs_d"], r["shift_k"], r["pre_sum_cents"])
        for r in ts_cusum_shift(spark, sf_dir).collect()
    }
    assert got == want and got


def test_trending_windows_partition_last_fortnight(spark, sf_dir):
    rows = _events_rows(sf_dir)
    ref = max(r[5] for r in rows)
    want = {}
    for _u, _e, tp, _us, cents, d in rows:
        age = (ref - d).days
        rn, rc, pn, pc = want.get(tp, (0, 0, 0, 0))
        if age <= 6:
            rn, rc = rn + 1, rc + cents
        elif 7 <= age <= 13:
            pn, pc = pn + 1, pc + cents
        want[tp] = (rn, rc, pn, pc)
    for r in trending_momentum(spark, sf_dir).collect():
        rn, rc, pn, pc = want[r["event_type"]]
        assert (r["recent_n"], r["recent_cents"]) == (rn, rc)
        assert (r["prior_n"], r["prior_cents"]) == (pn, pc)
        if pc > 0:
            assert r["momentum_ppm"] == (1_000_000 * rc) // pc
        else:
            assert r["momentum_ppm"] is None


def test_dwell_time_tiles_each_user_timeline(spark, sf_dir):
    """Dwell intervals partition [first event, corpus max] per user, so
    the total dwell equals Σ_users (max_ts − first_ts(user)) and there
    is exactly one open interval per user."""
    rows = _events_rows(sf_dir)
    max_us = max(r[3] for r in rows)
    first_us = {}
    for r in rows:
        first_us.setdefault(r[0], r[3])  # rows are user/us ordered
    out = status_dwell_time(spark, sf_dir).collect()
    assert sum(r["n_open"] for r in out) == len(first_us)
    assert sum(r["total_dwell_us"] for r in out) == sum(
        max_us - us for us in first_us.values()
    )
