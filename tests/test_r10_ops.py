"""Round-10 referees — semantic checks independent of the DuckDB
oracle replay (test_oracle_parity.py covers every registered query):

- _min_label_propagate: the shared connected-components fixpoint now
  FAILS LOUDLY when the iteration cap is hit (ADVICE r9: the silent
  fall-through shipped plausible-but-wrong unmerged components), and
  still converges exactly on a deep chain when given enough rounds.
- conformal_threshold_audit: the (n-1)p rank arithmetic was
  generalized from tenths to hundredths (ADVICE r9: `(n-1)*(pct//10)`
  silently computed the wrong percentile for pct not a multiple of
  10 on BOTH engines, invisible to oracle parity) — replay the
  threshold against numpy.percentile, which uses the same
  linear-interpolation convention, so a both-engines-wrong regression
  is caught by a third implementation.
"""

from __future__ import annotations

import pytest

from go_zoom_kinesis_spark import registry

Q = registry.all_queries()


# --- _min_label_propagate loud-fail + deep-chain convergence -------------


def _chain_edges(spark, n: int):
    """Bidirected path graph 1-2-...-n (diameter n-1 — the worst case
    for per-round min-label hops)."""
    from pyspark.sql import functions as F

    pairs = [(i, i + 1) for i in range(1, n)]
    df = spark.createDataFrame(pairs, "a long, b long")
    return (
        df.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(df.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .cache()
    )


def _init_labels(edges):
    from pyspark.sql import functions as F

    return (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )


def test_min_label_nonconvergence_raises(spark):
    """r11: the default past-cap behavior is now escalation to the
    O(log n) star rounds (see tests/test_r11_ops.py); the r10 loud-fail
    contract lives behind deep_fallback=False and must still trip."""
    from go_zoom_kinesis_spark.operators.search import _min_label_propagate

    edges = _chain_edges(spark, 8)
    with pytest.raises(RuntimeError, match="still changing"):
        _min_label_propagate(
            edges, _init_labels(edges), max_iters=1, deep_fallback=False
        )


def test_min_label_deep_chain_converges_exact(spark):
    from go_zoom_kinesis_spark.operators.search import _min_label_propagate

    edges = _chain_edges(spark, 8)
    labels = _min_label_propagate(edges, _init_labels(edges), max_iters=20)
    got = {r.node: r.lbl for r in labels.collect()}
    assert got == {i: 1 for i in range(1, 9)}


# --- conformal rank arithmetic vs numpy (third engine) -------------------


def test_conformal_threshold_matches_numpy(spark, sf_dir):
    """Recompute each type's calibration scores exactly as the query
    defines them (fixed-point ints, md5-bucket split) and pin the
    query's threshold to numpy.percentile's (n-1)p linear
    interpolation — the convention both engines claim to implement."""
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.operators.stats import (
        CONF_ALPHA_PCT,
        CONF_CAL_CUT,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", F.col("value"))
        .collect()
    )
    cal: dict[str, list[int]] = {}
    for r in rows:
        bucket = int(hashlib.md5(str(r.event_id).encode()).hexdigest()[:4], 16)
        if bucket < CONF_CAL_CUT:
            cal.setdefault(r.event_type, []).append(round(r.value * 1e6))
    expected = {}
    for t, vs in cal.items():
        mean_fp = sum(vs) // len(vs)
        scores = np.array([abs(v - mean_fp) for v in vs], dtype=np.float64)
        expected[t] = round(
            float(np.percentile(scores, CONF_ALPHA_PCT)) / 1e6, 6
        )
    got = {
        r.event_type: r.threshold
        for r in Q["conformal_threshold_audit"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for t in expected:
        assert got[t] == pytest.approx(expected[t], abs=2e-6), t


# --- decode_image: real BMP/PPM parser (r10 — closes the last stub) ------


def test_decode_roundtrip_both_containers():
    """Every synthesized raster survives encode→decode bit-for-bit in
    both containers — widths 4..8 cover all 4-byte-padding residues."""
    import numpy as np

    from go_zoom_kinesis_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_ppm,
        synth_raster,
    )

    for d in range(40):
        pix = synth_raster(d)
        for enc in (encode_bmp, encode_ppm):
            img = decode_image(enc(pix))
            assert (img.width, img.height) == (pix.shape[1], pix.shape[0])
            assert np.array_equal(img.pixels, pix), (d, enc.__name__)


def test_decode_topdown_bmp():
    """Negative biHeight = top-down row order — no flip on decode."""
    import struct

    import numpy as np

    from go_zoom_kinesis_spark.operators.multimodal import (
        decode_image,
        synth_raster,
    )

    pix = synth_raster(7)
    h, w, _ = pix.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_bytes), np.uint8)
    body[:, : w * 3] = pix[:, :, ::-1].reshape(h, w * 3)
    head = struct.pack(
        "<2sIHHI", b"BM", 54 + body.size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, body.size, 2835, 2835, 0, 0
    )
    assert np.array_equal(decode_image(head + body.tobytes()).pixels, pix)


def test_decode_compressed_formats_stay_loud():
    """Entropy-coded containers keep the explicit NotImplementedError;
    junk keeps ValueError — no silent wrong decode. (PNG left this
    list in r12 — it decodes natively now; its unsupported VARIANTS
    stay loud, pinned in test_r12_ops.)"""
    from go_zoom_kinesis_spark.operators.multimodal import decode_image

    for payload in (
        b"\xff\xd8\xff\xe0JFIF",
        b"GIF89a..",
        b"RIFF....WEBP",
    ):
        with pytest.raises(NotImplementedError):
            decode_image(payload)
    with pytest.raises(ValueError):
        decode_image(b"ZZnot-an-image")
    # a PNG signature with garbage after it is now a PARSE error
    # (truncated chunk walk), not an unimplemented format
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")


def test_ppm_header_comments_and_whitespace():
    """PPM headers with interleaved comments/whitespace still parse."""
    import numpy as np

    from go_zoom_kinesis_spark.operators.multimodal import decode_image

    pix = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6 # c1\n  3 # width done\n\t2\n255\n" + pix.tobytes()
    img = decode_image(payload)
    assert (img.width, img.height) == (3, 2)
    assert np.array_equal(img.pixels, pix)


# --- lsh_recall_audit error bar (r10 output-contract extension) ----------


def _wilson_ppm(hits: int, n: int) -> float:
    """Python replay of the operator's 95% Wilson half-width (ppm)."""
    import math

    p = hits / n
    return round(
        1.96e6
        * math.sqrt(p * (1 - p) / n + 3.8416 / (4.0 * n * n))
        / (1.0 + 3.8416 / n),
        6,
    )


def test_lsh_recall_audit_states_uncertainty(spark, sf_dir):
    """The audit row must carry the sampling contract and binomial
    95% half-widths consistent with its own counts (python replay of
    the Wilson z·sqrt(p(1-p)/n + z²/4n²)/(1+z²/n) arithmetic —
    ADVICE r10 upgraded Wald → Wilson)."""
    from go_zoom_kinesis_spark.operators.dedup import RECALL_AUDIT_MOD

    [row] = Q["lsh_recall_audit"](spark, sf_dir).collect()
    assert row["doc_sample_rate_ppm"] == 1_000_000 // RECALL_AUDIT_MOD
    for n_col, ci_col in (
        ("n_true_pairs", "recall_ci95_ppm"),
        ("n_lsh_candidates", "precision_ci95_ppm"),
    ):
        n = row[n_col]
        if n > 0:
            want = _wilson_ppm(row["n_hits"], n)
            assert row[ci_col] == pytest.approx(want, abs=1e-6), ci_col
            # Wilson never degenerates: a 0%- or 100%-rate sample must
            # still report strictly positive uncertainty
            assert row[ci_col] > 0
        else:
            assert row[ci_col] is None


def test_wilson_half_width_positive_at_boundary():
    """The ADVICE r10 defect, pinned: at p = 0 or 1 the Wald form
    reports 0; the shipped Wilson form must not."""
    for hits, n in ((0, 7), (7, 7), (0, 1), (1, 1), (500, 500)):
        hw = _wilson_ppm(hits, n)
        assert hw > 0, (hits, n)
        # and it shrinks with n at the boundary (~z²/2n for large n)
    assert _wilson_ppm(500, 500) < _wilson_ppm(7, 7)


# --- interval_concurrency_peak: sort-free decomposition referee ----------


def _write_events(spark, tmp_path, stamps):
    """Plant an events table from (event_type, epoch_seconds) pairs."""
    import datetime as dt

    rows = [
        (
            i,
            dt.datetime.utcfromtimestamp(s),
            i % 7,
            t,
            float(i),
            "{}",
        )
        for i, (t, s) in enumerate(stamps)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "planted")
    df.coalesce(1).write.mode("overwrite").parquet(out + "/events.parquet")
    return out


def _brute_peak(stamps, active_sec=600):
    """Row-at-a-time sweep truth: max after-value of the ±1 tape."""
    from collections import defaultdict

    by_type = defaultdict(list)
    for t, s in stamps:
        by_type[t].append(s)
    out = {}
    for t, ss in by_type.items():
        deltas = defaultdict(int)
        for s in ss:
            deltas[s] += 1
            deltas[s + active_sec] -= 1
        run = peak = 0
        for s in sorted(deltas):
            run += deltas[s]
            peak = max(peak, run)
        out[t] = (peak, len(ss))
    return out


def test_concurrency_peak_planted_adversarial(spark, tmp_path):
    """The cases that defeat a naive minute-grain net reduction:
    an intra-minute start/end/start/end interleave whose peak lives
    strictly inside the bucket, same-second collisions (combined
    deltas), cross-minute boundary offsets, and a burst in the first
    10 minutes (no tail minute exists)."""
    base = 1_000_000_000  # epoch seconds, minute-aligned enough
    stamps = []
    # intra-minute interleave: starts at :10 and :30 of minute B+10,
    # with ends (starts 600s earlier) landing at :20 and :40 — the
    # running count inside that minute goes 1,0,1,0 on top of entry
    m0 = base - base % 60
    stamps += [("intra", m0 + 20 - 600), ("intra", m0 + 40 - 600)]
    stamps += [("intra", m0 + 10), ("intra", m0 + 30)]
    # same-second collision: 5 starts on one stamp + an end on it
    stamps += [("collide", m0 + 7 - 600)]
    stamps += [("collide", m0 + 7)] * 5
    # boundary offsets 0 and 59, plus a start exactly 600 s after
    # another (end-before-start tie: must NOT stack)
    stamps += [("edge", m0), ("edge", m0 + 59), ("edge", m0 + 600)]
    # first-10-minutes burst (M-10 has no rows at all)
    stamps += [("early", 300), ("early", 301), ("early", 302)]
    # dense random-ish spread to shake out generic mistakes
    x = 12345
    for i in range(400):
        x = (1103515245 * x + 12345) % (1 << 31)
        stamps.append(("spread", base + x % 7200))
    sf = _write_events(spark, tmp_path, stamps)
    truth = _brute_peak(stamps)
    got = {
        r.event_type: (r.peak_concurrent, r.n_intervals)
        for r in Q["interval_concurrency_peak"](spark, sf).collect()
    }
    assert got == truth
    # sanity on the planted intent: the intra-minute peak (3 = entry
    # value 2 + the new start before its predecessor's end) strictly
    # exceeds both minute-boundary values (2 entering, 2 leaving) —
    # exactly the shape a pure minute-grain net reduction would lose
    assert truth["intra"][0] == 3


def test_concurrency_peak_windows_partitioned(spark, sf_dir):
    """r10 plan pin (post-reversion): the kept two-phase sweep may use
    windows, but every one must carry a partition key (event_type) —
    no empty-partition global sort — no shrinking frames, and no
    cartesian. (The fully sort-free minute decomposition measured
    SLOWER at span-sf100 — 154 s vs 33 s — and was reverted; see the
    operator docstring's r10 negative-result note.)"""
    import re

    import __spark_entry__ as entrymod

    df = entrymod.queries()["interval_concurrency_peak"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "AND UNBOUNDED FOLLOWING" not in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the two-phase windows in the plan"
    for spec in specs:
        assert "event_type#" in spec, "unpartitioned window: " + spec


def test_entity_resolution_joinback_not_broadcast(spark, sf_dir):
    """The canonical-name join-back must stay a shuffled join: at the
    sf100 decade the optimizer's post-filter estimate flipped it to a
    ~0.5 GB broadcast that GC-thrashed the driver (measured failure,
    .scratch/dec_r10_er4.log). Pinned via join hint; assert it held."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["entity_resolution_pipeline"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
