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
    from go_zoom_kinesis_spark.operators.search import _min_label_propagate

    edges = _chain_edges(spark, 8)
    with pytest.raises(RuntimeError, match="still changing"):
        _min_label_propagate(edges, _init_labels(edges), max_iters=1)


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
