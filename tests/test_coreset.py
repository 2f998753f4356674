"""Gonzalez k-center coreset referee: a pure-Python replay of the
greedy trajectory with the SAME bit-level arithmetic (sequential-fold
dots, IEEE sqrt, selection-ordered min chain), plus the coverage-bound
invariant that makes the output a certificate.
"""

from __future__ import annotations

import math

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.similarity import (
    CORESET_K,
    coreset_kcenter_sample,
)


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _py_greedy(vectors):
    """vectors: {vec_id: (emb list of float64, norm)} → [(step, id, d)]"""
    ids = sorted(vectors)
    first = ids[0]
    out = [(0, first, 0.0)]
    sel = [first]
    # min-dist chain in SELECTION order, mirroring the chained least()
    dmin = {}
    for step in range(1, CORESET_K):
        c_emb, c_norm = vectors[sel[-1]]
        for v in ids:
            e, n = vectors[v]
            d = 1.0 - _dot(e, c_emb) / (n * c_norm)
            dmin[v] = d if step == 1 else min(dmin[v], d)
        cand = [v for v in ids if v not in sel]
        if not cand:
            break
        far = min(cand, key=lambda v: (-dmin[v], v))
        out.append((step, far, dmin[far]))
        sel.append(far)
    return out


def test_coreset_greedy_referee(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vectors = {}
    for r in rows:
        emb = [float(x) for x in r["embedding"]]
        vectors[int(r["vec_id"])] = (emb, math.sqrt(_dot(emb, emb)))
    expected = _py_greedy(vectors)
    got = sorted(
        (r["step"], r["center_vec_id"], r["radius"])
        for r in coreset_kcenter_sample(spark, sf_dir).collect()
    )
    assert [(s, i) for s, i, _ in got] == [(s, i) for s, i, _ in expected]
    for (_, _, g), (_, _, e) in zip(got, expected):
        assert g == e  # bit-exact radii


def test_coreset_radius_is_coverage_certificate(spark, sf_dir):
    """After all K centers, every vector's distance to its nearest
    center must be <= the LAST selection radius — the 2-approximation
    certificate the operator's docstring promises. Radii must also be
    non-increasing (greedy max-min always shrinks)."""
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vectors = {}
    for r in rows:
        emb = [float(x) for x in r["embedding"]]
        vectors[int(r["vec_id"])] = (emb, math.sqrt(_dot(emb, emb)))
    res = sorted(
        (r["step"], r["center_vec_id"], r["radius"])
        for r in coreset_kcenter_sample(spark, sf_dir).collect()
    )
    radii = [d for _, _, d in res[1:]]
    assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:]))
    centers = [vectors[i] for _, i, _ in res]
    last_radius = radii[-1]
    worst = 0.0
    for v, (e, n) in vectors.items():
        d = min(
            1.0 - _dot(e, ce) / (n * cn) for ce, cn in centers
        )
        worst = max(worst, d)
    assert worst <= last_radius + 1e-12
