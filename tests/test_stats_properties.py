"""Hypothesis properties for the corpus-statistics algebra: the
closed forms the distributed operators rely on must agree with naive
sequential definitions on arbitrary inputs — histogram tie-blocks,
contingency-table kappa, and the exact-integer quantile-normalize
comparison. Pure Python (no Spark session): these pin the MATH; the
Spark plumbing is referee-tested in test_stats_ops.py.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_stats_ops import _gini, _qn_referee


@settings(max_examples=200, deadline=None)
@given(
    hist=st.lists(
        st.tuples(st.integers(1, 50), st.integers(1, 6)),
        min_size=1,
        max_size=12,
    )
)
def test_gini_tie_block_closed_form_matches_naive(hist):
    """x·c·(2f + c − n) summed over histogram groups == the sorted
    per-element definition Σ(2i−n−1)x — for ANY multiset, including
    heavy ties (the closed form is what gini_doclen_concentration
    distributes)."""
    # collapse duplicate values like a groupBy would
    agg: dict[int, int] = {}
    for v, c in hist:
        agg[v] = agg.get(v, 0) + c
    n = sum(agg.values())
    total = sum(v * c for v, c in agg.items())
    f = 0
    num = 0
    for v in sorted(agg):
        c = agg[v]
        num += v * c * (2 * f + c - n)
        f += c
    expanded = [v for v, c in agg.items() for _ in range(c)]
    assert num / (n * total) == _gini(expanded)
    assert 0 <= num / (n * total) < 1


@settings(max_examples=200, deadline=None)
@given(
    n11=st.integers(0, 40),
    n10=st.integers(0, 40),
    n01=st.integers(0, 40),
    n00=st.integers(0, 40),
)
def test_kappa_integer_algebra_matches_po_pe_form(n11, n10, n01, n00):
    """The single-division integer form
    (N·agree − pe_num) / (N² − pe_num) equals (po−pe)/(1−pe) and is
    bounded in [−1, 1] whenever defined."""
    n = n11 + n10 + n01 + n00
    if n == 0:
        return
    agree = n11 + n00
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    denom = n * n - pe_num
    if denom == 0:
        return
    kappa = (n * agree - pe_num) / denom
    po = agree / n
    pe = pe_num / (n * n)
    assert abs(kappa - (po - pe) / (1 - pe)) < 1e-12
    assert -1.0 - 1e-12 <= kappa <= 1.0 + 1e-12


@settings(max_examples=200, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_quantile_normalize_referee_laws(pairs):
    """For any grouped multiset: every normalized value is drawn from
    the global value set; per-group normalization is monotone; the
    maximum of each group maps to a value with global CDF 1 (the
    global maximum); and a single-group input is a fixed point."""
    out = _qn_referee(pairs)
    gvals = sorted({v for _, v in pairs})
    for (g, v), (q, norm) in out.items():
        assert norm in gvals
        assert 0 < q <= 1
    for g in {g for g, _ in pairs}:
        items = sorted(
            (v, norm) for (gg, v), (_, norm) in out.items() if gg == g
        )
        norms = [norm for _, norm in items]
        assert norms == sorted(norms)
        assert norms[-1] == gvals[-1]  # group max -> global max
    single = _qn_referee([("z", v) for _, v in pairs])
    for (_, v), (_, norm) in single.items():
        assert norm == v
