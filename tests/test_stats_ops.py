"""Independent referees for the corpus-statistics module
(``operators/stats.py``): each operator is recomputed sequentially in
plain Python (pandas/Counter/math) from the raw parquet — no SQL
engine on the referee side — and the distributed result must agree.
Engine-vs-engine agreement is separately covered by the oracle sweep
(``tests/test_oracle_parity.py`` picks up the ORACLE dict).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from go_zoom_kinesis_spark.operators.stats import (
    _LEN_THRESHOLD,
    diversity_index_audit,
    filter_agreement_kappa,
    gini_doclen_concentration,
    target_encoding_loo,
    zipf_slope_fit,
)


@pytest.fixture(scope="module")
def docs_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_target_encoding_loo_matches_pandas(spark, sf_dir, docs_pd):
    got = {
        r["doc_id"]: r["loo_mean_chars"]
        for r in target_encoding_loo(spark, sf_dir).collect()
    }
    grp = docs_pd.groupby("source")["n_chars"].agg(["sum", "count"])
    for row in docs_pd.itertuples():
        s, c = grp.loc[row.source, "sum"], grp.loc[row.source, "count"]
        want = (s - row.n_chars) / (c - 1) if c > 1 else None
        if want is None:
            assert got[row.doc_id] is None
        else:
            assert got[row.doc_id] == pytest.approx(want, rel=1e-12)
    assert len(got) == len(docs_pd)


def _gini(values: list[int]) -> float:
    xs = sorted(values)
    n = len(xs)
    total = sum(xs)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    return num / (n * total)


def test_gini_matches_sequential_definition(spark, sf_dir, docs_pd):
    got = {
        r["lang"]: r for r in gini_doclen_concentration(spark, sf_dir).collect()
    }
    for lang, sub in docs_pd.groupby("lang"):
        vals = sub["n_chars"].tolist()
        row = got[lang]
        assert row["n_docs"] == len(vals)
        assert row["total_chars"] == sum(vals)
        assert row["gini"] == pytest.approx(_gini(vals), rel=1e-12)
        assert 0.0 <= row["gini"] < 1.0


def test_zipf_fit_matches_numpy_least_squares(spark, sf_dir, docs_pd):
    import numpy as np

    counts = Counter(
        t
        for text in docs_pd["text"]
        for t in text.lower().split(" ")
        if t
    )
    coc = Counter(counts.values())
    # rank(f) = number of tokens with frequency >= f
    xs, ys = [], []
    cum = 0
    for f in sorted(coc, reverse=True):
        cum += coc[f]
        xs.append(math.log(cum))
        ys.append(math.log(f))
    slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)
    row = zipf_slope_fit(spark, sf_dir).collect()[0]
    assert row["n_points"] == len(xs)
    # operator rounds ln-derived outputs to 4dp (cross-engine ln rule)
    assert row["zipf_slope"] == pytest.approx(slope, abs=5.1e-5)
    assert row["zipf_intercept"] == pytest.approx(intercept, abs=5.1e-5)
    assert row["zipf_slope"] < 0  # frequency falls with rank
    assert 0.0 <= row["fit_r2"] <= 1.0


def test_diversity_indices_match_definitions(spark, sf_dir, docs_pd):
    got = {
        r["lang"]: r for r in diversity_index_audit(spark, sf_dir).collect()
    }
    for lang, sub in docs_pd.groupby("lang"):
        cnts = Counter(sub["source"]).values()
        n = sum(cnts)
        row = got[lang]
        assert row["n_docs"] == n
        assert row["n_sources"] == len(cnts)
        simpson = sum(c * (c - 1) for c in cnts) / (n * (n - 1))
        shannon = -sum((c / n) * math.log(c / n) for c in cnts)
        assert row["simpson"] == pytest.approx(simpson, rel=1e-12)
        # operator rounds shannon to 4dp (cross-engine ln rule)
        assert row["shannon"] == pytest.approx(shannon, abs=5.1e-5)


def test_kappa_matches_sequential_contingency(spark, sf_dir, docs_pd):
    got = {
        r["lang"]: r for r in filter_agreement_kappa(spark, sf_dir).collect()
    }
    for lang, sub in docs_pd.groupby("lang"):
        n11 = n10 = n01 = n00 = 0
        for row in sub.itertuples():
            a = row.n_chars >= _LEN_THRESHOLD
            toks = row.text.lower().split(" ")
            b = len(set(toks)) * 2 >= len(toks)
            if a and b:
                n11 += 1
            elif a:
                n10 += 1
            elif b:
                n01 += 1
            else:
                n00 += 1
        n = n11 + n10 + n01 + n00
        r = got[lang]
        assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (n11, n10, n01, n00)
        po = (n11 + n00) / n
        pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
        assert r["po"] == pytest.approx(po, rel=1e-12)
        assert r["pe"] == pytest.approx(pe, rel=1e-12)
        if pe != 1:
            kappa = (po - pe) / (1 - pe)
            assert r["kappa"] == pytest.approx(kappa, rel=1e-9)
        # kappa bounded: [-1, 1]
        if r["kappa"] is not None:
            assert -1.0 <= r["kappa"] <= 1.0


# ---- batch 2: split / l-diversity / quantile normalization ----


def test_stratified_split_exact_quotas_and_order(spark, sf_dir, docs_pd):
    import hashlib

    from go_zoom_kinesis_spark.operators.sampling import (
        stratified_split_exact,
    )

    got = {
        r["doc_id"]: r["split"]
        for r in stratified_split_exact(spark, sf_dir).collect()
    }
    assert len(got) == len(docs_pd)
    for lang, sub in docs_pd.groupby("lang"):
        ids = sorted(
            sub["doc_id"],
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        n = len(ids)
        train_q = (8 * n + 9) // 10
        val_q = (n + 9) // 10
        want = (
            ["train"] * train_q
            + ["val"] * min(val_q, n - train_q)
            + ["test"] * max(0, n - train_q - val_q)
        )
        assert [got[i] for i in ids] == want


def test_l_diversity_referee(spark, sf_dir, docs_pd):
    from go_zoom_kinesis_spark.operators.privacy import (
        K_MIN,
        L_MIN,
        l_diversity_audit,
    )

    rows = l_diversity_audit(spark, sf_dir).collect()
    got = {(r["lang"], r["len_bucket"]): r for r in rows}
    ref = docs_pd.assign(len_bucket=docs_pd["n_chars"] // 100).groupby(
        ["lang", "len_bucket"]
    )["source"]
    agg = ref.agg(["count", "nunique"])
    assert len(got) == len(agg)
    for (lang, lb), row in agg.iterrows():
        r = got[(lang, lb)]
        assert r["k_size"] == row["count"]
        assert r["l_sources"] == row["nunique"]
        assert r["at_risk"] == int(
            row["count"] < K_MIN or row["nunique"] < L_MIN
        )


def _qn_referee(pairs):
    """Sequential quantile normalization over (group, value) pairs."""
    from collections import Counter, defaultdict

    by_g = defaultdict(Counter)
    glob = Counter()
    for g, v in pairs:
        by_g[g][v] += 1
        glob[v] += 1
    gvals = sorted(glob)
    N = sum(glob.values())
    gcum = {}
    run = 0
    for v in gvals:
        run += glob[v]
        gcum[v] = run
    out = {}
    for g, cnt in by_g.items():
        n_g = sum(cnt.values())
        run = 0
        for v in sorted(cnt):
            run += cnt[v]
            # smallest global value with gcum/N >= run/n_g (exact ints)
            norm = next(x for x in gvals if gcum[x] * n_g >= run * N)
            out[(g, v)] = (run / n_g, norm)
    return out


def test_quantile_normalize_matches_referee(spark, sf_dir, docs_pd):
    from go_zoom_kinesis_spark.operators.stats import (
        quantile_normalize_lengths,
    )

    rows = quantile_normalize_lengths(spark, sf_dir).collect()
    ref = _qn_referee(zip(docs_pd["lang"], docs_pd["n_chars"]))
    assert len(rows) == len(ref)
    for r in rows:
        q, norm = ref[(r["lang"], r["n_chars"])]
        assert r["q"] == pytest.approx(q, rel=1e-12)
        assert r["norm_n_chars"] == norm
    # per-group monotonicity: higher value -> >= normalized value
    for lang in docs_pd["lang"].unique():
        sub = sorted(
            (r["n_chars"], r["norm_n_chars"])
            for r in rows
            if r["lang"] == lang
        )
        norms = [n for _, n in sub]
        assert norms == sorted(norms)


def test_quantile_normalize_single_group_is_identity(spark):
    from go_zoom_kinesis_spark.operators.stats import quantile_normalize_over

    df = spark.createDataFrame(
        [("a", v) for v in [3, 5, 5, 9, 12, 12, 20]], "g string, v long"
    )
    rows = quantile_normalize_over(df, "g", "v").collect()
    for r in rows:
        assert r["norm_v"] == r["v"]


def test_quantile_normalize_domain_guard_buckets(spark):
    from go_zoom_kinesis_spark.operators.stats import (
        QN_BUCKETS,
        QN_DOMAIN_LIMIT,
        quantile_normalize_over,
    )

    n = QN_DOMAIN_LIMIT + 60_000
    df = (
        spark.range(n)
        .selectExpr(
            "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END AS g",
            # distinct-heavy values spread over a wide domain
            "id * 7 AS v",
        )
    )
    rows = quantile_normalize_over(df, "g", "v").collect()
    # bucketed path: far fewer distinct output values than raw domain
    assert 0 < len({r["v"] for r in rows}) <= 2 * QN_BUCKETS
    for g in ("x", "y"):
        sub = sorted((r["v"], r["norm_v"]) for r in rows if r["g"] == g)
        norms = [x for _, x in sub]
        assert norms == sorted(norms)
    # the guard is deterministic (exact min/max range, r7 advice): every
    # bucketed value sits on the lo + k*width grid the range implies
    lo, hi = 0, (n - 1) * 7
    width = max(1, (hi - lo + 1) // QN_BUCKETS)
    assert all((r["v"] - lo) % width == 0 for r in rows)


def test_group_kfold_no_source_spans_folds(spark, sf_dir, docs_pd):
    import hashlib

    from go_zoom_kinesis_spark.operators.sampling import (
        K_FOLDS,
        group_kfold_assign,
    )

    rows = {r["fold"]: r for r in group_kfold_assign(spark, sf_dir).collect()}

    def fold_of(source: str) -> int:
        return int(hashlib.md5(source.encode()).hexdigest()[:4], 16) % K_FOLDS

    ref = docs_pd.assign(fold=docs_pd["source"].map(fold_of))
    agg = ref.groupby("fold").agg(
        n_docs=("doc_id", "count"),
        n_sources=("source", "nunique"),
        total_chars=("n_chars", "sum"),
    )
    assert set(rows) == set(agg.index)
    N = len(docs_pd)
    for fold, row in agg.iterrows():
        r = rows[fold]
        assert r["n_docs"] == row["n_docs"]
        assert r["n_sources"] == row["n_sources"]
        assert r["total_chars"] == row["total_chars"]
        assert r["share_ppm"] == 1_000_000 * row["n_docs"] // N
    # leakage pin: a source's fold is a pure function of the source —
    # no source may contribute to two folds
    assert ref.groupby("source")["fold"].nunique().max() == 1
    # conservation: folds partition the corpus
    assert sum(r["n_docs"] for r in rows.values()) == N


def test_neyman_allocation_referee(spark, sf_dir, docs_pd):
    """Pure-Python Neyman referee: per-language (n, Σx, Σx²) from the
    raw parquet, weight = sqrt(n·Σx² − (Σx)²) quantized at 1e-4,
    integer base shares + largest-remainder leftover (ties lang asc) —
    the distributed allocation must agree row-for-row, the total must
    equal the budget exactly, and every stratum must sit within 1 of
    its real-valued Neyman share (the largest-remainder guarantee)."""
    from go_zoom_kinesis_spark.operators.sampling import (
        NEYMAN_BUDGET,
        sample_neyman_allocation,
    )

    g = docs_pd.groupby("lang")["n_chars"]
    per = {}
    for lang, s in g:
        n = len(s)
        s1 = int(s.sum())
        s2 = int((s.astype(object) ** 2).sum())
        w2 = n * s2 - s1 * s1
        wq = 0 if w2 <= 0 else int(round(math.sqrt(w2) * 10000))
        per[lang] = (n, wq, round(math.sqrt(max(w2, 0)) / n, 4))
    totw = sum(w for _, w, _ in per.values())
    base = {k: (NEYMAN_BUDGET * w) // totw for k, (_, w, _) in per.items()}
    rem = {k: (NEYMAN_BUDGET * w) % totw for k, (_, w, _) in per.items()}
    left = NEYMAN_BUDGET - sum(base.values())
    for k in sorted(per, key=lambda k: (-rem[k], k))[:left]:
        base[k] += 1

    got = {
        r["lang"]: r
        for r in sample_neyman_allocation(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for k, (n, wq, sd) in per.items():
        assert got[k]["n_stratum"] == n
        assert got[k]["w_scaled"] == wq
        assert got[k]["sd_chars"] == pytest.approx(sd, abs=1e-9)
        assert got[k]["n_alloc"] == base[k], k
    assert sum(r["n_alloc"] for r in got.values()) == NEYMAN_BUDGET
    # largest-remainder bound: |n_alloc - exact Neyman share| < 1
    for k, (_, wq, _) in per.items():
        exact = NEYMAN_BUDGET * wq / totw
        assert abs(got[k]["n_alloc"] - exact) < 1.0, k
