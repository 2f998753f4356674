"""Invariant tests for the round-6 surface extensions (relational4) —
laws the value-hash oracle can't state, each recomputed by an
independent Python referee."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.relational4 import (
    TOKEN_BUDGET,
    TOPN_PER_NATION,
    cross_lingual_contamination,
    lateral_topn_customers,
    moments_mode_median,
    recursive_supplier_chain,
    token_budget_plan,
)


def test_lateral_topn_is_true_per_group_topn(spark, sf_dir):
    rows = lateral_topn_customers(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer").collect()
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    by_nation: dict = {}
    for c in cust:
        by_nation.setdefault(nation[c["c_nationkey"]], []).append(
            (-int(c["c_acctbal"] * 100 // 1), c["c_custkey"])
        )
    expect = set()
    for name, lst in by_nation.items():
        for neg_cents, key in sorted(lst)[:TOPN_PER_NATION]:
            expect.add((name, key, -neg_cents))
    got = {(r["nation"], r["custkey"], r["acct_cents"]) for r in rows}
    assert got == expect
    # per-nation cardinality bound
    from collections import Counter

    per = Counter(r["nation"] for r in rows)
    assert all(v <= TOPN_PER_NATION for v in per.values())


def test_recursive_chain_population_law(spark, sf_dir):
    """Total chain rows = Σ per supplier (bit_length(key) + 1), and the
    depth-0 frontier is exactly the supplier table."""
    rows = recursive_supplier_chain(spark, sf_dir).collect()
    keys = [
        r["s_suppkey"]
        for r in load_table(spark, sf_dir, "supplier").collect()
    ]
    by_depth = {r["depth"]: r for r in rows}
    assert by_depth[0]["n_nodes"] == len(keys)
    expect_total = sum(int(k).bit_length() + 1 for k in keys)
    assert sum(r["n_nodes"] for r in rows) == expect_total
    # frontier shrinks monotonically with depth (binary halving)
    depths = sorted(by_depth)
    assert depths == list(range(len(depths)))
    for a, b in zip(depths, depths[1:]):
        assert by_depth[b]["n_nodes"] <= by_depth[a]["n_nodes"]


def test_moments_mode_median_referee(spark, sf_dir):
    import statistics
    from collections import Counter

    rows = {r["event_type"]: r for r in moments_mode_median(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            int(r["value"] * 100 // 1)
        )
    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        r = rows[t]
        assert r["n_events"] == len(vals)
        counts = Counter(vals)
        best = max(counts.values())
        assert counts[r["mode_cents"]] == best
        assert r["mode_cents"] == min(v for v, c in counts.items() if c == best)
        svals = sorted(vals)
        assert r["median_cents"] == svals[(len(svals) + 1) // 2 - 1]
        if r["skew6"] is not None:
            mean = statistics.fmean(vals)
            m2 = statistics.fmean([(v - mean) ** 2 for v in vals])
            m3 = statistics.fmean([(v - mean) ** 3 for v in vals])
            assert abs(r["skew6"] - m3 / m2**1.5) < 1e-3


def test_token_budget_greedy_cut(spark, sf_dir):
    row = token_budget_plan(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "text"
    ).collect()
    toks = sorted(
        (
            (-d["n_chars"], d["doc_id"],
             len([w for w in d["text"].lower().split(" ") if w]))
            for d in docs
        )
    )
    cum, n_inc, used = 0, 0, 0
    for _, _, t in toks:
        cum += t
        if cum <= TOKEN_BUDGET:
            n_inc, used = n_inc + 1, cum
    assert row["n_included"] == n_inc
    assert row["tokens_used"] == used
    assert row["n_docs_total"] == len(docs)
    assert row["tokens_total"] == sum(t for _, _, t in toks)
    assert row["tokens_used"] <= TOKEN_BUDGET
    # greedy cut: the next curriculum doc would not have fit
    if n_inc < len(toks):
        assert used + toks[n_inc][2] > TOKEN_BUDGET


def test_cross_lingual_overlap_bounds(spark, sf_dir):
    rows = cross_lingual_contamination(spark, sf_dir).collect()
    langs = {
        r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("lang").distinct().collect()
    }
    n = len(langs)
    assert len(rows) <= n * (n - 1) // 2
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert 0 < r["n_shared"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["overlap6"] <= 1.0


def test_groupby_all_partitions_orders(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.relational4 import groupby_all_revenue

    rows = groupby_all_revenue(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    # grouping keys inferred correctly: (priority, year) pairs unique
    keys = [(r["priority"], r["order_year"]) for r in rows]
    assert len(keys) == len(set(keys))


def _try_expected(li, salt_mod, mul_const):
    """Python referee for the try_* null counts at a salt density."""
    lim = (2**63 - 1) // mul_const
    exp = {"n_rows": len(li), "parse": 0, "div": 0, "ovf": 0}
    for r in li:
        cents = int(r["l_extendedprice"] * 100 // 1)
        is_err = (cents + r["l_linenumber"]) % salt_mod == 0
        if is_err:
            exp["parse"] += 1
            exp["div"] += 1
            if cents > lim:
                exp["ovf"] += 1
    return exp


def test_try_functions_null_counts(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.relational4 import (
        TRY_MUL_CONST,
        TRY_SALT_MOD,
        try_functions_audit,
    )

    row = try_functions_audit(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linenumber", "l_extendedprice"
    ).collect()
    exp = _try_expected(li, TRY_SALT_MOD, TRY_MUL_CONST)
    assert row["n_rows"] == len(li)
    assert row["n_parse_fail"] == exp["parse"]
    assert row["n_div_null"] == exp["parse"]
    assert row["n_overflow"] == exp["ovf"]
    assert exp["parse"] > 0, "salt must actually trigger"
    # registered variant is production-shaped: ~1% error density
    assert exp["parse"] / len(li) < 0.05


def test_try_functions_dense_semantics_pin(spark, sf_dir):
    """The error-dense (~33%) variant the r1-r6 rounds benched: kept as
    a semantics pin against DuckDB (per-row exception unwinding makes
    it the wrong headline-bench citizen — r6 verdict — but the
    null-on-error contract at high error density is still worth
    pinning cross-engine)."""
    import duckdb

    from go_zoom_kinesis_spark.operators.relational4 import (
        TRY_SALT_MOD_DENSE,
        _try_functions_frame,
        try_functions_oracle_sql,
    )

    srow = _try_functions_frame(spark, sf_dir, TRY_SALT_MOD_DENSE).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    drow = con.execute(
        try_functions_oracle_sql(TRY_SALT_MOD_DENSE)
    ).fetchone()
    cols = ("n_rows", "n_parse_fail", "sum_parsed", "n_div_null",
            "sum_div_floor", "n_overflow")
    assert tuple(srow[c] for c in cols) == tuple(int(v) for v in drow)
    # the dense salt must actually be dense (≈1/3 of rows error out)
    assert srow["n_parse_fail"] / srow["n_rows"] > 0.2


def test_matryoshka_recall_bounds(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        matryoshka_truncation_audit,
    )

    rows = matryoshka_truncation_audit(spark, sf_dir).collect()
    assert {r["q_id"] for r in rows} == set(range(N_QUERIES))
    for r in rows:
        assert 0 <= r["n_overlap"] <= TOP_K
        assert abs(r["recall6"] - r["n_overlap"] / TOP_K) < 1e-9


def test_kcenter_frontier_referee(spark, sf_dir):
    import numpy as np

    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.operators.similarity import (
        KC_CENTERS,
        KC_FRONTIER,
        coreset_kcenter_step,
    )

    rows = coreset_kcenter_step(spark, sf_dir).collect()
    assert len(rows) == KC_FRONTIER
    dists = [r["min_dist6"] for r in rows]
    assert dists == sorted(dists, reverse=True)
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    cents = {k: v for k, v in emb.items() if k < KC_CENTERS}
    best = []
    for vid, v in emb.items():
        if vid < KC_CENTERS:
            continue
        nv = np.sqrt((v * v).sum())
        d = min(
            1.0 - float((v * c).sum()) / (nv * np.sqrt((c * c).sum()))
            for c in cents.values()
        )
        best.append((-d, vid))
    best.sort()
    exp = [(vid, -nd) for nd, vid in best[:KC_FRONTIER]]
    got = [(r["vec_id"], r["min_dist6"]) for r in rows]
    for (gv, gd), (ev, ed) in zip(got, exp):
        assert gv == ev
        assert abs(gd - ed) < 1e-5


def _py_tokens(text):
    return [w for w in text.lower().split(" ") if w]


def test_collocation_pmi_referee(spark, sf_dir):
    from collections import Counter

    from go_zoom_kinesis_spark.operators.relational4 import (
        MIN_COLLOC_COUNT,
        TOP_COLLOCATIONS,
        collocation_pmi_top,
    )

    rows = collocation_pmi_top(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    uni, bi = Counter(), Counter()
    for d in docs:
        t = _py_tokens(d["text"])
        uni.update(t)
        bi.update(f"{a} {b}" for a, b in zip(t, t[1:]))
    n_uni, n_bg = sum(uni.values()), sum(bi.values())
    cand = []
    for bg, c in bi.items():
        if c < MIN_COLLOC_COUNT:
            continue
        w1, w2 = bg.split(" ")
        lift = (c / n_bg) / ((uni[w1] / n_uni) * (uni[w2] / n_uni))
        cand.append((-lift, bg, c, uni[w1], uni[w2]))
    cand.sort()
    exp = cand[:TOP_COLLOCATIONS]
    assert len(rows) == min(TOP_COLLOCATIONS, len(exp))
    for r, (neg_lift, bg, c, c1, c2) in zip(rows, exp):
        assert r["bigram"] == bg
        assert (r["c_bg"], r["c1"], r["c2"]) == (c, c1, c2)
        assert abs(r["lift6"] - (-neg_lift)) < 1e-5
    # a collocation is over-represented vs independence only if lift>1;
    # the TOP of the list must be (boilerplate phrases repeat)
    assert rows[0]["lift6"] > 1.0


def _py_char_hash(s, p=2_147_483_647):
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % p
    return h


def test_duplicate_span_histogram_referee(spark, sf_dir):
    from collections import Counter

    from go_zoom_kinesis_spark.operators.relational4 import (
        SPAN_N,
        duplicate_span_audit,
    )

    rows = duplicate_span_audit(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    p = 2_147_483_647
    df = Counter()
    for d in docs:
        th = [_py_char_hash(t) for t in _py_tokens(d["text"])]
        spans = set()
        for i in range(len(th) - SPAN_N + 1):
            h = th[i]
            for x in th[i + 1 : i + SPAN_N]:
                h = (h * 31 + x) % p
            spans.add(h)
        df.update(spans)
    hist = Counter(df.values())
    got = {r["dup_df"]: r["n_spans"] for r in rows}
    assert got == dict(hist)
    # conservation: Σ df·n_spans = total distinct (doc, span) pairs
    assert sum(k * v for k, v in got.items()) == sum(df.values())


def test_vocab_growth_heaps_referee(spark, sf_dir):
    from go_zoom_kinesis_spark.operators.relational4 import (
        HEAPS_STEPS,
        vocab_growth_heaps,
    )

    rows = sorted(
        vocab_growth_heaps(spark, sf_dir).collect(),
        key=lambda r: r["checkpoint_pct"],
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    mx = max(d["doc_id"] for d in docs)
    assert len(rows) == HEAPS_STEPS
    prev = (0, 0, 0)
    for k, r in zip(range(1, HEAPS_STEPS + 1), rows):
        t = mx * k // HEAPS_STEPS
        sel = [d for d in docs if d["doc_id"] <= t]
        toks = [_py_tokens(d["text"]) for d in sel]
        exp = (
            len(sel),
            sum(len(ts) for ts in toks),
            len({w for ts in toks for w in ts}),
        )
        got = (r["n_docs"], r["n_tokens_cum"], r["vocab_cum"])
        assert got == exp
        # growth curves are monotone non-decreasing
        assert all(g >= pv for g, pv in zip(got, prev))
        prev = got
    # the 100% checkpoint covers the whole corpus
    assert rows[-1]["n_docs"] == len(docs)
