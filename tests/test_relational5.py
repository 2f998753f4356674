"""Referee tests for the dialect & API surface trio (relational5)."""

from __future__ import annotations

from collections import Counter

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.operators.relational5 import (
    NULLSAFE_SENTINEL,
    TOPN_NATIONS,
    nullsafe_join_audit,
    param_sql_identifier_topn,
    transpose_priority_profile,
)


def test_nullsafe_join_law(spark, sf_dir):
    """<=> keeps exactly the NULL×NULL pair mass that = drops:
    pairs_nullsafe − pairs_eq = (NULL-key rows)²."""
    row = nullsafe_join_audit(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type").collect()
    counts = Counter(
        None if r["event_type"] == NULLSAFE_SENTINEL else r["event_type"]
        for r in ev
    )
    pairs_eq = sum(c * c for k, c in counts.items() if k is not None)
    pairs_ns = sum(c * c for c in counts.values())
    n_null = counts.get(None, 0)
    assert row["pairs_eq"] == float(pairs_eq)
    assert row["pairs_nullsafe"] == float(pairs_ns)
    assert row["n_null_rows"] == n_null
    assert row["n_keys"] == len(counts)
    assert row["pairs_nullsafe"] - row["pairs_eq"] == float(n_null * n_null)


def test_transpose_matrix_referee(spark, sf_dir):
    rows = {r["key"]: r for r in transpose_priority_profile(spark, sf_dir).collect()}
    assert set(rows) == {"n_orders", "total_cents", "n_customers"}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_custkey"
    ).collect()
    by_p: dict = {}
    for o in orders:
        by_p.setdefault(o["o_orderpriority"], []).append(o)
    for p, lst in by_p.items():
        assert rows["n_orders"][p] == len(lst)
        assert rows["total_cents"][p] == sum(
            int(o["o_totalprice"] * 100 // 1) for o in lst
        )
        assert rows["n_customers"][p] == len({o["o_custkey"] for o in lst})
    # every priority present in the data is a column of the flip
    cols = set(rows["n_orders"].asDict()) - {"key"}
    assert cols == set(by_p)


def test_param_sql_binding_equals_composed_query(spark, sf_dir):
    """The parameterized/IDENTIFIER form returns exactly what the
    directly-composed DataFrame query returns."""
    got = [
        (r["nation"], r["n_orders"], r["cents"])
        for r in param_sql_identifier_topn(spark, sf_dir).collect()
    ]
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ref = (
        o.filter(F.col("o_orderstatus") == "O")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )
        .orderBy(F.desc("cents"), F.asc("nation"))
        .limit(TOPN_NATIONS)
        .collect()
    )
    exp = [(r["nation"], r["n_orders"], r["cents"]) for r in ref]
    assert got == exp
    assert len(got) <= TOPN_NATIONS


def test_export_shard_plan_referee(spark, sf_dir):
    """Sequential referee: cumulative token offsets in doc_id order;
    a doc belongs to the shard containing its first token."""
    from go_zoom_kinesis_spark.operators.relational5 import (
        SHARD_TOKENS,
        export_shard_plan,
    )

    rows = {r["shard_id"]: r for r in export_shard_plan(spark, sf_dir).collect()}
    docs = sorted(
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    exp: dict = {}
    off = 0
    for d in docs:
        tok = len([w for w in d["text"].lower().split(" ") if w])
        sid = off // SHARD_TOKENS
        e = exp.setdefault(sid, [0, 0, d["doc_id"], d["doc_id"]])
        e[0] += 1
        e[1] += tok
        e[3] = d["doc_id"]
        off += tok
    assert set(rows) == set(exp)
    for sid, (n, t, fd, ld) in exp.items():
        r = rows[sid]
        assert (r["n_docs"], r["tokens"], r["first_doc"], r["last_doc"]) == (
            n, t, fd, ld,
        )
    # conservation: shard token masses partition the corpus
    assert sum(r["tokens"] for r in rows.values()) == off
    # every shard's doc-id range is disjoint and ordered by shard id
    sids = sorted(rows)
    for a, b in zip(sids, sids[1:]):
        assert rows[a]["last_doc"] < rows[b]["first_doc"]


def test_pq_codebook_referee(spark, sf_dir):
    """numpy referee: nearest-centroid assignment per subspace with
    (d2, cid) tie-break; counts and fixed-point SSE match exactly."""
    import numpy as np

    from go_zoom_kinesis_spark.operators.similarity import (
        PQ_FP,
        PQ_K,
        PQ_M,
        pq_codebook_audit,
    )

    rows = {(r["sub"], r["cid"]): r for r in pq_codebook_audit(spark, sf_dir).collect()}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    subd = len(next(iter(emb.values()))) // PQ_M
    exp: dict = {}
    for vid, v in emb.items():
        for m in range(PQ_M):
            sv = v[m * subd : (m + 1) * subd]
            best = min(
                (float(((sv - emb[c][m * subd : (m + 1) * subd]) ** 2).sum()), c)
                for c in range(PQ_K)
                if c in emb
            )
            e = exp.setdefault((m, best[1]), [0, 0])
            e[0] += 1
            e[1] += int(best[0] * PQ_FP // 1)
    assert set(rows) == set(exp)
    for k, (n, sse) in exp.items():
        r = rows[k]
        assert r["n_assigned"] == n
        # numpy's sum order differs from the sequential fold; the
        # fixed-point value can differ by 1 ulp-floor per row
        assert abs(r["sse_fp"] - sse) <= n
        assert abs(r["mse6"] - (r["sse_fp"] / PQ_FP) / n) < 1e-6
    # every vector lands in exactly one cell per subspace
    assert sum(r["n_assigned"] for r in rows.values()) == PQ_M * len(emb)


def test_assoc_rules_referee(spark, sf_dir):
    from itertools import combinations

    from go_zoom_kinesis_spark.operators.relational5 import (
        ASSOC_MIN_USERS,
        assoc_rules_events,
    )

    rows = {
        (r["type_a"], r["type_b"]): r
        for r in assoc_rules_events(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).collect()
    baskets: dict = {}
    for r in ev:
        baskets.setdefault(r["user_id"], set()).add(r["event_type"])
    n_users = len(baskets)
    sup: Counter = Counter()
    pair: Counter = Counter()
    for types in baskets.values():
        sup.update(types)
        pair.update(combinations(sorted(types), 2))
    exp = {p: c for p, c in pair.items() if c >= ASSOC_MIN_USERS}
    assert set(rows) == set(exp)
    for (a, b), c in exp.items():
        r = rows[(a, b)]
        assert (r["n_ab"], r["n_a"], r["n_b"]) == (c, sup[a], sup[b])
        assert abs(r["conf_ab6"] - c / sup[a]) < 1e-6
        assert abs(r["conf_ba6"] - c / sup[b]) < 1e-6
        assert abs(r["lift6"] - (c * n_users) / (sup[a] * sup[b])) < 1e-6
        # support bounds: a pair can't co-occur more than either side
        assert c <= min(sup[a], sup[b]) <= n_users


def test_bootstrap_ci_referee(spark, sf_dir):
    import hashlib

    from go_zoom_kinesis_spark.operators.relational5 import (
        BOOT_B,
        bootstrap_ci_chars,
    )

    row = bootstrap_ci_chars(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    means = []
    for b in range(BOOT_B):
        n_eff = s = 0
        for d in docs:
            h = int(
                hashlib.md5(f"{d['doc_id']}:{b}".encode()).hexdigest()[:4],
                16,
            )
            w = (h % 2) + ((h // 2) % 2)
            n_eff += w
            s += w * d["n_chars"]
        means.append(round(s / n_eff, 6) if n_eff else None)
    ordered = sorted(m for m in means if m is not None)
    assert row["n_docs"] == len(docs)
    assert row["n_replicas"] == BOOT_B
    assert abs(
        row["point_mean6"] - sum(d["n_chars"] for d in docs) / len(docs)
    ) < 1e-5
    assert row["ci_lo6"] == ordered[1]
    assert row["ci_hi6"] == ordered[BOOT_B - 2]
    # the CI brackets the point estimate and is properly ordered
    assert row["ci_lo6"] <= row["ci_hi6"]
    assert row["ci_lo6"] <= row["point_mean6"] <= row["ci_hi6"]


def test_ivf_pq_adc_referee(spark, sf_dir):
    """Sequential numpy referee for the full IVF-PQ serving path:
    PQ-encode, coarse-assign, probe nprobe cells, ADC-sum fixed-point
    LUT entries, top-k with (adc, vec_id) tie-break. Also pins the ANN
    contract: every reported candidate lives in a probed cell."""
    import numpy as np

    from go_zoom_kinesis_spark.operators.similarity import (
        ADC_QUERIES,
        ADC_TOP_K,
        IVF_CENTROIDS,
        IVF_NPROBE,
        PQ_FP,
        PQ_K,
        PQ_M,
        ivf_pq_adc_topk,
    )

    got = [
        (r["q_id"], r["rk"], r["vec_id"], r["adc_fp"])
        for r in ivf_pq_adc_topk(spark, sf_dir).collect()
    ]
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    dim = len(next(iter(emb.values())))
    subd = dim // PQ_M

    def seq_d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    codes = {
        (vid, m): min(
            (seq_d2(v[m * subd:(m + 1) * subd],
                    emb[c][m * subd:(m + 1) * subd]), c)
            for c in range(PQ_K) if c in emb
        )[1]
        for vid, v in emb.items() for m in range(PQ_M)
    }
    cells = {
        vid: min((seq_d2(v, emb[c]), c)
                 for c in range(IVF_CENTROIDS) if c in emb)[1]
        for vid, v in emb.items()
    }
    expected = []
    for q in range(ADC_QUERIES):
        if q not in emb:
            continue
        probed = [
            c for _, c in sorted(
                (seq_d2(emb[q], emb[c]), c)
                for c in range(IVF_CENTROIDS) if c in emb
            )[:IVF_NPROBE]
        ]
        lut = {
            (m, c): int(np.floor(
                seq_d2(emb[q][m * subd:(m + 1) * subd],
                       emb[c][m * subd:(m + 1) * subd]) * PQ_FP))
            for m in range(PQ_M) for c in range(PQ_K) if c in emb
        }
        cand = [
            v for v in emb
            if v != q and cells[v] in probed
        ]
        scored = sorted(
            (sum(lut[(m, codes[(v, m)])] for m in range(PQ_M)), v)
            for v in cand
        )
        for rk, (adc, v) in enumerate(scored[:ADC_TOP_K], start=1):
            expected.append((q, rk, v, adc))
    assert sorted(got) == sorted(expected)
    # ANN contract: reported neighbors come only from probed cells
    for q, _, v, _ in got:
        probed = [
            c for _, c in sorted(
                (seq_d2(emb[q], emb[c]), c)
                for c in range(IVF_CENTROIDS) if c in emb
            )[:IVF_NPROBE]
        ]
        assert cells[v] in probed
