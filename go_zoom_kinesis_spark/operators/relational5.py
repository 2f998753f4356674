"""Dialect & API surface extensions (round 6b) — the remaining
engine-surface cells a reference user migrating real SQL/DataFrame
code would hit:

- ``nullsafe_join_audit``: NULL-safe equality join semantics
  (``eqNullSafe`` / SQL ``<=>`` vs ``IS NOT DISTINCT FROM``) — the
  join-key cell where ``=`` silently drops rows and ``<=>`` doesn't.
- ``transpose_priority_profile``: Spark 4's ``DataFrame.transpose``
  (measure rows ↔ key columns) — the profile-matrix flip every
  metrics dashboard performs.
- ``param_sql_identifier_topn``: parameterized SQL (named ``args``)
  with an ``IDENTIFIER(:t)`` table binding — injection-safe templated
  SQL, the API replacement for f-string table names.

North-star §2.2 scope (the reference is a Kinesis consumer with no
SQL dialect surface — /root/reference/src/processor.rs). Values stay
in exact-count space; pair products go through decimal(38,0) before
the final double cast (same overflow discipline as ``ts_cusum_shift``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table as _t

NULLSAFE_SENTINEL = "click"  # event_type folded to NULL for the audit
TOPN_NATIONS = 7


def nullsafe_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe join semantics audit: fold one event_type to NULL,
    then self-join the per-key count relation under ``=`` and under
    ``eqNullSafe`` (SQL ``<=>`` / ``IS NOT DISTINCT FROM``) and report
    both pair cardinalities — their difference is exactly (NULL-key
    rows)², the mass a plain equi-join silently drops.

    Scale: the join runs on the per-key COUNT relation (bounded by
    event-type cardinality), never on the fact table; pair products
    accumulate in decimal(38,0) — at 100 TB a per-key count squared
    overflows int64 — and only the final sums cast to double."""
    kc = (
        _t(spark, sf_dir, "events")
        .select(
            F.nullif(F.col("event_type"), F.lit(NULLSAFE_SENTINEL)).alias(
                "k"
            )
        )
        .groupBy("k")
        .agg(F.count("*").cast("decimal(38,0)").alias("c"))
    )
    a, b = kc.alias("a"), kc.alias("b")
    prod = (F.col("a.c") * F.col("b.c")).alias("p")
    eq = (
        a.join(b, F.col("a.k") == F.col("b.k"))
        .select(prod)
        .agg(F.coalesce(F.sum("p"), F.lit(0)).cast("double").alias("e"))
    )
    ns = (
        a.join(b, F.col("a.k").eqNullSafe(F.col("b.k")))
        .select(prod)
        .agg(F.coalesce(F.sum("p"), F.lit(0)).cast("double").alias("s"))
    )
    nn = kc.agg(
        F.coalesce(
            F.sum(F.when(F.col("k").isNull(), F.col("c"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n"),
        F.count("*").alias("n_keys"),
    )
    return (
        eq.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("e").alias("pairs_eq"),
            F.col("s").alias("pairs_nullsafe"),
            F.col("n").alias("n_null_rows"),
            "n_keys",
        )
    )


def transpose_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` surface: per-priority order metrics
    (count, integer-cent revenue, distinct customers) flipped so each
    measure becomes a ROW and each priority a COLUMN — the Spark-4 API
    for the profile-matrix flip (until 4.0 this required a manual
    unpivot + pivot round-trip).

    The transposed relation is (measures × priorities) — bounded by
    the priority DOMAIN (5 in TPC-H), so the flip is a driver-side
    reshape of an already-aggregated tiny relation, never of the fact
    table."""
    base = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("total_cents"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderpriority")
    )
    return base.transpose()


def param_sql_identifier_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL surface: named ``args`` binding for values
    AND an ``IDENTIFIER(:t)`` binding for the table name — the
    injection-safe replacement for f-string SQL templating. Top-N
    nations by open-order revenue, with the status filter, the table
    names and N all bound as parameters."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("gzk5_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("gzk5_customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("gzk5_nation")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               count(*) AS n_orders,
               sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM IDENTIFIER(:orders) o
        JOIN IDENTIFIER(:customer) c ON o.o_custkey = c.c_custkey
        JOIN IDENTIFIER(:nation) n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = :status
        GROUP BY n.n_name
        ORDER BY cents DESC, nation
        LIMIT :n
        """,
        args={
            "orders": "gzk5_orders",
            "customer": "gzk5_customer",
            "nation": "gzk5_nation",
            "status": "O",
            "n": TOPN_NATIONS,
        },
    )


SHARD_TOKENS = 2_000  # tokens per export shard
DOC_BUCKET = 1_024  # doc_id div width for the two-phase prefix sum


def export_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining export sharding: assign every document (in stable
    doc_id order) to the shard containing its first token — the
    "tokenize and shard" step that turns a curated corpus into
    fixed-size training files. Reports per-shard doc counts, token
    mass and doc-id ranges, so an export coordinator can hand shards
    to writers.

    The global running token offset is the two-phase distributed
    prefix-sum (``token_budget_plan`` / ``interval_concurrency_peak``
    pattern): phase 1 cumsums within (doc_id div {DOC_BUCKET}) value
    buckets — each sort bounded by one bucket; phase 2 prefix-sums the
    per-bucket totals on the tiny bucket relation and broadcasts the
    offsets. Shard ids derive by integer ``div`` (no double division —
    offsets exceed 2^53 at 100 TB), so the assignment is exact at any
    scale. No global sort anywhere; output is bounded by the shard
    count."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda x: x != ""
            )
        )
        .cast("bigint")
        .alias("tok"),
    )
    b = docs.withColumn("vb", F.expr(f"doc_id div {DOC_BUCKET}"))
    w_in = (
        Window.partitionBy("vb")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inner = b.withColumn("cum_in", F.sum("tok").over(w_in))
    totals = b.groupBy("vb").agg(F.sum("tok").alias("t"))
    w_off = Window.orderBy("vb").rowsBetween(
        Window.unboundedPreceding, -1
    )  # bucket relation only — bounded by the doc_id domain / width
    offsets = totals.select(
        "vb", F.coalesce(F.sum("t").over(w_off), F.lit(0)).alias("off")
    )
    assigned = (
        inner.join(F.broadcast(offsets), "vb")
        .withColumn(
            "start_off", F.col("off") + F.col("cum_in") - F.col("tok")
        )
        .withColumn("shard_id", F.expr(f"start_off div {SHARD_TOKENS}"))
    )
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


ASSOC_MIN_USERS = 5  # minimum pair support


def assoc_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over user event baskets (market-basket
    analytics): for every event-type pair, the co-occurrence support,
    both conditional confidences and the lift — flags behaviors that
    travel together (lift > 1) vs independent ones.

    Scale: baskets collapse to the DISTINCT (user, type) relation in
    one shuffle; the self-join fans out at most C(T,2) rows per user
    (bounded by the type DOMAIN, not event volume); type supports and
    the user total broadcast back. Ratios are correctly-rounded double
    division chains of exact counts — identical cross-engine."""
    b = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    n_users = b.agg(F.countDistinct("user_id").alias("n_users"))
    sup = b.groupBy("event_type").agg(F.count("*").alias("n"))
    l, r = b.alias("l"), b.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("l.event_type") < F.col("r.event_type")),
        )
        .groupBy(
            F.col("l.event_type").alias("type_a"),
            F.col("r.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= ASSOC_MIN_USERS)
    )
    sa = sup.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sup.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    out = (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
    )
    return out.select(
        "type_a",
        "type_b",
        "n_ab",
        "n_a",
        "n_b",
        F.round(F.col("n_ab").cast("double") / F.col("n_a"), 6).alias(
            "conf_ab6"
        ),
        F.round(F.col("n_ab").cast("double") / F.col("n_b"), 6).alias(
            "conf_ba6"
        ),
        F.round(
            (F.col("n_ab").cast("double") * F.col("n_users"))
            / (F.col("n_a").cast("double") * F.col("n_b")),
            6,
        ).alias("lift6"),
    )


BOOT_B = 32  # bootstrap replicas


def bootstrap_ci_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval on a corpus metric (mean document
    length) via coordination-free hash resampling: replica ``b`` draws
    each document with weight Binomial(2, 1/2) from two md5 bits of
    ``doc_id:b`` — mean 1, so each replica is a same-size resample —
    and the CI is read off the order statistics of the {BOOT_B}
    replica means (2nd smallest / 2nd largest ≈ 5%/95% at B=32).

    Determinism: replica means are one exact-integer division each;
    the CI is pure selection (no cross-replica double sums); the point
    estimate is the exact full-corpus division. The only window runs
    over the {BOOT_B}-row replica relation.

    Scale: one explode-by-{BOOT_B} pass over (doc_id, n_chars) — a
    2-column projection, not the text — then a {BOOT_B}-group
    aggregate. Weights are pure hash functions: any executor computes
    any replica without coordination (same property as
    ``epoch_shuffle_plan``)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    rep = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    w = (F.col("bucket") % 2) + (F.floor(F.col("bucket") / 2) % 2)
    means = (
        rep.withColumn("w", w.cast("bigint"))
        .groupBy("b")
        .agg(
            F.sum("w").alias("n_eff"),
            F.sum(F.col("w") * F.col("n_chars")).alias("s"),
        )
        .withColumn(
            "mean6",
            F.when(
                F.col("n_eff") > 0,
                F.round(F.col("s").cast("double") / F.col("n_eff"), 6),
            ),
        )
    )
    ordw = Window.orderBy(
        F.col("mean6").asc_nulls_last(), F.col("b").asc()
    )  # over the BOOT_B-row replica relation only
    ranked = means.withColumn("rk", F.row_number().over(ordw))
    lo = ranked.filter(F.col("rk") == 2).select(
        F.col("mean6").alias("ci_lo6")
    )
    hi = ranked.filter(F.col("rk") == BOOT_B - 1).select(
        F.col("mean6").alias("ci_hi6")
    )
    point = docs.agg(
        F.count("*").alias("n_docs"),
        F.when(
            F.count("*") > 0,
            F.round(
                F.sum("n_chars").cast("double") / F.count("*"), 6
            ),
        ).alias("point_mean6"),
        F.lit(BOOT_B).cast("int").alias("n_replicas"),
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_docs", "point_mean6", "ci_lo6", "ci_hi6", "n_replicas"
        )
    )


QUERIES = {
    "nullsafe_join_audit": nullsafe_join_audit,
    "transpose_priority_profile": transpose_priority_profile,
    "param_sql_identifier_topn": param_sql_identifier_topn,
    "export_shard_plan": export_shard_plan,
    "assoc_rules_events": assoc_rules_events,
    "bootstrap_ci_chars": bootstrap_ci_chars,
}

ORACLE = {
    "nullsafe_join_audit": f"""
        WITH kc AS (
            SELECT nullif(event_type, '{NULLSAFE_SENTINEL}') AS k,
                   CAST(count(*) AS DECIMAL(38,0)) AS c
            FROM events GROUP BY 1
        ),
        eq AS (
            SELECT CAST(coalesce(sum(a.c * b.c), 0) AS DOUBLE) AS e
            FROM kc a JOIN kc b ON a.k = b.k
        ),
        ns AS (
            SELECT CAST(coalesce(sum(a.c * b.c), 0) AS DOUBLE) AS s
            FROM kc a JOIN kc b ON a.k IS NOT DISTINCT FROM b.k
        ),
        nn AS (
            SELECT CAST(coalesce(sum(CASE WHEN k IS NULL THEN c END), 0)
                        AS BIGINT) AS n,
                   count(*) AS n_keys
            FROM kc
        )
        SELECT e AS pairs_eq, s AS pairs_nullsafe, n AS n_null_rows,
               n_keys
        FROM eq, ns, nn
    """,
    "transpose_priority_profile": """
        WITH base AS (
            SELECT o_orderpriority AS p,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents,
                   CAST(count(DISTINCT o_custkey) AS BIGINT)
                       AS n_customers
            FROM orders GROUP BY 1
        )
        SELECT m.key,
               max(CASE WHEN p = '1-URGENT' THEN v END) AS "1-URGENT",
               max(CASE WHEN p = '2-HIGH' THEN v END) AS "2-HIGH",
               max(CASE WHEN p = '3-MEDIUM' THEN v END) AS "3-MEDIUM",
               max(CASE WHEN p = '4-NOT SPECIFIED' THEN v END)
                   AS "4-NOT SPECIFIED",
               max(CASE WHEN p = '5-LOW' THEN v END) AS "5-LOW"
        FROM (
            SELECT p, 'n_orders' AS key, n_orders AS v FROM base
            UNION ALL
            SELECT p, 'total_cents', total_cents FROM base
            UNION ALL
            SELECT p, 'n_customers', n_customers FROM base
        ) m
        GROUP BY m.key
    """,
    "param_sql_identifier_topn": f"""
        SELECT n.n_name AS nation,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY n.n_name
        ORDER BY cents DESC, nation
        LIMIT {TOPN_NATIONS}
    """,
    "export_shard_plan": f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(list_filter(split(lower(text), ' '),
                                        x -> x <> '')) AS BIGINT) AS tok
            FROM documents
        ),
        cum AS (
            SELECT doc_id, tok,
                   coalesce(sum(tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS start_off
            FROM toks
        )
        SELECT CAST(start_off // {SHARD_TOKENS} AS BIGINT) AS shard_id,
               count(*) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM cum GROUP BY 1
    """,
}


ORACLE["assoc_rules_events"] = f"""
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    nu AS (SELECT count(DISTINCT user_id) AS n_users FROM b),
    sup AS (SELECT event_type, count(*) AS n FROM b GROUP BY 1),
    pairs AS (
        SELECT l.event_type AS type_a, r.event_type AS type_b,
               count(*) AS n_ab
        FROM b l JOIN b r ON l.user_id = r.user_id
                         AND l.event_type < r.event_type
        GROUP BY 1, 2
        HAVING count(*) >= {ASSOC_MIN_USERS}
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           sa.n AS n_a, sb.n AS n_b,
           round(CAST(p.n_ab AS DOUBLE) / sa.n, 6) AS conf_ab6,
           round(CAST(p.n_ab AS DOUBLE) / sb.n, 6) AS conf_ba6,
           round((CAST(p.n_ab AS DOUBLE) * nu.n_users)
                 / (CAST(sa.n AS DOUBLE) * sb.n), 6) AS lift6
    FROM pairs p
    JOIN sup sa ON p.type_a = sa.event_type
    JOIN sup sb ON p.type_b = sb.event_type
    CROSS JOIN nu
"""

ORACLE["bootstrap_ci_chars"] = f"""
    WITH rep AS (
        SELECT d.doc_id, d.n_chars, g.b,
               CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                    || CAST(g.b AS VARCHAR)), 1, 4)) AS INTEGER) AS bucket
        FROM documents d, (SELECT unnest(range({BOOT_B})) AS b) g
    ),
    means AS (
        SELECT b,
               CAST(sum(bucket % 2 + (bucket // 2) % 2) AS BIGINT)
                   AS n_eff,
               CAST(sum((bucket % 2 + (bucket // 2) % 2) * n_chars)
                    AS BIGINT) AS s
        FROM rep GROUP BY 1
    ),
    ranked AS (
        SELECT b,
               CASE WHEN n_eff > 0
                    THEN round(CAST(s AS DOUBLE) / n_eff, 6) END AS mean6,
               row_number() OVER (ORDER BY (CASE WHEN n_eff > 0
                    THEN round(CAST(s AS DOUBLE) / n_eff, 6) END)
                    ASC NULLS LAST, b ASC) AS rk
        FROM means
    ),
    lo AS (SELECT mean6 AS ci_lo6 FROM ranked WHERE rk = 2),
    hi AS (SELECT mean6 AS ci_hi6 FROM ranked WHERE rk = {BOOT_B - 1}),
    point AS (
        SELECT count(*) AS n_docs,
               CASE WHEN count(*) > 0 THEN
                   round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6)
               END AS point_mean6,
               CAST({BOOT_B} AS INT) AS n_replicas
        FROM documents
    )
    SELECT n_docs, point_mean6, ci_lo6, ci_hi6, n_replicas
    FROM point CROSS JOIN lo CROSS JOIN hi
"""
