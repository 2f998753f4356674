"""PII detection / redaction over ``documents`` — the privacy-scrub
stage of a pretraining-data pipeline (run before dedup so redacted
text dedups consistently).

The synthetic corpus contains no real PII, so each query first
*injects* deterministic PII spans derived from ``doc_id`` (identical
CASE logic on both engines), then detects and scrubs them. That keeps
the operator's regex machinery fully exercised with non-trivial,
verifiable counts. Patterns stay inside the Java-regex ∩ RE2 common
subset (character classes, bounded quantifiers, ``\\b``) so Spark and
the DuckDB oracle tokenize identically.

Scale: one projection pass, zero shuffles for the per-doc scrub and a
single hash-aggregate for the rollup; regex work is per-row JVM
codegen — the shape survives 100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\b555-[0-9]{4}\\b"
IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + injected PII: every doc gets an email, even doc_ids
    a phone, doc_id % 3 == 0 an IPv4."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.concat(F.lit(" u"), did.cast("string"), F.lit("@example.com"))
    phone = F.when(
        did % 2 == 0,
        F.concat(F.lit(" 555-"), F.lpad((did % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 3 == 0,
        F.concat(F.lit(" 10.0."), (did % 256).cast("string"), F.lit(".7")),
    ).otherwise(F.lit(""))
    return docs.withColumn(
        "aug_text", F.concat(F.col("text"), email, phone, ip)
    )


def _n_matches(col: str, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.col(col), F.lit(pattern), 0))


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub: count each PII class, then redact in a
    fixed order (email → phone → ip) and emit the md5 of the redacted
    text as the verifiable content witness."""
    aug = _augmented(spark, sf_dir)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug_text"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IP_RE,
        "<IP>",
    )
    return aug.select(
        "doc_id",
        "source",
        _n_matches("aug_text", EMAIL_RE).alias("n_emails"),
        _n_matches("aug_text", PHONE_RE).alias("n_phones"),
        _n_matches("aug_text", IP_RE).alias("n_ips"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


def pii_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII prevalence rollup: total spans per class and the
    fraction of documents carrying ≥2 PII classes (int/int ratio —
    bit-identical doubles on both engines)."""
    aug = _augmented(spark, sf_dir)
    per_doc = aug.select(
        "source",
        _n_matches("aug_text", EMAIL_RE).alias("n_emails"),
        _n_matches("aug_text", PHONE_RE).alias("n_phones"),
        _n_matches("aug_text", IP_RE).alias("n_ips"),
    )
    multi = (
        (F.col("n_emails") > 0).cast("int")
        + (F.col("n_phones") > 0).cast("int")
        + (F.col("n_ips") > 0).cast("int")
        >= 2
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
        F.sum("n_ips").alias("total_ips"),
        (
            F.count(F.when(multi, 1)).cast("double") / F.count("*")
        ).alias("multi_pii_frac"),
    )


ERASE_MOD = 97  # deterministic right-to-be-forgotten request set


def erasure_impact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR/CCPA erasure dry-run: with the deletion set defined as
    every ``user_id ≡ 0 (mod 97)``, report — per event type — how many
    rows and how much value the erasure removes, and the removal share
    in integer ppm. One conditional-aggregation scan, no join: the
    membership test is a pure expression, so at 100 TB this is a
    single map-side-combining pass (a real request list would arrive
    as a broadcast hash set with identical plan shape).
    """
    ev = load_table(spark, sf_dir, "events")
    erase = F.col("user_id") % ERASE_MOD == 0
    cents = F.floor(F.col("value") * 100).cast("bigint")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(erase.cast("bigint")).alias("n_erased"),
        F.sum(cents).alias("total_cents"),
        F.sum(F.when(erase, cents).otherwise(0)).alias("erased_cents"),
        F.countDistinct(F.when(erase, F.col("user_id"))).alias(
            "n_users_erased"
        ),
    )
    return agg.select(
        "event_type",
        "n_rows",
        "n_erased",
        "total_cents",
        "erased_cents",
        "n_users_erased",
        F.expr("1000000 * n_erased div n_rows").alias("erased_ppm"),
    )


K_MIN = 3  # k-anonymity floor for the release audit
L_MIN = 2  # l-diversity floor (distinct sensitive values per group)


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity release audit, the companion to k-anonymity: for
    each quasi-identifier group (lang × 100-char length bucket),
    report group size k, the number of DISTINCT sensitive values
    (``source``) l, and an at-risk flag (k < 3 or l < 2 — a group
    whose members all share one source leaks it even when k holds).

    One groupBy over bounded quasi-identifier space; the distinct
    count is per-group exact (source domain is small by construction;
    a wide sensitive domain would swap in approx_count_distinct with
    the same plan shape). Map-side combine, zero joins — 100 TB safe.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(
        "lang", F.expr("n_chars div 100").alias("len_bucket")
    ).agg(
        F.count(F.lit(1)).alias("k_size"),
        F.countDistinct("source").alias("l_sources"),
    )
    return g.select(
        "lang",
        "len_bucket",
        "k_size",
        "l_sources",
        (
            (F.col("k_size") < K_MIN) | (F.col("l_sources") < L_MIN)
        ).cast("bigint").alias("at_risk"),
    )


QUERIES = {
    "pii_scrub": pii_scrub,
    "pii_summary": pii_summary,
    "erasure_impact_audit": erasure_impact_audit,
    "l_diversity_audit": l_diversity_audit,
}

# DuckDB mirrors. Injection CASE logic and regexes are character-for-
# character the Spark expressions above.
_AUG_SQL = """
    SELECT *,
           text
           || concat(' u', CAST(doc_id AS VARCHAR), '@example.com')
           || CASE WHEN doc_id % 2 = 0
                   THEN concat(' 555-',
                        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                   ELSE '' END
           || CASE WHEN doc_id % 3 = 0
                   THEN concat(' 10.0.',
                        CAST(doc_id % 256 AS VARCHAR), '.7')
                   ELSE '' END
           AS aug_text
    FROM documents
"""

_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(aug_text, "
    f"'{EMAIL_RE}', '<EMAIL>', 'g'), "
    f"'{PHONE_RE}', '<PHONE>', 'g'), "
    f"'{IP_RE}', '<IP>', 'g')"
)

ORACLE = {
    "pii_scrub": f"""
        WITH aug AS ({_AUG_SQL})
        SELECT doc_id, source,
               len(regexp_extract_all(aug_text, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(aug_text, '{PHONE_RE}')) AS n_phones,
               len(regexp_extract_all(aug_text, '{IP_RE}')) AS n_ips,
               length({_REDACT_SQL}) AS redacted_len,
               md5({_REDACT_SQL}) AS redacted_md5
        FROM aug
    """,
    "pii_summary": f"""
        WITH aug AS ({_AUG_SQL}),
        per_doc AS (
            SELECT source,
                   len(regexp_extract_all(aug_text, '{EMAIL_RE}')) AS n_emails,
                   len(regexp_extract_all(aug_text, '{PHONE_RE}')) AS n_phones,
                   len(regexp_extract_all(aug_text, '{IP_RE}')) AS n_ips
            FROM aug
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_emails) AS BIGINT) AS total_emails,
               CAST(sum(n_phones) AS BIGINT) AS total_phones,
               CAST(sum(n_ips) AS BIGINT) AS total_ips,
               CAST(count(*) FILTER (WHERE
                   (CASE WHEN n_emails > 0 THEN 1 ELSE 0 END
                    + CASE WHEN n_phones > 0 THEN 1 ELSE 0 END
                    + CASE WHEN n_ips > 0 THEN 1 ELSE 0 END) >= 2)
                   AS DOUBLE) / count(*) AS multi_pii_frac
        FROM per_doc GROUP BY source
    """,
}

ORACLE["erasure_impact_audit"] = f"""
    WITH agg AS (
        SELECT event_type,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN user_id % {ERASE_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_erased,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents,
               CAST(sum(CASE WHEN user_id % {ERASE_MOD} = 0
                             THEN CAST(floor(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS erased_cents,
               count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = 0
                                   THEN user_id END) AS n_users_erased
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_rows, n_erased, total_cents, erased_cents,
           n_users_erased,
           (1000000 * n_erased) // n_rows AS erased_ppm
    FROM agg
"""

ORACLE["l_diversity_audit"] = f"""
    SELECT lang,
           n_chars // 100 AS len_bucket,
           count(*) AS k_size,
           count(DISTINCT source) AS l_sources,
           CASE WHEN count(*) < {K_MIN}
                     OR count(DISTINCT source) < {L_MIN}
                THEN 1 ELSE 0 END AS at_risk
    FROM documents
    GROUP BY lang, n_chars // 100
"""
