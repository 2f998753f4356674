"""Corpus-statistics audits a pretraining-data team runs before a
mix decision: leakage-safe target encoding, concentration (Gini),
Zipf rank-frequency fit, source-diversity indices, and inter-filter
agreement (Cohen's kappa).

Reference parity: the reference engine (go-zoom-kinesis, a Kinesis
consumer) has no statistics surface — these are north-star extensions
per SURVEY.md §2.2 "training-data pipeline ops", same family as
quality.py / curation.py.

Scale posture (100 TB):
- every query aggregates to a bounded relation FIRST (source / lang /
  histogram domain), so shuffled bytes are O(domain), not O(rows);
- the only window functions run over grouped histograms (distinct
  n_chars per lang; distinct token frequencies), never raw rows — the
  two-phase pattern the round-5 verdict prescribed for
  low-cardinality partition keys;
- cross-engine hash parity: all sums/counts stay integer (decimal(38,0)
  on Spark / HUGEINT on DuckDB where products can outgrow int64) with
  ONE double division at the end; ln() is applied only to small
  positive integers (token counts), never to hash-derived values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

# exact integer predicates shared by the kappa query (documented in
# ORACLE mirrors character-for-character)
_LEN_THRESHOLD = 300  # filter A: n_chars >= 300 (~50% of the corpus)


def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of ``source`` against the
    ``n_chars`` target: each document's encoded value is the mean
    target of OTHER documents from the same source — the standard
    leakage-free categorical feature for tabular trainers.

    Plan: one bounded groupBy(source) (partial agg map-side), then a
    broadcast join back onto the fact scan — zero wide shuffles of the
    document table itself. loo = (sum - own) / (cnt - 1) stays exact
    integer arithmetic until the single double division.
    """
    docs = load_table(spark, sf_dir, "documents")
    enc = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("src_cnt"),
        F.sum("n_chars").alias("src_sum"),
    )
    out = docs.join(F.broadcast(enc), "source")
    return out.select(
        "doc_id",
        "source",
        "n_chars",
        F.when(
            F.col("src_cnt") > 1,
            (F.col("src_sum") - F.col("n_chars")).cast("double")
            / (F.col("src_cnt") - 1),
        ).alias("loo_mean_chars"),
    )


def gini_doclen_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Gini coefficient of document lengths — the
    concentration audit behind "is 1% of documents carrying 50% of the
    tokens in this slice?".

    Two-phase distributed rank (the round-5-verdict pattern): ranks
    come from the (lang, n_chars) histogram, never from a window over
    raw rows, so the per-lang sort touches O(distinct lengths) rows
    regardless of corpus size. Within a tie group of c equal values x
    starting after cumulative count f, the textbook sum
    Σ (2i - n - 1)·x over the group collapses to the closed form
    x · c · (2f + c - n) — integer-exact, tie-order free.
    decimal(38,0) keeps the products exact past int64 at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy("n_chars")
    dec = "decimal(38,0)"
    hist = hist.withColumn(
        "f", (F.sum("c").over(w) - F.col("c")).cast(dec)
    ).withColumn("c", F.col("c").cast(dec))
    x = F.col("n_chars").cast(dec)
    per_lang = hist.groupBy("lang").agg(
        F.sum("c").cast(dec).alias("n_docs"),
        F.sum(x * F.col("c")).cast(dec).alias("total_chars"),
    )
    hist = hist.join(F.broadcast(per_lang), "lang")
    contrib = x * F.col("c") * (
        F.lit(2).cast(dec) * F.col("f") + F.col("c") - F.col("n_docs")
    )
    out = hist.groupBy("lang").agg(
        F.first("n_docs").alias("n_docs"),
        F.first("total_chars").alias("total_chars"),
        F.sum(contrib).alias("gini_num"),
    )
    return out.select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        (
            F.col("gini_num").cast("double")
            / (F.col("n_docs") * F.col("total_chars")).cast("double")
        ).alias("gini"),
    )


def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the whitespace token vocabulary:
    slope of ln(freq) vs ln(rank) — the corpus-health check that
    natural text sits near slope -1.

    Tie-free rank definition: for each distinct frequency f,
    rank(f) = count of tokens with frequency >= f (the rank of the
    LAST token in f's tie block), derived purely from the
    count-of-counts histogram. The global cumulative window runs over
    that histogram (O(distinct frequencies) rows — tens to low
    thousands even at 100 TB), never over the vocabulary itself.
    ln() is applied to small positive integers only.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    coc = vocab.groupBy("freq").agg(F.count(F.lit(1)).alias("n_toks"))
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("freq").desc())
    pts = coc.withColumn("rank", F.sum("n_toks").over(w))
    pts = pts.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    # ln()/regr outputs are rounded to 4dp on BOTH engines: ln is not
    # correctly rounded cross-engine (house rule from collocation_pmi),
    # and 4dp boundaries are 100x sparser than the driver's 6dp hash.
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.regr_slope(F.col("y"), F.col("x")), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(F.col("y"), F.col("x")), 4)
        .alias("zipf_intercept"),
        F.round(F.regr_r2(F.col("y"), F.col("x")), 4).alias("fit_r2"),
    )


def diversity_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language source-diversity indices: Simpson (collision
    probability — exact rational) and Shannon entropy in nats — the
    "is this language slice dominated by one crawl source?" audit.

    One bounded (lang, source) aggregate then a per-lang fold; Simpson
    stays integer until one division; Shannon's ln() sees only small
    positive counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    per = c.groupBy("lang").agg(
        F.sum("c").alias("n_docs"),
        F.count(F.lit(1)).alias("n_sources"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("simpson_num"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
        .alias("clogc"),
    )
    return per.select(
        "lang",
        "n_docs",
        "n_sources",
        F.when(
            F.col("n_docs") > 1,
            F.col("simpson_num").cast("double")
            / (F.col("n_docs") * (F.col("n_docs") - 1)).cast("double"),
        ).alias("simpson"),
        # ln-derived → 4dp on both engines (cross-engine ln house rule)
        F.round(
            F.log(F.col("n_docs").cast("double"))
            - F.col("clogc") / F.col("n_docs"),
            4,
        ).alias("shannon"),
    )


def filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent quality filters, per
    language — the calibration check before trusting either filter to
    gate the corpus: A = length filter (n_chars >= 300), B =
    type-token-ratio filter (distinct tokens ≥ half of tokens; the
    ratio test is kept as an exact integer comparison).

    One conditional-aggregate pass over documents; kappa's
    po/pe algebra is carried as decimal(38,0) integer products
    (N² outgrows int64 at 100 TB) with one double division:
    kappa = (N·(n11+n00) − (a1·b1 + a0·b0)) / (N² − (a1·b1 + a0·b0)).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    docs = docs.withColumn("__toks", toks)
    a = (F.col("n_chars") >= _LEN_THRESHOLD).cast("bigint")
    b = (
        F.size(F.array_distinct(F.col("__toks"))) * 2
        >= F.size(F.col("__toks"))
    ).cast("bigint")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a * b).alias("n11"),
        F.sum(a * (1 - b)).alias("n10"),
        F.sum((1 - a) * b).alias("n01"),
        F.sum((1 - a) * (1 - b)).alias("n00"),
    )
    dec = "decimal(38,0)"
    n = F.col("n").cast(dec)
    a1 = (F.col("n11") + F.col("n10")).cast(dec)
    b1 = (F.col("n11") + F.col("n01")).cast(dec)
    a0 = (F.col("n01") + F.col("n00")).cast(dec)
    b0 = (F.col("n10") + F.col("n00")).cast(dec)
    agree = (F.col("n11") + F.col("n00")).cast(dec)
    pe_num = a1 * b1 + a0 * b0
    denom = n * n - pe_num
    return agg.select(
        "lang",
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        (agree.cast("double") / n.cast("double")).alias("po"),
        (pe_num.cast("double") / (n * n).cast("double")).alias("pe"),
        F.when(
            denom != 0,
            (n * agree - pe_num).cast("double") / denom.cast("double"),
        ).alias("kappa"),
    )


QN_DOMAIN_LIMIT = 100_000  # distinct-value ceiling for the exact path
QN_BUCKETS = 4096  # fallback resolution above the ceiling


def quantile_normalize_over(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Quantile normalization of an integer column across groups: each
    (group, value) maps to the smallest GLOBAL value whose global CDF
    reaches the value's within-group CDF — the classic cross-slice
    distribution aligner (e.g. make per-language length distributions
    comparable before mixing).

    Everything runs on histograms: one groupBy builds the (group,
    value) histogram, the global histogram folds from it (no second
    scan), and the CDF comparison `gcum·n_g ≥ cum·N` stays EXACT
    integer (decimal(38,0)) — no double-CDF boundary ambiguity. The
    candidate join is broadcast histogram × histogram, O(D²) pairs in
    the value domain D; a pre-check coarsens to QN_BUCKETS
    equal-width buckets when the value RANGE (hi − lo + 1, an upper
    bound on D) exceeds QN_DOMAIN_LIMIT.

    The guard is deliberately range-based, not distinct-count-based
    (r7 advice): min/max are exact, so the branch choice is
    deterministic and the DuckDB oracle restates the SAME conditional
    bucketization — parity holds on either side of the threshold. An
    approx_count_distinct guard would flip nondeterministically near
    the limit and had no oracle counterpart. (A sparse domain with a
    wide range bucketizes conservatively — acceptable: the fallback
    is still a valid quantile normalizer at QN_BUCKETS resolution.)
    """
    from pyspark.sql.window import Window

    dom = df.select(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    ).collect()[0]
    rng = (
        int(dom["hi"]) - int(dom["lo"]) + 1 if dom["hi"] is not None else 0
    )
    if rng > QN_DOMAIN_LIMIT:
        width = max(1, rng // QN_BUCKETS)
        val = (
            F.floor((F.col(value_col) - int(dom["lo"])) / width) * width
            + int(dom["lo"])
        ).alias(value_col)
    else:
        val = F.col(value_col)
    hist = df.select(F.col(group_col).alias("g"), val.alias("v")).groupBy(
        "g", "v"
    ).agg(F.count(F.lit(1)).alias("c"))
    dec = "decimal(38,0)"
    wl = Window.partitionBy("g").orderBy("v")
    lh = (
        hist.withColumn("cum", F.sum("c").over(wl).cast(dec))
        .withColumn("n_g", F.sum("c").over(Window.partitionBy("g")).cast(dec))
    )
    g = hist.groupBy("v").agg(F.sum("c").alias("gc"))
    wg = Window.orderBy("v")
    wall = wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g = (
        g.withColumn("gcum", F.sum("gc").over(wg).cast(dec))
        .withColumn("N", F.sum("gc").over(wall).cast(dec))
        .select(F.col("v").alias("gv"), "gcum", "N")
    )
    joined = lh.join(
        F.broadcast(g),
        g["gcum"] * lh["n_g"] >= lh["cum"] * g["N"],
    )
    out = joined.groupBy("g", "v", "cum", "n_g").agg(
        F.min("gv").alias("norm_v")
    )
    return out.select(
        F.col("g").alias(group_col),
        F.col("v").alias(value_col),
        (F.col("cum").cast("double") / F.col("n_g").cast("double")).alias("q"),
        F.col("norm_v").alias(f"norm_{value_col}"),
    )


def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface: quantile-normalize ``n_chars`` across
    languages (see quantile_normalize_over for plan + guard)."""
    docs = load_table(spark, sf_dir, "documents")
    return quantile_normalize_over(
        docs.select("lang", "n_chars"), "lang", "n_chars"
    )


QUERIES = {
    "quantile_normalize_lengths": quantile_normalize_lengths,
    "target_encoding_loo": target_encoding_loo,
    "gini_doclen_concentration": gini_doclen_concentration,
    "zipf_slope_fit": zipf_slope_fit,
    "diversity_index_audit": diversity_index_audit,
    "filter_agreement_kappa": filter_agreement_kappa,
}

ORACLE = {
    "quantile_normalize_lengths": f"""
        WITH dom AS (
            SELECT min(n_chars) AS lo, max(n_chars) AS hi,
                   greatest(1, (max(n_chars) - min(n_chars) + 1)
                               // {QN_BUCKETS}) AS w
            FROM documents
        ),
        -- mirrors the Spark-side deterministic range guard: exact
        -- values below the domain limit, equal-width buckets above
        vals AS (
            SELECT lang AS g,
                   CASE WHEN (hi - lo + 1) > {QN_DOMAIN_LIMIT}
                        THEN CAST(floor(CAST(n_chars - lo AS DOUBLE) / w)
                                  AS BIGINT) * w + lo
                        ELSE n_chars END AS v
            FROM documents, dom
        ),
        hist AS (
            SELECT g, v, count(*) AS c FROM vals GROUP BY g, v
        ),
        lh AS (
            SELECT g, v, c,
                   CAST(sum(c) OVER (PARTITION BY g ORDER BY v)
                        AS HUGEINT) AS cum,
                   CAST(sum(c) OVER (PARTITION BY g) AS HUGEINT) AS n_g
            FROM hist
        ),
        gh AS (
            SELECT v AS gv,
                   CAST(sum(sum(c)) OVER (ORDER BY v) AS HUGEINT) AS gcum,
                   CAST(sum(sum(c)) OVER () AS HUGEINT) AS N
            FROM hist GROUP BY v
        )
        SELECT lh.g AS lang, lh.v AS n_chars,
               CAST(lh.cum AS DOUBLE) / CAST(lh.n_g AS DOUBLE) AS q,
               min(gh.gv) AS norm_n_chars
        FROM lh JOIN gh ON gh.gcum * lh.n_g >= lh.cum * gh.N
        GROUP BY lh.g, lh.v, lh.cum, lh.n_g
    """,
    "target_encoding_loo": """
        WITH enc AS (
            SELECT source, count(*) AS src_cnt, sum(n_chars) AS src_sum
            FROM documents GROUP BY source
        )
        SELECT d.doc_id, d.source, d.n_chars,
               CASE WHEN e.src_cnt > 1
                    THEN CAST(e.src_sum - d.n_chars AS DOUBLE)
                         / (e.src_cnt - 1) END AS loo_mean_chars
        FROM documents d JOIN enc e USING (source)
    """,
    "gini_doclen_concentration": """
        WITH hist AS (
            SELECT lang, n_chars, CAST(count(*) AS HUGEINT) AS c
            FROM documents GROUP BY lang, n_chars
        ),
        cum AS (
            SELECT lang, n_chars, c,
                   CAST(sum(c) OVER (PARTITION BY lang ORDER BY n_chars)
                        - c AS HUGEINT) AS f
            FROM hist
        ),
        per AS (
            SELECT lang, sum(c) AS n_docs,
                   sum(CAST(n_chars AS HUGEINT) * c) AS total_chars
            FROM hist GROUP BY lang
        )
        SELECT h.lang,
               CAST(p.n_docs AS BIGINT) AS n_docs,
               CAST(p.total_chars AS BIGINT) AS total_chars,
               CAST(sum(CAST(h.n_chars AS HUGEINT) * h.c *
                        (2 * h.f + h.c - p.n_docs)) AS DOUBLE)
               / CAST(p.n_docs * p.total_chars AS DOUBLE) AS gini
        FROM cum h JOIN per p USING (lang)
        GROUP BY h.lang, p.n_docs, p.total_chars
    """,
    "zipf_slope_fit": """
        WITH toks AS (
            SELECT unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        vocab AS (
            SELECT tok, count(*) AS freq FROM toks
            WHERE length(tok) > 0 GROUP BY tok
        ),
        coc AS (SELECT freq, count(*) AS n_toks FROM vocab GROUP BY freq),
        pts AS (
            SELECT ln(CAST(sum(n_toks) OVER (ORDER BY freq DESC)
                           AS DOUBLE)) AS x,
                   ln(CAST(freq AS DOUBLE)) AS y
            FROM coc
        )
        SELECT count(*) AS n_points,
               round(regr_slope(y, x), 4) AS zipf_slope,
               round(regr_intercept(y, x), 4) AS zipf_intercept,
               round(regr_r2(y, x), 4) AS fit_r2
        FROM pts
    """,
    "diversity_index_audit": """
        WITH c AS (
            SELECT lang, source, count(*) AS c
            FROM documents GROUP BY lang, source
        )
        SELECT lang,
               CAST(sum(c) AS BIGINT) AS n_docs,
               count(*) AS n_sources,
               CASE WHEN sum(c) > 1
                    THEN CAST(sum(c * (c - 1)) AS DOUBLE)
                         / CAST(sum(c) * (sum(c) - 1) AS DOUBLE)
               END AS simpson,
               round(ln(CAST(sum(c) AS DOUBLE))
                     - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                       / sum(c), 4)
               AS shannon
        FROM c GROUP BY lang
    """,
    "filter_agreement_kappa": f"""
        WITH flags AS (
            SELECT lang,
                   CASE WHEN n_chars >= {_LEN_THRESHOLD}
                        THEN 1 ELSE 0 END AS a,
                   CASE WHEN len(list_distinct(
                                string_split(lower(text), ' '))) * 2
                             >= len(string_split(lower(text), ' '))
                        THEN 1 ELSE 0 END AS b
            FROM documents
        ),
        agg AS (
            SELECT lang, count(*) AS n,
                   CAST(sum(a * b) AS BIGINT) AS n11,
                   CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
                   CAST(sum((1 - a) * b) AS BIGINT) AS n01,
                   CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
            FROM flags GROUP BY lang
        )
        SELECT lang, n, n11, n10, n01, n00,
               CAST(n11 + n00 AS DOUBLE) / n AS po,
               CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                    + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS pe,
               CASE WHEN CAST(n AS HUGEINT) * n
                         - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                            + CAST(n01 + n00 AS HUGEINT) * (n10 + n00))
                         <> 0
                    THEN CAST(CAST(n AS HUGEINT) * (n11 + n00)
                              - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                                 + CAST(n01 + n00 AS HUGEINT)
                                   * (n10 + n00)) AS DOUBLE)
                         / CAST(CAST(n AS HUGEINT) * n
                                - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                                   + CAST(n01 + n00 AS HUGEINT)
                                     * (n10 + n00)) AS DOUBLE)
               END AS kappa
        FROM agg
    """,
}
