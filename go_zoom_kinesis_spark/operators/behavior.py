"""Behavioral / product-analytics operators over ``events`` — staged
funnels, cohort retention, Markov transition counts, fixed-width
histograms, and per-domain rate caps.

These are the user-facing analytics a consumer of the reference's
stream would run downstream of it (the reference itself stops at
per-shard metrics — ref ``src/monitoring/metrics.rs:149-156`` — so
everything here is the natural continuation over the landed events).
All queries follow the repo determinism rules (MEMORY/driver
contract): integral counts, decimal(25,6) sums, md5-hex ordering for
deterministic priorities, explicit tie-breaks on every window order.

Scale notes (100 TB):
- ``funnel_stages`` is three filtered partial aggregations joined on
  ``user_id`` — each stage shuffles once on the same key, so AQE can
  reuse the exchange; no window over the full fact table, no
  cross-stage rescan of raw events (each filter prunes to one
  event_type at the scan via pushdown).
- ``cohort_retention`` is the classic two-pass shape: first-touch per
  user (one shuffle), broadcast-free equi-join back onto events on
  ``user_id`` (co-partitioned with the first pass), then a low-
  cardinality (weeks × offsets) hash aggregate.
- ``event_transitions`` uses one window shuffle on ``user_id`` and
  aggregates to |types|² rows — map-side combine collapses the
  transition pairs before the final exchange.
- ``histogram_values`` is a single hash-aggregate on an integer
  bucket key computed scan-side in codegen; the output is O(range /
  width) rows regardless of input size.
- ``domain_cap_documents`` ranks inside each domain by md5(doc_id) —
  one window shuffle on ``source``. A mega-domain (web-crawl skew)
  concentrates its rank in one task; the documented mitigation is a
  hash-threshold pre-filter (keep rows with md5 below ~cap/n_domain
  quantile) before the exact rank, which bounds any task to ~cap
  candidate rows. At test scale the exact single-pass rank is the
  right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table

DEC = "decimal(25,6)"
DOMAIN_CAP = 10
BUCKET_CENTS = 5000  # histogram width: 50.00 in value units


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged view → click → purchase funnel: each stage counts users
    whose first qualifying event strictly follows their previous
    stage's first event (min-after-min semantics, not mere presence).
    Output is one row of monotonically non-increasing stage counts."""
    ev = _events(spark, sf_dir)
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    joined = (
        s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    )
    return joined.agg(
        F.count("v_ts").alias("n_view"),
        F.count("c_ts").alias("n_click_after_view"),
        F.count("p_ts").alias("n_purchase_after_click"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: cohort = ISO week of a user's
    first event; each later event lands in a whole-weeks-since-cohort
    offset; cells count distinct active users."""
    ev = _events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.join(first, "user_id").select(
        "user_id",
        "cohort_week",
        (
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("cohort_week")) / 7
            ).cast("bigint")
        ).alias("week_offset"),
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence (ordered by ts with event_id tie-break), plus the
    per-source-type share of each outgoing edge."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        # integer-exact share scaled to parts-per-million; floor on
        # both engines (Spark's double->bigint cast truncates while
        # DuckDB's rounds, so the floor must be explicit)
        F.floor(
            (F.col("n_transitions") * F.lit(1000000))
            / F.sum("n_transitions").over(wt)
        )
        .cast("bigint")
        .alias("share_ppm"),
    )


def histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``value`` in integer cents (width
    50.00): bucket key is computed in exact integer arithmetic so
    both engines agree at every boundary."""
    ev = _events(spark, sf_dir)
    # floor(value*100) in pure integer space: identical on both engines
    # for every representable double (no round-half mode to disagree on,
    # no decimal cast at aggregation time — the r2 driver hash-mismatch
    # was a numeric-representation edge in the decimal sum)
    cents = F.floor(F.col("value") * 100).cast("bigint")
    bucket = F.floor(cents / F.lit(float(BUCKET_CENTS))).cast("bigint")
    return (
        ev.select(
            bucket.alias("bucket"),
            cents.alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "bucket",
            (F.col("bucket") * F.lit(BUCKET_CENTS)).alias("bucket_lo_cents"),
            "n_events",
            "min_cents",
            "max_cents",
            "sum_cents",
        )
    )


def domain_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain rate cap (web-curation stage): keep at most
    DOMAIN_CAP docs per ``source``, chosen by deterministic md5
    priority (reproducible across runs/engines, unlike seeded
    sampling); report kept counts and kept bytes per domain."""
    docs = load_table(spark, sf_dir, "documents")
    pri = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(pri.asc(), F.col("doc_id").asc())
    ranked = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
    )
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum((F.col("rn") <= DOMAIN_CAP).cast("bigint")).alias("n_kept"),
        F.sum(
            F.when(F.col("rn") <= DOMAIN_CAP, F.col("n_chars")).otherwise(
                F.lit(0)
            )
        ).alias("kept_chars"),
    )


SESSION_GAP_US = 2 * 3600 * 1_000_000  # inactivity that closes a session
SESSION_CAP_US = 8 * 3600 * 1_000_000  # max span of one session slice


def session_split_dual_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH caps real products need: an inactivity
    gap (2 h) closes a session, and a max-duration cap (8 h) splits
    marathon sessions into fixed slices — Spark's built-in
    ``session_window`` only has the gap, so the cap is composed from
    two window passes over the same ``user_id`` partitioning.

    Pass 1 flags gap-breaks and prefix-sums them into a gap-session
    id; pass 2 (same shuffle key, so no second exchange) offsets each
    event against its gap-session start and floors into duration
    slices. All arithmetic is integer microseconds — both engines
    agree at every boundary.

    Scale: one shuffle on ``user_id``; per-task state is one row.
    Skewed mega-users are bounded by the cap itself (a slice never
    exceeds 8 h of events) and AQE skew-split handles the sort spill.
    """
    ev = _events(spark, sf_dir)
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = base.withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    start = Window.partitionBy("user_id", "session_seq")
    sliced = sess.withColumn(
        "slice_no",
        F.floor(
            (F.col("us") - F.min("us").over(start)) / F.lit(SESSION_CAP_US)
        ).cast("bigint"),
    )
    return sliced.groupBy("user_id", "session_seq", "slice_no").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.sum("cents").alias("sum_cents"),
    )


ATTRIB_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # touch→conversion lookback


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch linear attribution: every view/click that precedes
    a purchase by the same user within 7 days shares that purchase's
    credit equally (integer ppm, floored — sums stay exact). A touch
    attributes to its NEAREST following purchase, found with one
    forward-looking window (min of purchase timestamps over the
    following rows) — no touch×purchase join, so a hyperactive user
    costs O(events) not O(events²).

    Conversions are identified by (user_id, purchase-time); the
    grouping is on the same ``user_id`` shuffle key as the window, so
    the whole query is one exchange plus a tiny final rollup by
    touch type.
    """
    ev = _events(spark, sf_dir)
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    # min over rows STRICTLY AFTER current: the direct frame
    # rowsBetween(1, unboundedFollowing) is a shrinking frame Spark
    # re-scans per row (O(k²) for a k-event user — exactly the
    # hyperactive-user blowup this operator exists to avoid). Instead:
    # running min over the REVERSED ordering (growing frame, O(k)),
    # then lag(1) shifts it to exclude the current row — same strict
    # successor set, one sort.
    w_desc = Window.partitionBy("user_id").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    rm = F.min(
        F.when(F.col("event_type") == "purchase", F.col("us"))
    ).over(
        w_desc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touches = (
        base.withColumn("rm", rm)
        .withColumn("next_p_us", F.lag("rm", 1).over(w_desc))
        .drop("rm")
        .filter(F.col("event_type").isin("view", "click"))
        .filter(
            F.col("next_p_us").isNotNull()
            & ((F.col("next_p_us") - F.col("us")) <= ATTRIB_WINDOW_US)
        )
    )
    conv = touches.groupBy("user_id", "next_p_us").agg(
        F.count("*").alias("n_touches_conv")
    )
    credited = touches.join(conv, ["user_id", "next_p_us"]).withColumn(
        "credit_ppm",
        F.floor(F.lit(1_000_000) / F.col("n_touches_conv")).cast("bigint"),
    )
    return credited.groupBy("event_type").agg(
        F.count("*").alias("n_touches"),
        F.sum("credit_ppm").alias("sum_credit_ppm"),
        F.countDistinct(
            F.concat_ws("#", "user_id", "next_p_us")
        ).alias("n_conversions"),
    )


QUERIES = {
    "funnel_stages": funnel_stages,
    "cohort_retention": cohort_retention,
    "event_transitions": event_transitions,
    "histogram_values": histogram_values,
    "domain_cap_documents": domain_cap_documents,
    "session_split_dual_cap": session_split_dual_cap,
    "attribution_linear": attribution_linear,
}


ORACLE = {
    "funnel_stages": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS v_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS c_ts
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > s1.v_ts
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.c_ts
            GROUP BY e.user_id
        )
        SELECT count(s1.v_ts) AS n_view,
               count(s2.c_ts) AS n_click_after_view,
               count(s3.p_ts) AS n_purchase_after_click
        FROM s1
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    """,
    "cohort_retention": """
        WITH first AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
                       AS cohort_week
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_week,
               CAST(floor(
                   datediff('day', CAST(f.cohort_week AS DATE),
                            CAST(e.ts AS DATE)) / 7
               ) AS BIGINT) AS week_offset,
               count(DISTINCT e.user_id) AS n_users
        FROM events e JOIN first f USING (user_id)
        GROUP BY 1, 2
    """,
    "event_transitions": """
        WITH pairs AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        counts AS (
            SELECT from_type, to_type, count(*) AS n_transitions
            FROM pairs WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type,
               n_transitions,
               CAST(floor(
                   (n_transitions * 1000000)
                   / CAST(sum(n_transitions) OVER (
                         PARTITION BY from_type
                     ) AS BIGINT)
               ) AS BIGINT) AS share_ppm
        FROM counts
    """,
    "histogram_values": """
        WITH cents AS (
            SELECT CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT CAST(floor(cents / 5000.0) AS BIGINT) AS bucket,
               CAST(floor(cents / 5000.0) AS BIGINT) * 5000
                   AS bucket_lo_cents,
               count(*) AS n_events,
               min(cents) AS min_cents,
               max(cents) AS max_cents,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM cents
        GROUP BY 1, 2
    """,
    "session_split_dual_cap": """
        WITH base AS (
            SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        flagged AS (
            SELECT *,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w > 7200000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        sess AS (
            SELECT *,
                   CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_seq
            FROM flagged
        ),
        sliced AS (
            SELECT *,
                   CAST(floor(
                       (us - min(us) OVER (PARTITION BY user_id, session_seq))
                       / 28800000000
                   ) AS BIGINT) AS slice_no
            FROM sess
        )
        SELECT user_id, session_seq, slice_no,
               count(*) AS n_events,
               min(ts) AS start_ts,
               max(ts) AS end_ts,
               max(us) - min(us) AS duration_us,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM sliced
        GROUP BY user_id, session_seq, slice_no
    """,
    "attribution_linear": """
        WITH base AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events
        ),
        touches AS (
            SELECT * FROM (
                SELECT *,
                       min(CASE WHEN event_type = 'purchase' THEN us END)
                           OVER (
                               PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN 1 FOLLOWING
                                        AND UNBOUNDED FOLLOWING
                           ) AS next_p_us
                FROM base
            )
            WHERE event_type IN ('view', 'click')
              AND next_p_us IS NOT NULL
              AND next_p_us - us <= 604800000000
        ),
        conv AS (
            SELECT user_id, next_p_us, count(*) AS n_touches_conv
            FROM touches GROUP BY user_id, next_p_us
        )
        SELECT t.event_type,
               count(*) AS n_touches,
               CAST(sum(CAST(floor(1000000 / c.n_touches_conv) AS BIGINT))
                   AS BIGINT) AS sum_credit_ppm,
               count(DISTINCT CAST(t.user_id AS VARCHAR) || '#'
                     || CAST(t.next_p_us AS VARCHAR)) AS n_conversions
        FROM touches t
        JOIN conv c USING (user_id, next_p_us)
        GROUP BY t.event_type
    """,
    "domain_cap_documents": """
        WITH ranked AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT source,
               count(*) AS n_total,
               CAST(sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(sum(CASE WHEN rn <= 10 THEN n_chars ELSE 0 END)
                   AS BIGINT) AS kept_chars
        FROM ranked
        GROUP BY source
    """,
}
