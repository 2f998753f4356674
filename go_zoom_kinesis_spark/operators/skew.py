"""Skew-handling recipes — 100 TB scale posture made executable.

Two standard mitigations, each exposed as an oracle-checkable query so
the rewrite is PROVEN identical to the naive plan, not just asserted:

- salted two-phase aggregation: groupBy(salt, key) partial → groupBy
  (key) merge. A hot key's rows spread over SALT reducers instead of
  one. Results must equal the direct groupBy — the oracle IS the direct
  GROUP BY.
- salted broadcast-replicated join: the dimension side is exploded
  ×SALT, the fact side picks a deterministic salt per row, and the join
  key becomes (key, salt) — a hot fact key fans across SALT partitions.
  Results must equal the plain join.

AQE's skewJoin handles moderate skew automatically (enabled in
session.py); explicit salting is the tool for the pathological single-
hot-key case AQE splits poorly, and for aggregations (which AQE skew
handling does not cover).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

DEC = "decimal(25,6)"
SALT = 8


def salted_agg(df: DataFrame, key: str, salt: int = SALT) -> DataFrame:
    """Two-phase skew-safe aggregation: count + exact decimal sum of
    ``value`` per ``key``. Phase 1 shuffles on (key, salt); phase 2
    merges the ≤salt partials per key."""
    partial = (
        df.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col("value").cast(DEC)).alias("_sum"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_events"),
        F.sum("_sum").cast("double").alias("sum_value"),
    )


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type has 5 values over millions of rows — the classic
    low-cardinality hot-key aggregation. Salted two-phase result is
    bit-identical to the direct groupBy (decimal partials commute)."""
    ev = load_table(spark, sf_dir, "events")
    return salted_agg(ev, "event_type")


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact(events) ⋈ dim(user profile) where a few users own most
    events: replicate the dim ×SALT, salt the fact deterministically,
    equi-join on (user_id, salt). Same rows as the plain join."""
    ev = load_table(spark, sf_dir, "events")
    # derived per-user dimension (stand-in for a profile table)
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.col("user_id").alias("d_user_id"))
        .agg(F.min("ts").alias("signup_ts"))
    )
    dim_rep = dim.withColumn(
        "_dsalt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    fact = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(SALT)).cast("int"))
    joined = fact.join(
        dim_rep,
        (F.col("user_id") == F.col("d_user_id")) & (F.col("_salt") == F.col("_dsalt")),
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("signup_ts").alias("signup_ts"),
    )


QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
}

ORACLE = {
    # the oracle is the UNSALTED plan — proving the rewrite exact
    "skew_salted_agg": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type
    """,
    "skew_salted_join": """
        SELECT user_id, count(*) AS n_events, min(signup_ts) AS signup_ts
        FROM events
        JOIN (SELECT user_id AS d_user_id, min(ts) AS signup_ts
              FROM events WHERE event_type = 'signup' GROUP BY 1) dim
          ON user_id = d_user_id
        GROUP BY user_id
    """,
}
