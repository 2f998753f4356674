"""UDF/UDAF and SQL-API surface coverage (SURVEY.md §2.2 "UDF/UDAF/UDTF
surface" row; UDTF shape lives in ``explode_tokens``).

The reference's whole user-extension surface is ONE scalar-ish map
(`RecordProcessor::process_record`, /root/reference/src/processor.rs:133-155)
plus a commit hook; Spark's is much wider. This module pins the pieces
the rest of the repo doesn't already exercise:

- ``udaf_weighted_qty``: a grouped-agg *pandas UDAF* (Arrow-batched,
  the fast Python aggregation path). Kept oracle-checkable by summing
  integer-valued doubles (exact in IEEE below 2^53, order-independent,
  so the hash matches DuckDB bit-for-bit despite Python execution).
- ``map_functions``: MapType coverage — ``from_json`` →
  ``map<string,bigint>`` → map_keys/map_values/element_at/size.
- ``sql_api_nation_revenue``: the same engine through the *SQL text*
  API (``spark.sql`` over registered temp views) — proves the driver
  contract isn't DataFrame-only. Catalyst plans text and DataFrame
  identically, so scale posture is unchanged.

Scale notes: the pandas UDAF ships one Arrow batch per group-partition
(partial aggregation is NOT available to Python UDAFs — documented
trade-off; the built-in ``sum`` path in relational.py is the 100 TB
default, this entry pins the mechanism). Map parsing is JVM-side
whole-stage codegen, no Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, MapType, StringType

from ..io import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# explicit returnType instance, not a DDL string (strings parse at
# import time and need a live SparkContext) and not type-hint inference
# (broken under `from __future__ import annotations`)
@pandas_udf(DoubleType())
def _weighted_qty_sum(qty: pd.Series, weight: pd.Series) -> float:
    # integer-valued doubles: addition is exact and order-independent
    return float((qty * weight).sum())


# a pandas group-agg UDF cannot share an agg() with JVM aggregates
# (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a pandas UDAF too
@pandas_udf(LongType())
def _count_rows(qty: pd.Series) -> int:
    return int(len(qty))


N_SALTS = 32  # sub-groups per return flag for the two-phase UDAF


def udaf_weighted_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: linenumber-weighted quantity per
    return flag, two-phase. Phase 1 groups by (flag, salt) so the
    Python aggregation runs on flags×N_SALTS parallel sub-groups
    instead of funneling the whole table into 3 tasks (a pandas UDAF
    gets no map-side partial aggregation — with 3 raw groups at 100 TB
    every row would shuffle to 3 executors and OOM); phase 2 folds the
    integer-valued partial sums JVM-side. Every product and sum is an
    integer held in a double — exact in IEEE below 2^53 and
    order-independent — so the split is invisible to the oracle hash."""
    li = _t(spark, sf_dir, "lineitem")
    salt = F.pmod(F.col("l_orderkey"), F.lit(N_SALTS)).alias("salt")
    # r13: fanning the scan out before this groupBy was MEASURED WORSE
    # (0.68 -> 1.41 s): a pandas UDAF gets no partial aggregation, so
    # the repartition is a second full shuffle of the same rows and
    # the original single-core shuffle write is cheaper than paying it.
    partial = li.select(
        "l_returnflag", salt, "l_quantity", "l_linenumber"
    ).groupBy("l_returnflag", "salt").agg(
        _weighted_qty_sum(
            F.col("l_quantity"), F.col("l_linenumber").cast("double")
        ).alias("pw"),
        _count_rows(F.col("l_quantity")).alias("pn"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pw").alias("weighted_qty"),
        F.sum("pn").alias("n_rows"),
    )


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType scalar coverage: parse events.props into a map, then
    map_keys / map_values / element_at / size — all JVM-side."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.from_json(F.col("props"), MapType(StringType(), LongType()))
    return ev.select(
        "event_id",
        # joined to one string: raw list cells are unhashable in the
        # driver's pandas canonicalizer
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.size(m).alias("n_props"),
        F.array_max(F.map_values(m)).alias("max_value"),
    )


def sql_api_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text entry point: revenue per customer nation, written
    as a SQL string over temp views. Identical logical plan to the
    DataFrame formulation (one shuffle agg over broadcast-joined
    dims); included to pin the spark.sql surface of the engine.

    r13 (guide §2.5): the fact view is fanned out — the single-file
    scan is one partition, which one-cored the broadcast-join probes
    and the per-row fixed-point revenue arithmetic (floor/round ×600k).
    The summed terms are integers, so the regrouping is hash-invariant;
    no-op at production split counts."""
    for name in ("orders", "customer", "nation"):
        _t(spark, sf_dir, name).createOrReplaceTempView(f"gzk_{name}")
    # r13 quiet-host re-A/B: fan-out REVERTED (0.69 unfanned vs 0.94
    # fanned) — the fixed-point projection is too light per row
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("gzk_lineitem")
    return spark.sql(
        """
        SELECT n_name AS nation_name,
               CAST((sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT))
                     + sum(CAST(round((l_extendedprice * (1 - l_discount)
                         - floor(l_extendedprice * (1 - l_discount)))
                         * 1000000.0) AS BIGINT)) / 1000000.0)
                    AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM gzk_lineitem
        JOIN gzk_orders ON l_orderkey = o_orderkey
        JOIN gzk_customer ON o_custkey = c_custkey
        JOIN gzk_nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


class _TokenPositions:
    """Python UDTF body: one input row (text) → one output row per
    token with its position. Defined as a plain class; wrapped with
    ``F.udtf`` at call time (decorating at import would bind the return
    schema before any SparkSession exists)."""

    def eval(self, text: str):
        ws = [w for w in (text or "").lower().split(" ") if w]
        for i, w in enumerate(ws):
            yield i, w


def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real Python UDTF surface (Spark 3.5+/4): a table function
    applied per input row via SQL LATERAL — completing the
    UDF/UDAF/UDTF triple (``explode_tokens`` is the built-in UDTF
    SHAPE; this is the Python API itself). Row-at-a-time Python is the
    slow path by design — the entry pins the mechanism on a bounded
    input (doc_id < 40), not a 100 TB recipe; at scale the same logic
    is the posexplode/split one-liner."""
    from pyspark.sql.functions import udtf

    tp = udtf(_TokenPositions, returnType="pos int, token string")
    spark.udtf.register("gzk_token_positions", tp)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    docs.createOrReplaceTempView("gzk_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, f.pos, f.token
        FROM gzk_docs_udtf d, LATERAL gzk_token_positions(d.text) f
        """
    )


def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT surface: ``parse_json`` → semi-structured
    VARIANT column → typed ``try_variant_get`` extraction, then a
    plain rollup. VARIANT is the modern open-table semi-structured
    type (binary-encoded, predicate-pushable) — the 100 TB replacement
    for string-JSON re-parsing in every expression; the oracle states
    the same extraction over DuckDB's JSON functions."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select(k.alias("k_value"))
        .groupBy((F.col("k_value") % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k_value").alias("sum_k"),
            F.max("k_value").alias("max_k"),
        )
    )


def arrow_scalar_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized SCALAR Python UDF (``F.udf(..., useArrow=True)``)
    — the last cell of the Python execution matrix (pandas_udf /
    mapInPandas / mapInArrow / UDTF / pandas-UDAF are elsewhere):
    row-at-a-time user code, but Arrow-batched transport instead of
    pickled rows, so the serialization tax drops ~10× while keeping
    the plain-function authoring model. The UDF canonicalizes event
    types (strip digits, upper, first 4 chars) the way a real pipeline
    wraps a legacy Python normalizer it can't vectorize.

    Kept OFF the hot path by design: the oracle restates the transform
    in pure SQL, and a production deployment promotes it to built-in
    column ops exactly like that SQL — the entry pins the MECHANISM.
    Integer aggregates, so the hash matches despite Python execution."""
    ev = _t(spark, sf_dir, "events")

    @F.udf(returnType="string", useArrow=True)
    def canon(s):
        if s is None:
            return None
        # ASCII-digit strip (not str.isdigit: that also matches Unicode
        # digits and would diverge from the oracle's [0-9] regex under
        # the unicode fuzzer)
        return "".join(c for c in s if c not in "0123456789").upper()[:4]

    cents = F.floor(F.col("value") * 100).cast("bigint")
    return (
        ev.select(canon(F.col("event_type")).alias("canon_type"), cents.alias("cents"))
        .groupBy("canon_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents"))
    )


QUERIES = {
    "udaf_weighted_qty": udaf_weighted_qty,
    "udtf_token_positions": udtf_token_positions,
    "variant_props_rollup": variant_props_rollup,
    "map_functions": map_functions,
    "sql_api_nation_revenue": sql_api_nation_revenue,
    "arrow_scalar_udf_norm": arrow_scalar_udf_norm,
}

ORACLE = {
    "arrow_scalar_udf_norm": """
        SELECT substr(upper(regexp_replace(event_type, '[0-9]', '', 'g')),
                      1, 4) AS canon_type,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY 1
    """,
    "udtf_token_positions": """
        WITH t1 AS (
            SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       x -> x <> '') AS ws
            FROM documents WHERE doc_id < 40
        ),
        t2 AS (
            SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws))) AS i
            FROM t1
        )
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ws[i] AS token
        FROM t2
    """,
    "variant_props_rollup": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
                   AS k_mod,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS max_k
        FROM events
        GROUP BY 1
    """,
    "udaf_weighted_qty": """
        SELECT l_returnflag,
               sum(l_quantity * l_linenumber) AS weighted_qty,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "map_functions": """
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               len(json_keys(props)) AS n_props,
               list_max(list_transform(json_keys(props),
                   key -> CAST(json_extract_string(props, '$.' || key) AS BIGINT)))
                   AS max_value
        FROM events WHERE event_id < 500
    """,
    "sql_api_nation_revenue": """
        SELECT n_name AS nation_name,
               CAST((sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT))
                     + sum(CAST(round((l_extendedprice * (1 - l_discount)
                         - floor(l_extendedprice * (1 - l_discount)))
                         * 1000000.0) AS BIGINT)) / 1000000.0)
                    AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
}
