"""Relational coverage, part 2 — SURVEY.md §2.2 widening.

More TPC-H-shaped queries (Q4/Q6/Q7/Q10/Q14/Q17/Q18 adapted to the
slimmed test schema), GROUPING SETS, the full analytic-window function
set (ntile/percent_rank/cume_dist/lead/first_value), pivot, scalar
subquery, explode/UNNEST, and the two batch-checkable streaming window
shapes the reference lacks entirely (SURVEY §2.2 "watermarks/event-time
windows" row): gap-based session windows and sliding windows.

Determinism follows relational.py: money sums via DECIMAL(25,6), top-k
always tie-broken on a unique key, identical column aliases on both the
Spark and DuckDB sides.

Scale posture: dimensions broadcast; fact-fact joins shuffle on keys;
the sliding window expands each row to exactly window/slide buckets
(bounded fan-out, no theta join); sessionization is one shuffle on
user_id + two ordered window passes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.fixedpoint import fsum, isum
from ..io import load_table

DEC = "decimal(25,6)"

SESSION_GAP_MIN = 120  # session window gap (minutes)
SLIDE_MIN = 30  # sliding window: 60-min window every 30 min
SLIDE_WINDOW_MIN = 60


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dsum(col: F.Column) -> F.Column:
    """Exact money sum — fixed-point dual-bigint form (see
    functions/fixedpoint.py)."""
    return fsum(col, 6)


# --- TPC-H-shaped queries ----------------------------------------------


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter with at least one lineitem
    shipped >60 days after the order date — correlated EXISTS with an
    inequality, planned as a left-semi join on the order key."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + single aggregate. The whole query is one
    parquet scan with every predicate pushed down (explain shows
    PushedFilters on l_shipdate/l_discount/l_quantity) — the canonical
    'Catalyst does the work' plan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year — fact⋈fact shuffle join plus two broadcast nation lookups
    with a symmetric pair predicate."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        _t(spark, sf_dir, "lineitem")
        .join(_t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer in a quarter;
    top-20 with deterministic tie-break."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional aggregation over a
    broadcast join, two exact decimal sums divided in double."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * fsum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0), 6)
            / fsum(disc, 6)
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_items"),
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue impact of small-quantity orders for one brand
    — per-part average as a broadcast aggregate instead of a correlated
    scalar subquery (identical semantics, one pass, no rescan).

    The avg comparison is cross-multiplied (qty·n·5 < sum) so both
    engines compare the same exactly-representable doubles."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = _t(spark, sf_dir, "lineitem")
    li_b = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    per_part = li_b.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        isum(F.col("l_quantity")).alias("sum_qty"),
        F.count("*").alias("n_li"),
    )
    small = li_b.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("a_partkey")
    ).filter(F.col("l_quantity") * F.col("n_li") * 5 < F.col("sum_qty"))
    return small.agg(
        (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
        F.count("*").alias("n_small"),
    )


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders — HAVING on a grouped fact, then
    join back to orders/customer; top-50 deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(isum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )
    return joined.orderBy(F.desc("total_qty"), F.asc("o_orderkey")).limit(50)


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ASIA-region revenue per
    order year — conditional aggregation over a 7-table star join, all
    dimensions broadcast."""
    nation_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    nation_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        _t(spark, sf_dir, "lineitem")
        .join(_t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == F.col("r_regionkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_key"))
    )
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (
            fsum(
                F.when(F.col("supp_nation") == "NATION_5", disc)
                .otherwise(0.0),
                6,
            )
            / fsum(disc, 6)
        ).alias("mkt_share"),
        F.count("*").alias("n_items"),
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer INCLUDING
    zero-order customers — left outer join, two-level aggregation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicates (brand × size ×
    quantity bands) — the disjunction stays above the scan but each
    conjunct's columns still prune; join remains equi on partkey."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return joined.filter(cond).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q22_no_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no orders — scalar
    subquery (avg positive balance) + anti join."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (fsum(F.col("c_acctbal"), 6) / F.count("*"))
        .alias("avg_bal")
    )
    orders = _t(spark, sf_dir, "orders")
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        _dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar-function coverage: path extraction + typed cast +
    conditional aggregation over the extracted value."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k % 2 == 0, 1)).alias("n_even_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling / conditional scalar coverage: coalesce, nullif,
    least, greatest, CASE chains."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return orders.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("NOT_P")).alias(
            "status_or_default"
        ),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped_price"),
        F.greatest(F.col("o_custkey") % 7, F.col("o_custkey") % 11).alias("max_mod"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


# --- grouping sets ------------------------------------------------------


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((flag, status), (flag), ()) — the general
    form of rollup/cube, one pass with Expand."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(isum(F.col("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))


# --- analytic window functions -----------------------------------------


def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full analytic set over each customer's order history: ntile,
    percent_rank, cume_dist, lead, first_value."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


# --- pivot --------------------------------------------------------------


def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders to a priority × status count matrix (explicit value
    list ⇒ single-pass conditional aggregation, no value-discovery job)."""
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


# --- scalar subquery ----------------------------------------------------


def orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced >1.5× the global average — the scalar subquery
    re-expressed as a broadcast single-row aggregate (exact decimal
    avg), so the fact side streams through one filter."""
    orders = _t(spark, sf_dir, "orders")
    avg_row = orders.agg(
        (fsum(F.col("o_totalprice"), 6) / F.count("*"))
        .alias("avg_price")
    )
    return (
        orders.join(F.broadcast(avg_row))
        .filter(F.col("o_totalprice") > F.col("avg_price") * 1.5)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


# --- explode / UNNEST ---------------------------------------------------


def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of whitespace tokens → top-10 tokens per language
    (UDTF-shaped coverage: explode + two-level aggregation + windowed
    top-k)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: F.length(x) > 3)
        ).alias("token"),
    )
    counts = toks.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)


# --- session windows (gaps-and-islands, batch-checkable) ----------------


def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch analog of Structured
    Streaming's session_window): a new session starts when a user is
    idle > SESSION_GAP_MIN. One shuffle on user_id; two ordered window
    passes (lag → cumulative sum of session starts)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_idx",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event_id"),
    )


# --- sliding windows (batch-checkable) ----------------------------------


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (60 min every 30 min) — each row lands
    in exactly window/slide = 2 buckets (bounded fan-out, epoch-aligned
    starts identical to Spark's streaming window())."""
    ev = _t(spark, sf_dir, "events")
    win = F.window("ts", f"{SLIDE_WINDOW_MIN} minutes", f"{SLIDE_MIN} minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # sum→double BEFORE dividing: decimal-division scale rules
            # differ between engines; double division is pure IEEE
            (fsum(F.col("value"), 6) / F.count("*"))
            .alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "avg_value",
        )
    )


# --- statistical aggregates --------------------------------------------


def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev/correlation via exact decimal power sums + an
    identical closed-form in both engines — deterministic where the
    built-in streaming moment algorithms (Welford etc.) are not."""
    li = _t(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        isum(F.col("l_quantity")).alias("sx"),
        isum(F.col("l_quantity") * F.col("l_quantity"))
        .alias("sxx"),
        fsum(F.col("l_extendedprice"), 6).alias("sy"),
        fsum(F.col("l_extendedprice") * F.col("l_extendedprice"), 6).alias("syy"),
        fsum(F.col("l_quantity") * F.col("l_extendedprice"), 6).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    var = (n * sxx - sx * sx) / (n * (n - 1))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return sums.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


# --- array functions ----------------------------------------------------


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function coverage on generated sequences (size/index/
    slice/contains/fold/max), integer-exact on both engines."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    arr = F.sequence(F.lit(1), F.col("p_size"))
    return part.select(
        "p_partkey",
        F.size(arr).alias("arr_len"),
        F.element_at(arr, 1).alias("first_elem"),
        # join to a scalar string: the driver's pandas canonicalizer
        # cannot sort/hash raw list cells (unhashable) — both engines
        # emit the same '2,3,4'-style rendering
        F.array_join(F.slice(arr, 2, 3), ",").alias("mid_slice"),
        F.array_contains(arr, 7).alias("has7"),
        F.aggregate(arr, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("arr_sum"),
        F.array_max(arr).alias("arr_max"),
    )


_PCTL_PS = (("p25", 0.25), ("p50", 0.5), ("p95", 0.95))


def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles. Spark percentile() and
    DuckDB quantile_cont share the (n-1)·p rank convention (verified
    bit-equal at round-6); at 100 TB the same query swaps in
    approx_percentile (mergeable sketch) with a declared error bound.

    r13 step 1 (guide §2.3): three scalar percentile() aggregates each
    built their OWN value→count map over every row — the array form
    shares one map (2.64 → 1.13 s).

    r13 step 2 (guide §4.1/§2.4): percentile() is an
    ObjectHashAggregate — per-row BOXED OpenHashMap updates in 32
    partial maps (near-unique prices: 583k distinct of 600k rows, so
    the maps compress nothing), serialized map merges, then a
    single-threaded sort per group. Replaced with the codegen
    sort-based plan: one exchange by group key, one Window node
    computing both counts, row_number over the price order, keep ONLY
    the 6 bracketing ranks, and interpolate with EXACTLY Spark
    Percentile's arithmetic —
        position = (N-1)·p        (Long·Double)
        lower = floor(position); higher = ceil(position)
        if higher == lower or v_hi == v_lo: v_lo
        else (higher-position)·v_lo + (position-lower)·v_hi
    — the identical IEEE-double operation sequence, so results are
    bit-equal (referee'd against percentile() in
    tests/test_r13_ops.py and A/B'd bit-equal at all three SFs).
    1.13 → 0.84 s isolated; every node whole-stage-codegen, no boxed
    aggregation buffers at any scale. The group-key exchange the
    window needs replaces the fan-out (the sort parallelism is
    |groups|, same as percentile()'s final merge).

    Parity caveats (ADVICE r13): a group whose l_extendedprice is
    entirely NULL is dropped by the pre-rank isNotNull filter, where
    the percentile() form would return it with NULL percentiles and
    its n_rows — unreachable on TPC-H lineitem (the column is
    non-null), but a divergence from the builtin if reused on nullable
    data. And the EXACT tier's 100 TB posture: the window exchange is
    keyed by l_returnflag (3 groups), so the sort parallelism ceiling
    is |groups| — three spillable codegen sorts of ~N/3 rows each,
    serial per group (the same final-merge ceiling percentile() had,
    minus its boxed memory). That is why the docstring's first
    paragraph declares the approx_percentile swap at 100 TB: the exact
    tier is for |groups| ≳ cores or bounded N."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    wp = Window.partitionBy("l_returnflag")
    wo = wp.orderBy("l_extendedprice")
    # both counts in ONE pre-filter Window node: count(lit(1)) = all
    # rows, count(col) = non-null rows (what percentile() ranks over)
    vals = (
        li.select(
            "l_returnflag",
            "l_extendedprice",
            F.count(F.lit(1)).over(wp).alias("n_rows"),
            F.count("l_extendedprice").over(wp).alias("nv"),
        )
        .where(F.col("l_extendedprice").isNotNull())
        .select("*", F.row_number().over(wo).alias("rn"))
    )
    idx = F.col("rn") - 1
    conds = []
    aggs = [F.max("n_rows").alias("n_rows"), F.max("nv").alias("nv")]
    for name, p in _PCTL_PS:
        pos = (F.col("nv") - 1) * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        conds += [idx == lo, idx == hi]
        aggs += [
            F.max(F.when(idx == lo, F.col("l_extendedprice"))).alias(
                f"vlo_{name}"
            ),
            F.max(F.when(idx == hi, F.col("l_extendedprice"))).alias(
                f"vhi_{name}"
            ),
        ]
    picked = vals.where(reduce(lambda a, b: a | b, conds))
    agg = picked.groupBy("l_returnflag").agg(*aggs)
    sel = []
    for name, p in _PCTL_PS:
        pos = (F.col("nv") - 1) * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        vlo, vhi = F.col(f"vlo_{name}"), F.col(f"vhi_{name}")
        interp = F.when((hi == lo) | (vhi == vlo), vlo).otherwise(
            (hi - pos) * vlo + (pos - lo) * vhi
        )
        sel.append(F.round(interp, 6).alias(name))
    return agg.select("l_returnflag", *sel, F.col("n_rows").alias("n_rows"))


def approx_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: approx_percentile (Greenwald-Khanna
    sketch, mergeable across partitions — one pass, bounded memory,
    no global sort). Accuracy 1e6 bounds rank error to n/accuracy
    rows; below ~1e6 rows per group that is < 1 row, i.e. EXACT, and
    it returns an actual data element — so it hash-matches DuckDB's
    quantile_disc at test scales while remaining the genuinely
    approximate operator you'd run (with lower accuracy) at 100 TB."""
    # r13: fan-out tried and REVERTED (0.62 -> 1.03 isolated) — at
    # accuracy 1e6 the 32 per-partition Greenwald-Khanna sketches cost
    # more to merge than the one-core build saves at this row count
    li = _t(spark, sf_dir, "lineitem")
    ap = "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.95), 1000000)"
    return li.groupBy("l_returnflag").agg(
        F.expr(ap).getItem(0).alias("p25"),
        F.expr(ap).getItem(1).alias("p50"),
        F.expr(ap).getItem(2).alias("p95"),
        F.count("*").alias("n_rows"),
    )


def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface over event ids: AND/OR/XOR
    aggregates, popcount sums, masked buckets. All whole-stage-codegen
    integer ops — one hash aggregate, no Python anywhere. Oracle note:
    DuckDB's ``^`` is POWER, so its side spells xor as ``xor()``."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("event_id").alias("band"),
        F.bit_or("event_id").alias("bor"),
        F.bit_xor("event_id").alias("bxor"),
        F.sum(F.bit_count("event_id").cast("long")).alias("sum_popcount"),
        F.sum((F.expr("event_id & 1") == 1).cast("long")).alias("n_odd"),
        F.countDistinct(F.expr("event_id & 255")).alias("n_low_bytes"),
        F.max(F.expr("event_id ^ 255")).alias("max_xor_mask"),
        F.min(F.shiftright("event_id", 4)).alias("min_shift4"),
    )


QUERIES = {
    "bitwise_functions": bitwise_functions,
    "percentile_stats": percentile_stats,
    "approx_percentile_stats": approx_percentile_stats,
    "stats_summary": stats_summary,
    "array_functions": array_functions,
    "q4_late_orders": q4_late_orders,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q8_market_share": q8_market_share,
    "q13_order_distribution": q13_order_distribution,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q22_no_order_customers": q22_no_order_customers,
    "json_functions": json_functions,
    "conditional_functions": conditional_functions,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_volume": q18_large_volume,
    "agg_grouping_sets": agg_grouping_sets,
    "window_analytics": window_analytics,
    "pivot_status_matrix": pivot_status_matrix,
    "orders_above_avg": orders_above_avg,
    "explode_tokens": explode_tokens,
    "session_window_events": session_window_events,
    "sliding_window_counts": sliding_window_counts,
}

ORACLE = {
    "bitwise_functions": """
        SELECT event_type,
               bit_and(event_id) AS band,
               bit_or(event_id) AS bor,
               bit_xor(event_id) AS bxor,
               CAST(sum(bit_count(event_id)) AS BIGINT) AS sum_popcount,
               CAST(sum(CASE WHEN (event_id & 1) = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_odd,
               count(DISTINCT event_id & 255) AS n_low_bytes,
               max(xor(event_id, 255)) AS max_xor_mask,
               min(event_id >> 4) AS min_shift4
        FROM events GROUP BY event_type
    """,
    "approx_percentile_stats": """
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, 0.25) AS p25,
               quantile_disc(l_extendedprice, 0.5) AS p50,
               quantile_disc(l_extendedprice, 0.95) AS p95,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "percentile_stats": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "stats_summary": """
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_rows,
               round(sx / n, 6) AS mean_qty,
               round((n * sxx - sx * sx) / (n * (n - 1)), 6) AS var_qty,
               round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 6) AS stddev_qty,
               round((n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
                   AS corr_qty_price
        FROM (
            SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
                   CAST(sum(CAST(l_quantity * l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
                   CAST((sum(CAST(floor(l_extendedprice) AS BIGINT)) + sum(CAST(round((l_extendedprice - floor(l_extendedprice)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS sy,
                   CAST((sum(CAST(floor(l_extendedprice * l_extendedprice) AS BIGINT)) + sum(CAST(round((l_extendedprice * l_extendedprice - floor(l_extendedprice * l_extendedprice)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS syy,
                   CAST((sum(CAST(floor(l_quantity * l_extendedprice) AS BIGINT)) + sum(CAST(round((l_quantity * l_extendedprice - floor(l_quantity * l_extendedprice)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
    """,
    "array_functions": """
        SELECT p_partkey,
               len(arr) AS arr_len,
               arr[1] AS first_elem,
               coalesce(array_to_string(arr[2:4], ','), '') AS mid_slice,
               list_contains(arr, 7) AS has7,
               CAST(list_aggregate(arr, 'sum') AS BIGINT) AS arr_sum,
               list_aggregate(arr, 'max') AS arr_max
        FROM (
            SELECT p_partkey, generate_series(1, p_size) AS arr
            FROM part WHERE p_partkey < 100
        )
    """,
    "q8_market_share": """
        SELECT year(o_orderdate) AS o_year,
               CAST((sum(CAST(floor(CASE WHEN ns.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) AS BIGINT)) + sum(CAST(round((CASE WHEN ns.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END - floor(CASE WHEN ns.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE)
               / CAST((sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) + sum(CAST(round((l_extendedprice * (1 - l_discount) - floor(l_extendedprice * (1 - l_discount))) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE)
                   AS mkt_share,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
    """,
    "q13_order_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders ON c_custkey = o_custkey
                                  AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q19_disjunctive_predicates": """
        SELECT CAST((sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) + sum(CAST(round((l_extendedprice * (1 - l_discount) - floor(l_extendedprice * (1 - l_discount))) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_no_order_customers": """
        SELECT c_mktsegment, count(*) AS numcust,
               CAST((sum(CAST(floor(c_acctbal) AS BIGINT)) + sum(CAST(round((c_acctbal - floor(c_acctbal)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST((sum(CAST(floor(c_acctbal) AS BIGINT)) + sum(CAST(round((c_acctbal - floor(c_acctbal)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) / count(*)
            FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    "json_functions": """
        SELECT event_type,
               CAST(sum(k) AS BIGINT) AS sum_k,
               count(*) FILTER (WHERE k % 2 = 0) AS n_even_k,
               min(k) AS min_k,
               max(k) AS max_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        ) GROUP BY event_type
    """,
    "conditional_functions": """
        SELECT o_orderkey,
               coalesce(nullif(o_orderstatus, 'P'), 'NOT_P') AS status_or_default,
               least(o_totalprice, 100000.0) AS capped_price,
               greatest(o_custkey % 7, o_custkey % 11) AS max_mod,
               CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band
        FROM orders WHERE o_orderkey < 1000
    """,
    "q4_late_orders": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT CAST((sum(CAST(floor(l_extendedprice * l_discount) AS BIGINT)) + sum(CAST(round((l_extendedprice * l_discount - floor(l_extendedprice * l_discount)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST((sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) + sum(CAST(round((l_extendedprice * (1 - l_discount) - floor(l_extendedprice * (1 - l_discount))) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST((sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) + sum(CAST(round((l_extendedprice * (1 - l_discount) - floor(l_extendedprice * (1 - l_discount))) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q14_promo_revenue": """
        SELECT 100.0 * CAST((sum(CAST(floor(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) AS BIGINT)) + sum(CAST(round((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END - floor(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE)
               / CAST((sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) + sum(CAST(round((l_extendedprice * (1 - l_discount) - floor(l_extendedprice * (1 - l_discount))) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE)
                   AS promo_revenue_pct,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
    "q17_small_quantity": """
        WITH li_b AS (
            SELECT l.* FROM lineitem l JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3'
        ),
        per_part AS (
            SELECT l_partkey AS a_partkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
                   count(*) AS n_li
            FROM li_b GROUP BY 1
        )
        SELECT CAST((sum(CAST(floor(l_extendedprice) AS BIGINT)) + sum(CAST(round((l_extendedprice - floor(l_extendedprice)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) / 7.0
                   AS avg_yearly,
               count(*) AS n_small
        FROM li_b JOIN per_part ON l_partkey = a_partkey
        WHERE l_quantity * n_li * 5 < sum_qty
    """,
    "q18_large_volume": """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM (
            SELECT l_orderkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING total_qty > 250
        )
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey ASC
        LIMIT 50
    """,
    "agg_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "window_analytics": """
        SELECT o_custkey, o_orderkey,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               lead(o_orderkey) OVER w AS next_orderkey,
               first_value(o_orderkey) OVER w AS first_orderkey
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "pivot_status_matrix": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "orders_above_avg": """
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST((sum(CAST(floor(o_totalprice) AS BIGINT)) + sum(CAST(round((o_totalprice - floor(o_totalprice)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_totalprice > (
            SELECT CAST((sum(CAST(floor(o_totalprice) AS BIGINT)) + sum(CAST(round((o_totalprice - floor(o_totalprice)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) / count(*)
            FROM orders
        ) * 1.5
        GROUP BY o_orderpriority
    """,
    "explode_tokens": """
        SELECT lang, token, n, rk FROM (
            SELECT lang, token, n,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n DESC, token ASC) AS rk
            FROM (
                SELECT lang, token, count(*) AS n
                FROM (
                    SELECT lang, unnest(list_filter(
                        string_split(lower(text), ' '),
                        x -> length(x) > 3)) AS token
                    FROM documents
                )
                GROUP BY lang, token
            )
        ) WHERE rk <= 10
    """,
    "session_window_events": f"""
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               min(ts) AS session_start,
               max(ts) AS session_end,
               count(*) AS n_events,
               min(event_id) AS first_event_id
        FROM (
            SELECT user_id, ts, event_id,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_idx
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN prev_epoch IS NULL
                                 OR epoch_s - prev_epoch > {SESSION_GAP_MIN * 60}
                            THEN 1 ELSE 0 END AS new_sess
                FROM (
                    SELECT user_id, ts, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
                           lag(CAST(floor(epoch(ts)) AS BIGINT))
                               OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               AS prev_epoch
                    FROM events
                )
            )
        )
        GROUP BY user_id, session_idx
    """,
    "sliding_window_counts": f"""
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                   + to_seconds({SLIDE_MIN * 60} * (CAST(floor(epoch(ts) / {SLIDE_MIN * 60}) AS BIGINT) - g))
                   AS window_start,
               TIMESTAMP '1970-01-01 00:00:00'
                   + to_seconds({SLIDE_MIN * 60} * (CAST(floor(epoch(ts) / {SLIDE_MIN * 60}) AS BIGINT) - g) + {SLIDE_WINDOW_MIN * 60})
                   AS window_end,
               count(*) AS n_events,
               CAST((sum(CAST(floor(value) AS BIGINT)) + sum(CAST(round((value - floor(value)) * 1000000.0) AS BIGINT)) / 1000000.0) AS DOUBLE) / count(*) AS avg_value
        FROM events CROSS JOIN (SELECT 0 AS g UNION ALL SELECT 1) grid
        GROUP BY 1, 2
    """,
}
