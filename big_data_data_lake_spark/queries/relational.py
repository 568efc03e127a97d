"""Relational core queries (SURVEY §2.2-§2.6) — scan / filter / join /
aggregate / sort / limit, each with a DuckDB oracle.

Every query is the idiomatic Catalyst plan: filters and projections
push into the parquet scan, dimensions broadcast, aggregates are
partial+final hash aggregates, every LIMIT sits on a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import scoped_persist
from ..functions.geo import infer_continent, infer_continent_ref
from ..functions.money import (
    exact_avg,
    exact_sum,
    exact_sum_units,
    sql_exact_avg,
    sql_exact_sum,
    sql_units,
    units,
)
from ..operators import aggregations as agg
from ..operators import filters as flt
from ..operators import joins as jn
from ..operators import transforms as tr
from ..operators import windows as win
from ..sources.catalog import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: "country intelligence" (SURVEY §7 Phase 1, app.py:341-352)
# --------------------------------------------------------------------------

COUNTRY_INTELLIGENCE_ORACLE = f"""
SELECT n_name,
       count(o_orderkey) AS num_orders,
       {sql_exact_avg("o_totalprice")} AS avg_totalprice,
       {sql_exact_avg("c_acctbal")} AS avg_acctbal
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY num_orders DESC, n_name
LIMIT 10
"""


@register("country_intelligence", COUNTRY_INTELLIGENCE_ORACLE)
def country_intelligence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+J1+O1 — per-country traffic intelligence (app.py:341-352):
    fact x two broadcast dims -> named multi-agg -> top-10.

    Scale: nation (25 rows) and customer (1.5% of lineitem volume)
    broadcast; the orders fact never shuffles before the partial agg.
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("o_orderkey").alias("num_orders"),
            # exact integer-cent avg (r9: order-invariant money class)
            exact_avg("o_totalprice").alias("avg_totalprice"),
            exact_avg("c_acctbal").alias("avg_acctbal"),
        )
        .orderBy(F.desc("num_orders"), F.asc("n_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Aggregation surface (A1-A10)
# --------------------------------------------------------------------------

PRICING_SUMMARY_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_exact_sum("l_quantity")} AS sum_qty,
       {sql_exact_sum("l_extendedprice")} AS sum_base_price,
       {sql_exact_sum("l_extendedprice * (1 - l_discount)", 10000)} AS sum_disc_price,
       {sql_exact_avg("l_quantity")} AS avg_qty,
       {sql_exact_avg("l_extendedprice")} AS avg_price,
       {sql_exact_avg("l_discount", 100, 4)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", PRICING_SUMMARY_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A5-shaped pricing summary (TPC-H Q1 pattern; the reference's
    KPI block app.py:234-239 generalized). One partial+final hash agg
    over a pushed-down date filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact integer-unit sums/avgs (r9: order-invariant money
            # class — cents for bare 2-dec columns, 1e-4 units for the
            # price x discount product; functions/money.py)
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("sum_disc_price"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount", 100, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


TOP_EVENT_TYPES_ORACLE = """
SELECT event_type, count(*) AS n
FROM events
GROUP BY event_type
ORDER BY n DESC, event_type
LIMIT 3
"""


@register("top_event_types", TOP_EVENT_TYPES_ORACLE)
def top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — value_counts top-k (dashboard.py:173-183), deterministic
    under ties via key tiebreak."""
    return agg.top_k_counts(_t(spark, sf_dir, "events"), "event_type", k=3)


HOURLY_EVENT_COUNTS_ORACLE = """
SELECT event_type, hour(ts) AS hr, count(*) AS n
FROM events
GROUP BY event_type, hour(ts)
"""


@register("hourly_event_counts", HOURLY_EVENT_COUNTS_ORACLE)
def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+P6/P7 — multi-key count over a derived hour column
    (dashboard.py:90,229-233)."""
    ev = _t(spark, sf_dir, "events").withColumn("hr", tr.extract_hour("ts"))
    return agg.multi_key_counts(ev, ["event_type", "hr"])


GLOBAL_KPIS_ORACLE = """
SELECT count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_types,
       round(max(value), 2) AS max_value,
       round(min(value), 2) AS min_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
FROM events
"""


@register("global_kpis", GLOBAL_KPIS_ORACLE)
def global_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6/A9 — the KPI banner row (app.py:234-239,121-137): global
    count / distinct / extrema / time extent in one partial+final agg."""
    ev = _t(spark, sf_dir, "events")
    return agg.kpis(
        ev,
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("min_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
    )


MODE_EVENT_TYPE_ORACLE = """
SELECT event_type
FROM events
GROUP BY event_type
ORDER BY count(*) DESC, event_type
LIMIT 1
"""


@register("mode_event_type", MODE_EVENT_TYPE_ORACLE)
def mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — most frequent value with pinned tie-break (app.py:499-511)."""
    return agg.mode_of(_t(spark, sf_dir, "events"), "event_type")


EVENT_TYPE_DOMAIN_ORACLE = "SELECT DISTINCT event_type FROM events ORDER BY event_type"


@register("event_type_domain", EVENT_TYPE_DOMAIN_ORACLE)
def event_type_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — sorted distinct domain (app.py:151)."""
    return agg.distinct_values(_t(spark, sf_dir, "events"), "event_type")


# --------------------------------------------------------------------------
# Joins (J1-J3 + semi/anti extensions)
# --------------------------------------------------------------------------

BRAND_REVENUE_ORACLE = f"""
SELECT p_brand,
       count(*) AS n_items,
       {sql_exact_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue
FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand
LIMIT 10
"""


@register("brand_revenue", BRAND_REVENUE_ORACLE)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — fact x broadcast dimension enrichment join
    (process_silver.py:111) feeding a grouped revenue rollup. The
    100 TB fact side never shuffles for the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    enriched = jn.enrich(li, part.select("l_partkey", "p_brand"), "l_partkey")
    return (
        enriched.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # exact 1e-4-unit sum (r9: order-invariant money class)
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
        .limit(10)
    )


FIRST_MATCH_ENRICHMENT_ORACLE = """
WITH dim AS (
    SELECT s_nationkey, s_name,
           row_number() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn
    FROM supplier
)
SELECT s_name, count(*) AS n_customers
FROM customer
JOIN dim ON c_nationkey = s_nationkey AND rn = 1
GROUP BY s_name
ORDER BY n_customers DESC, s_name
"""


@register("first_match_enrichment", FIRST_MATCH_ENRICHMENT_ORACLE)
def first_match_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — duplicate-key dimension, first match wins
    (consumer.py:88-98 ``iloc[0]``). The dimension is reduced to one
    deterministic row per key (min surrogate) before the broadcast
    join, so fact rows never fan out."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    dim = (
        win.first_per_key(
            supp.select("s_nationkey", "s_suppkey", "s_name"),
            "s_nationkey",
            "s_suppkey",
        )
        .drop("s_suppkey")
        .withColumnRenamed("s_nationkey", "c_nationkey")
    )
    return (
        jn.enrich(cust, dim, "c_nationkey", how="inner")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.asc("s_name"))
    )


UNION_SEGMENTS_ORACLE = f"""
WITH unioned AS (
    SELECT event_type, value FROM events WHERE user_id % 2 = 0
    UNION ALL
    SELECT event_type, value FROM events WHERE user_id % 2 = 1
)
SELECT event_type, count(*) AS n, {sql_exact_sum("value")} AS total_value
FROM unioned
GROUP BY event_type
"""


@register("union_segments", UNION_SEGMENTS_ORACLE)
def union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — pd.concat over file batches (dashboard.py:65) as a by-name
    union; the two branches share one scan via Catalyst."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "user_id")
    halves = [
        ev.where(F.col("user_id") % 2 == 0),
        ev.where(F.col("user_id") % 2 == 1),
    ]
    return (
        jn.union_all([h.drop("user_id") for h in halves])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").alias("total_value"),
        )
    )


CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("customers_without_orders", CUSTOMERS_WITHOUT_ORDERS_ORACLE)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (SURVEY §2.4 free extension) — NOT EXISTS as a
    broadcast anti join, grouped."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        jn.anti(cust, orders, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


SUPPLIERS_WITH_SHIPMENTS_ORACLE = """
SELECT n_name, count(*) AS n_suppliers
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
GROUP BY n_name
ORDER BY n_name
"""


@register("suppliers_with_shipments", SUPPLIERS_WITH_SHIPMENTS_ORACLE)
def suppliers_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS) + broadcast dim join, grouped."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("s_suppkey"))
    return (
        jn.enrich(jn.semi(supp, li, "s_suppkey"), nation, "s_nationkey", how="inner")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Filters / predicates (F1-F8)
# --------------------------------------------------------------------------

MEMBERSHIP_RANGE_FILTER_ORACLE = f"""
SELECT event_type, count(*) AS n, {sql_exact_sum("value")} AS total_value
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
  AND value BETWEEN 10 AND 250
GROUP BY event_type
ORDER BY event_type
"""


@register("membership_range_filter", MEMBERSHIP_RANGE_FILTER_ORACLE)
def membership_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F3 — isin + between, composed and pushed into the scan
    (app.py:215-222)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(
            flt.membership("event_type", ["click", "view", "purchase"])
            & flt.in_range("value", 10, 250)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


SUSPICIOUS_EVENTS_ORACLE = """
SELECT event_type, count(*) AS n_suspicious
FROM events
WHERE event_type <> 'signup'
  AND (value < 5 OR value > 300 OR regexp_extract(props, '"k": ([0-9]+)', 1) = '0')
GROUP BY event_type
ORDER BY event_type
"""


@register("suspicious_events", SUSPICIOUS_EVENTS_ORACLE)
def suspicious_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F6 — compound OR anomaly predicate (app.py:317-325), with a
    string-extraction guard standing in for the null-coordinate check."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1)
    pred = (F.col("event_type") != "signup") & (
        (F.col("value") < 5) | (F.col("value") > 300) | (k == "0")
    )
    return (
        ev.where(pred)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_suspicious"))
        .orderBy("event_type")
    )


NULL_FILL_DROP_ORACLE = f"""
WITH masked AS (
    SELECT event_type,
           CASE WHEN value > 300 THEN NULL ELSE value END AS v
    FROM events
)
SELECT event_type,
       count(v) AS n_present,
       count(*) - count(v) AS n_missing,
       {sql_exact_sum("coalesce(v, 0.0)")} AS filled_sum
FROM masked
GROUP BY event_type
ORDER BY event_type
"""


@register("null_fill_drop", NULL_FILL_DROP_ORACLE)
def null_fill_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5/F6 — fillna/dropna semantics (process_silver.py:247-248,
    dashboard.py:68) over a synthesized null column (the lake tables
    are null-free, so nulls are masked in)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("value") > 300, F.lit(None)).otherwise(F.col("value"))
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("v").alias("n_present"),
            (F.count(F.lit(1)) - F.count("v")).alias("n_missing"),
            exact_sum(F.coalesce(F.col("v"), F.lit(0.0))).alias("filled_sum"),
        )
        .orderBy("event_type")
    )


JSON_PROPS_EXTRACT_ORACLE = """
SELECT event_type,
       round(avg(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)), 2) AS avg_k,
       max(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("json_props_extract", JSON_PROPS_EXTRACT_ORACLE)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the raw JSON payload column —
    the bronze-zone parse (consumer.py:57) as a column expression."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 2).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Scalar transforms (P9-P13)
# --------------------------------------------------------------------------

VALUE_BANDS_ORACLE = """
SELECT CASE
         WHEN value > 0 AND value <= 50 THEN 'low'
         WHEN value > 50 AND value <= 150 THEN 'mid'
         WHEN value > 150 AND value <= 250 THEN 'high'
         WHEN value > 250 AND value <= 1000 THEN 'extreme'
       END AS band,
       count(*) AS n
FROM events
GROUP BY 1
ORDER BY band NULLS FIRST
"""


@register("value_bands", VALUE_BANDS_ORACLE)
def value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — pd.cut numeric binning (app.py:246-250) as a when-chain."""
    ev = _t(spark, sf_dir, "events")
    band = tr.bucketize("value", [0, 50, 150, 250, 1000], ["low", "mid", "high", "extreme"])
    return (
        ev.withColumn("band", band)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("band"))
    )


MARKER_SIZES_ORACLE = f"""
SELECT event_type,
       {sql_exact_avg("least(greatest(value / 1000.0 + 5.0, 5.0), 20.0)", 100000, 4)}
           AS avg_marker
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("marker_sizes", MARKER_SIZES_ORACLE)
def marker_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/P12/P13 — clip + arithmetic derive (app.py:244-245,451-455)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("m", tr.marker_size("value"))
        .groupBy("event_type")
        # marker = clip(value/1000 + 5, [5, 20]) over a 2-decimal
        # value: an exact multiple of 1e-5, so 1e-5 integer units make
        # the mean order-invariant (r9 money-avg class)
        .agg(exact_avg("m", 100000, 4).alias("avg_marker"))
        .orderBy("event_type")
    )


CONTINENT_CLASSIFICATION_ORACLE = """
WITH coords AS (
    SELECT (event_id % 12000) / 100.0 - 60.0 AS lat,
           (event_id * 7 % 36000) / 100.0 - 180.0 AS lon
    FROM events
)
SELECT CASE
         WHEN lat IS NULL OR lon IS NULL THEN 'Unknown'
         WHEN lat > 35 AND lat < 72 AND lon > -25 AND lon < 65 THEN 'Europe'
         WHEN lat > 5 AND lat < 55 AND lon > 65 AND lon < 180 THEN 'Asia'
         WHEN lat > -35 AND lat < 37 AND lon > -20 AND lon < 52 THEN 'Africa'
         WHEN lat > 15 AND lat < 72 AND lon > -170 AND lon < -50 THEN 'North America'
         WHEN lat > -57 AND lat < 13 AND lon > -82 AND lon < -34 THEN 'South America'
         WHEN lat > -50 AND lat < -10 AND lon > 110 AND lon < 180 THEN 'Oceania'
         ELSE 'Other'
       END AS continent,
       count(*) AS n
FROM coords
GROUP BY 1
ORDER BY continent
"""


@register("continent_classification", CONTINENT_CLASSIFICATION_ORACLE)
def continent_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — the 7-branch lat/lon→continent rule chain
    (dashboard.py:94-114) as one codegen'd when-tree; coordinates are
    derived deterministically from the surrogate key since the lake
    tables carry no geo columns.

    NOTE (r7 verdict, What's wrong #1): this variant's boxes/branch
    order DIVERGE from the reference's — see the
    functions.geo.infer_continent docstring for the worked example.
    continent_classification_ref below is the reference-exact twin."""
    ev = _t(spark, sf_dir, "events")
    lat = (F.col("event_id") % 12000) / 100.0 - 60.0
    lon = (F.col("event_id") * 7 % 36000) / 100.0 - 180.0
    return (
        ev.withColumn("continent", infer_continent(lat, lon))
        .groupBy("continent")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("continent")
    )


CONTINENT_CLASSIFICATION_REF_ORACLE = """
WITH coords AS (
    SELECT (event_id % 12000) / 100.0 - 60.0 AS lat,
           (event_id * 7 % 36000) / 100.0 - 180.0 AS lon
    FROM events
)
SELECT CASE
         WHEN lon >= -170 AND lon <= -30 AND lat >= 5 AND lat <= 85
             THEN 'North America'
         WHEN lon >= -85 AND lon <= -30 AND lat >= -60 AND lat <= 15
             THEN 'South America'
         WHEN lon >= -10 AND lon <= 60 AND lat >= 35 AND lat <= 72
             THEN 'Europe'
         WHEN lon >= -20 AND lon <= 55 AND lat >= -35 AND lat <= 35
             THEN 'Africa'
         WHEN lon >= 60 AND lon <= 180 AND lat >= -10 AND lat <= 55
             THEN 'Asia'
         WHEN lon >= 110 AND lon <= 180 AND lat >= -50 AND lat <= 0
             THEN 'Oceania'
         ELSE 'Other'
       END AS continent,
       count(*) AS n
FROM coords
GROUP BY 1
ORDER BY continent
"""


@register("continent_classification_ref", CONTINENT_CLASSIFICATION_REF_ORACLE)
def continent_classification_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9, reference-exact parity twin (dashboard.py:94-114, r7
    verdict item #5): the reference's infer_continent VERBATIM —
    North-America-first branch order, INCLUSIVE box bounds, NaN falls
    through to 'Other' — over the same surrogate-key coordinates as
    continent_classification, so the two queries' outputs directly
    exhibit the divergence the original variant documents (e.g.
    (lat 40, lon -20): 'Europe' there, 'Other' here)."""
    ev = _t(spark, sf_dir, "events")
    lat = (F.col("event_id") % 12000) / 100.0 - 60.0
    lon = (F.col("event_id") * 7 % 36000) / 100.0 - 180.0
    return (
        ev.withColumn("continent", infer_continent_ref(lat, lon))
        .groupBy("continent")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("continent")
    )


# --------------------------------------------------------------------------
# Window functions / sorts / pivot / rollup
# --------------------------------------------------------------------------

LATEST_EVENT_PER_USER_ORACLE = """
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM (
    SELECT *,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
"""


@register("latest_event_per_user", LATEST_EVENT_PER_USER_ORACLE)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 (batch) — latest-wins dedup per key (producer.py:89-96):
    one shuffle on the key, row_number prune."""
    ev = _t(spark, sf_dir, "events")
    return win.latest_per_key(ev, "user_id", "ts", tiebreak="event_id").select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


TOPK_ORDERS_PER_SEGMENT_ORACLE = """
SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS totalprice
FROM (
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rn <= 3
"""


@register("topk_orders_per_segment", TOPK_ORDERS_PER_SEGMENT_ORACLE)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (O1 generalized) — broadcast dim join then a
    single window shuffle."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return win.topk_per_group(
        joined, ["c_mktsegment"], "o_totalprice", k=3, tiebreak="o_orderkey"
    ).select(
        "c_mktsegment",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


ORDER_PRIORITY_PIVOT_ORACLE = """
SELECT o_orderstatus,
       count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p_urgent,
       count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p_high,
       count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p_medium,
       count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p_notspec,
       count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p_low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("order_priority_pivot", ORDER_PRIORITY_PIVOT_ORACLE)
def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (SURVEY §2.5 free extension) — explicit value list so no
    discovery pass; missing cells coalesce to 0 to match COUNT."""
    orders = _t(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
    )
    renames = {
        "1-URGENT": "p_urgent",
        "2-HIGH": "p_high",
        "3-MEDIUM": "p_medium",
        "4-NOT SPECIFIED": "p_notspec",
        "5-LOW": "p_low",
    }
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{src}`"), F.lit(0)).alias(dst) for src, dst in renames.items()
    ]
    return pivoted.select(*cols).orderBy("o_orderstatus")


LINEITEM_ROLLUP_ORACLE = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       {sql_exact_sum("l_quantity")} AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@register("lineitem_rollup", LINEITEM_ROLLUP_ORACLE)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2.5 free extension) — one
    expand+aggregate, no extra scans."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


USERS_INTERSECT_ORACLE = """
SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr
FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr
FROM events WHERE event_type = 'purchase'
ORDER BY user_id, hr
"""


@register("users_intersect", USERS_INTERSECT_ORACLE)
def users_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op INTERSECT (extension per SURVEY §2.10) at (user, hour)
    grain: hours in which a user both clicked and purchased. Plans as
    distinct aggregates + a semi join — one shuffle per side."""
    ev = _t(spark, sf_dir, "events")
    hr = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hr")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", hr)
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", hr)
    return clicks.intersect(buys).orderBy("user_id", "hr")


USERS_EXCEPT_ORACLE = """
SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr
FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr
FROM events WHERE event_type = 'error'
ORDER BY user_id, hr
"""


@register("users_except", USERS_EXCEPT_ORACLE)
def users_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op EXCEPT at (user, hour) grain: hours where a user clicked
    without erroring — the distinct anti-join shape."""
    ev = _t(spark, sf_dir, "events")
    hr = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hr")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", hr)
    errs = ev.where(F.col("event_type") == "error").select("user_id", hr)
    return clicks.subtract(errs).orderBy("user_id", "hr")


ORDERS_CUBE_ORACLE = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n,
       {sql_exact_sum("o_totalprice")} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
"""


@register("orders_cube", ORDERS_CUBE_ORACLE)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (SURVEY §2.5 free extension): all 2^2 grouping
    sets in one pass — Spark expands grouping sets map-side, so it
    still shuffles once."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total_price",
        )
        .orderBy("orderstatus", "orderpriority")
    )


EVENT_GAPS_ORACLE = """
WITH g AS (
    SELECT user_id,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) AS gap_us
    FROM events
)
SELECT user_id,
       count(gap_us) AS n_gaps,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us
FROM g
GROUP BY user_id
ORDER BY user_id
"""


@register("event_gaps", EVENT_GAPS_ORACLE)
def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag window functions: per-user inter-event gap profile.
    One shuffle on user_id; the window sort is reused by the
    aggregation (same partitioning)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn(
        "gap_us", F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.max("gap_us").alias("max_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
        )
        .orderBy("user_id")
    )


FILE_TS_PARSE_ORACLE = """
SELECT fname,
       strftime(strptime(substr(fname, 11, 15), '%Y%m%d_%H%M%S'),
                '%Y-%m-%d %H:%M:%S') AS file_ts
FROM (
    SELECT 'processed_' || strftime(ts, '%Y%m%d_%H%M%S') || '.csv' AS fname
    FROM events
    WHERE event_id < 20
)
ORDER BY fname
"""


@register("file_ts_parse", FILE_TS_PARSE_ORACLE)
def file_ts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — the reference embeds state in filenames
    (``processed_<yyyyMMdd_HHmmss>.csv``, consumer.py:121) and parses
    it back downstream (dashboard.py:73-85). Round-trip both
    directions as codegen'd expressions: format a name from the event
    time, then parse the embedded timestamp back out."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 20)
    named = ev.select(
        F.concat(
            F.lit("processed_"),
            F.date_format("ts", "yyyyMMdd_HHmmss"),
            F.lit(".csv"),
        ).alias("fname")
    )
    return named.select(
        "fname",
        F.date_format(
            F.to_timestamp(F.substring("fname", 11, 15), "yyyyMMdd_HHmmss"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("file_ts"),
    ).orderBy("fname")


SHIPPING_PRIORITY_ORACLE = f"""
SELECT l.l_orderkey,
       {sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 10000)} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("shipping_priority", SHIPPING_PRIORITY_ORACLE)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the canonical dim->fact->fact join pipeline:
    segment-filtered customers (small after the pushed-down predicate)
    BROADCAST into orders, the surviving orders equi-join lineitem on
    the key both sides can co-partition on, one partial-aggregated
    revenue rollup, top-10 via TakeOrderedAndProject. Both date
    predicates reach the parquet scans (PushedFilters); at 100 TB the
    orders->lineitem join is the only data-scale shuffle."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(
            o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")).select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


VALUE_DECILES_ORACLE = """
WITH d AS (
    SELECT o_totalprice, ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
    FROM orders
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM d
GROUP BY decile
ORDER BY decile
"""


def _value_deciles_plan(spark: SparkSession, sf_dir: str):
    """The lazy decile plan (exposed for plan tests): exact ntile(10)
    semantics WITHOUT Spark's single-partition window — range exchange
    + per-partition row_number + broadcast prefix offsets
    (``windows.global_rank``), then row-local bucket arithmetic
    (``windows.exact_ntile``). Returns ``(df, release)``; caller must
    materialize before calling ``release``."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked, total, release = win.global_rank(
        o, ["o_totalprice", "o_orderkey"], rank_col="__rank"
    )
    decile = win.exact_ntile(F.col("__rank"), total, 10)
    df = (
        ranked.select(decile.alias("decile"), "o_totalprice")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decile")
    )
    return df, release


@register("value_deciles", VALUE_DECILES_ORACLE)
def value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding with exact ntile semantics (deterministic total
    order with key tiebreak) + per-band stats — the distribution
    profile behind price/value segmentation. Round 2's unpartitioned
    ``ntile`` window moved every row to ONE task; this round computes
    the same result with a parallel range exchange + per-partition
    ranks + driver prefix sums (one metadata-scale collect), so the
    plan has no single-partition exchange and survives 100 TB. The
    10-row band summary is materialized eagerly so the range-bound
    cache can be released (no persist leak)."""
    df, release = _value_deciles_plan(spark, sf_dir)
    try:
        rows = df.collect()
    finally:
        release()
    return spark.createDataFrame(rows, df.schema).orderBy("decile")


LOCAL_SUPPLIER_VOLUME_ORACLE = f"""
SELECT n.n_name AS nation,
       {sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 10000)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@register("local_supplier_volume", LOCAL_SUPPLIER_VOLUME_ORACLE)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the six-table join graph: region→nation
    collapse to a tiny broadcast dim chain; customer and supplier each
    broadcast their nation filter; the only data-scale shuffle is
    orders⋈lineitem on the order key. The same-nation condition
    (customer's and supplier's nation must match) rides the join
    instead of a post-filter, so Catalyst prunes non-local pairs
    before the aggregate."""
    cutoff_lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cutoff_hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name"))),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "c_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_nationkey") == F.col("c_nationkey"))  # local supplier
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


RETURNED_ITEM_REPORT_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       {sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 10000)} AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("returned_item_report", RETURNED_ITEM_REPORT_ORACLE)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — who returns the most revenue: the returnflag
    predicate pushes into the lineitem scan, orders⋈lineitem is the
    one data-scale shuffle, customers and nations broadcast, top-20
    via TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


LARGE_VOLUME_ORDERS_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       round(o.o_totalprice, 2) AS total_price,
       round(t.qty_cents / 100.0, 2) AS total_qty
FROM orders o
JOIN (
    SELECT l_orderkey, sum({sql_units("l_quantity")}) AS qty_cents
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum({sql_units("l_quantity")}) > 30000
) t ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_price DESC, o.o_orderkey
LIMIT 100
"""


@register("large_volume_orders", LARGE_VOLUME_ORDERS_ORACLE)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — the HAVING / aggregate-subquery pattern: the
    per-order quantity rollup shrinks lineitem to one row per order,
    the HAVING predicate shrinks THAT to a handful of hot orders, and
    the survivors broadcast into orders and then customer — so neither
    fact table is re-scanned per group and the only data-scale shuffle
    is the rollup on l_orderkey. At 100 TB this is the canonical
    "filter on an aggregate" plan: partial map-side sums, tiny
    broadcast semi-join back against the facts."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # exact integer-cent rollup so the HAVING threshold can never flip
    # on float drift when a per-order sum lands exactly on 300.00
    big = (
        li.groupBy("l_orderkey")
        .agg(exact_sum_units("l_quantity").alias("qty_cents"))
        .where(F.col("qty_cents") > 30000)
    )
    hot = o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
    return (
        c.join(F.broadcast(hot), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.round(F.col("qty_cents") / F.lit(100.0), 2).alias("total_qty"),
        )
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(100)
    )


CHEAPEST_SUPPLIER_PER_PART_ORACLE = """
SELECT DISTINCT l.l_partkey AS partkey,
       s.s_name AS supplier,
       round(l.l_extendedprice, 2) AS price
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE l.l_extendedprice = (
    SELECT min(l2.l_extendedprice)
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
)
ORDER BY partkey, supplier, price
"""


@register("cheapest_supplier_per_part", CHEAPEST_SUPPLIER_PER_PART_ORACLE)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the correlated min-per-group subquery
    ("the supplier(s) offering each part at its minimum price"),
    decorrelated the way Catalyst itself would: a min() window over
    the part key (ONE shuffle on l_partkey, no join-back, no re-scan
    per group), filter rows at the group minimum, then broadcast the
    supplier dim. Ties keep every minimum-price supplier, exactly the
    correlated =-subquery semantics; DISTINCT collapses repeat
    (part, supplier, price) lineitems."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy("l_partkey")
    at_min = li.withColumn("__min_price", F.min("l_extendedprice").over(w)).where(
        F.col("l_extendedprice") == F.col("__min_price")
    )
    return (
        at_min.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("s_name").alias("supplier"),
            F.round("l_extendedprice", 2).alias("price"),
        )
        .distinct()
        .orderBy("partkey", "supplier", "price")
    )


LATE_ORDER_PRIORITY_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("late_order_priority_counts", LATE_ORDER_PRIORITY_ORACLE)
def late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — the correlated EXISTS: count orders per
    priority that had at least one lineitem shipped more than 60 days
    after the order date. The EXISTS decorrelates to a LEFT SEMI hash
    join on l_orderkey with the lateness predicate as a join residual
    — each order is emitted at most once no matter how many late
    lineitems it has, nothing is re-scanned per group, and the only
    data-scale shuffle is the semi join's key exchange (the date
    filter prunes orders at the scan first). The SHUFFLE_HASH hint
    pins that shape (r9: the round's drift triage caught the
    optimizer BROADCASTING the 2-column lineitem projection under the
    box-tuned 256 MB threshold — a fact-table broadcast whose build
    cost cliffed 4.6x at sf1 and which is exactly the plan you must
    never ship against a 100 TB fact side; the hint restores the
    key-exchange semi join the docstring always claimed).
    Reference parity: the filter→group→count shape of app.py's
    priority breakdowns over the medallion tables."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li.hint("SHUFFLE_HASH"), late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


CUSTOMER_ORDER_DISTRIBUTION_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey,
           CAST(coalesce(o.cnt, 0) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt
        FROM orders
        WHERE o_orderpriority <> '1-URGENT'
        GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("customer_order_distribution", CUSTOMER_ORDER_DISTRIBUTION_ORACLE)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the outer-join distribution: how many
    customers placed exactly N (non-urgent) orders, INCLUDING the
    zero-order customers an inner join would silently drop.

    Scale shape: orders pre-aggregates to per-custkey counts BEFORE
    the join (partial+final hash agg — the fact table collapses to at
    most |customer| rows map-side), so the left join moves counts, not
    orders. Both join sides exchange on custkey once; the second
    aggregation's domain is the distinct order-count (tiny). The
    priority filter must live BEFORE the pre-agg, never as a post-join
    WHERE — a WHERE on the outer side would turn the left join back
    into an inner one and drop the zero bucket.

    Reference parity: the per-user activity histograms of app.py's
    engagement panel, kept outer so silent users are counted."""
    per_cust = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


DISJUNCTIVE_REVENUE_ORACLE = f"""
SELECT {sql_exact_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue,
       CAST(count(*) AS BIGINT) AS matched_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


@register("disjunctive_revenue", DISJUNCTIVE_REVENUE_ORACLE)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — the disjunctive predicate: revenue over three
    OR'd (brand x size x quantity) branches spanning both join sides.

    The scale point is what Catalyst does with the OR: it cannot push
    the whole disjunction to either scan, but it CAN push the
    per-table weakenings — (qty in 1-11 OR 10-20 OR 20-30) prunes the
    lineitem scan and (brand=12 AND size<=15 OR ...) prunes the part
    scan — before the broadcast hash join evaluates the exact
    cross-table residual. Writing the filter as one expression (not
    three unioned scans) is what keeps it a single pass over lineitem.

    Reference parity: app.py's multi-checkbox brand/size dashboards,
    whose pandas mask is exactly this OR of conjunctions."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def branch(brand: str, max_size: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )

    cond = (
        branch("Brand#12", 15, 1, 11)
        | branch("Brand#23", 25, 10, 20)
        | branch("Brand#34", 35, 20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
            F.count(F.lit(1)).alias("matched_lines"),
        )
    )


IDLE_RICH_CUSTOMERS_ORACLE = """
WITH pool AS (
    SELECT c_custkey, c_mktsegment,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
),
thr AS (
    SELECT CAST(sum(bal_cents) AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM pool WHERE bal_cents > 0
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
FROM pool, thr
WHERE bal_cents * n > total_cents
  AND NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = pool.c_custkey
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("idle_rich_customers", IDLE_RICH_CUSTOMERS_ORACLE)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar subquery + NOT EXISTS: customers in
    three segments whose balance beats the positive-balance average
    and who never placed an order.

    Two decorrelations: the scalar average is a 1-row aggregate
    broadcast back over the pool (no driver collect, no re-scan per
    row), and the NOT EXISTS is a LEFT ANTI hash join on custkey. The
    average threshold compares in EXACT integer cents via
    cross-multiplication (bal*n > total) — no float average crosses
    the engine boundary, so boundary rows can't flip on a ulp. Scale:
    the anti join is the only data-scale shuffle; the 1-row threshold
    is a broadcast nested loop over one row (metadata-scale).

    Reference parity: app.py's dormant-account panel (balance filter +
    "no activity" mask)."""
    pool = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "HOUSEHOLD"))
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
        )
    )
    thr = (
        pool.where(F.col("bal_cents") > 0)
        .agg(
            F.sum("bal_cents").cast("bigint").alias("total_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        pool.join(F.broadcast(thr))
        .where(F.col("bal_cents") * F.col("n") > F.col("total_cents"))
        .join(orders, pool.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").cast("bigint").alias("total_bal_cents"),
        )
        .orderBy("segment")
    )


NATION_TRADE_FLOWS_ORACLE = f"""
SELECT supp_nation, cust_nation, ship_year,
       {sql_exact_sum("volume", 10000)} AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
)
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


@register("nation_trade_flows", NATION_TRADE_FLOWS_ORACLE)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume: revenue shipped between
    a pair of nations, split by direction and ship year.

    The scale move is pushing the nation-pair filter into BOTH dims
    before any fact join: supplier and customer are each pre-joined to
    the 2-row filtered nation dim (broadcast), shrinking them to ~8 %
    before lineitem sees them — so the only data-scale exchange is the
    lineitem<->orders orderkey join. The cross-table pair disjunction
    stays a residual AFTER the joins (it spans both sides, so it
    cannot push further than the per-side IN filters already did).

    Reference parity: app.py's origin/destination flow matrix panels.
    """
    pair = ("NATION_3", "NATION_8")
    n1 = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


MARKET_SHARE_BY_YEAR_ORACLE = f"""
SELECT ship_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN u ELSE 0 END)
             / CAST(sum(u) AS DOUBLE), 6) AS mkt_share,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN u ELSE 0 END) / 10000.0, 2)
           AS nation_volume,
       round(sum(u) / 10000.0, 2) AS total_volume
FROM (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS ship_year,
           n1.n_name AS supp_nation,
           {sql_units("l_extendedprice * (1 - l_discount)", 10000)} AS u
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region    ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
)
GROUP BY ship_year
ORDER BY ship_year
"""


@register("market_share_by_year", MARKET_SHARE_BY_YEAR_ORACLE)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — market share: one nation's fraction of ECONOMY
    part revenue sold into ASIA customers, by order year. The
    conditional-numerator / unconditional-denominator pattern computes
    both in ONE aggregation pass (sum(CASE) + sum), never two jobs.

    The share divides two EXACT integer 1e-4-unit sums (then rounds
    the quotient): integer accumulation is order-invariant, so the
    ratio is a pure function of values both engines agree on bit-for-
    bit — no ulp of summation order can flip the 6th decimal (r9
    rewrite of the pre-rounded-double form). Scale: part/supplier/nation/region all
    broadcast (part pre-filtered by type); customer pre-joined to the
    ASIA nation subset; the orderkey join is the one data exchange.

    Reference parity: app.py's share-of-segment trend chart."""
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    asia = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    u = units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    nat_units = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", u).otherwise(F.lit(0))
    )
    tot_units = F.sum(u)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("ship_year"))
        .agg(
            F.round(nat_units / tot_units, 6).alias("mkt_share"),
            F.round(nat_units / F.lit(10000.0), 2).alias("nation_volume"),
            F.round(tot_units / F.lit(10000.0), 2).alias("total_volume"),
        )
        .orderBy("ship_year")
    )


NATION_PRODUCT_PROFIT_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(round((l_extendedprice * (1 - l_discount)
                             - p_retailprice * l_quantity * 0.10) * 10000, 0)
                      AS BIGINT)) / 10000.0, 2) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


@register("nation_product_profit", NATION_PRODUCT_PROFIT_ORACLE)
def nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and
    order year, with a substring filter on part name. Cost is proxied
    as 10 % of retail price x quantity (this schema carries no
    partsupp table / ps_supplycost; documented deviation).

    The LIKE '%gear%' is a non-prefix substring, so it cannot become a
    parquet pushed filter — but it DOES prune the broadcast-side part
    dim before the join, which is where it matters: the fact rows that
    survive are those whose join key finds a partner. part, supplier,
    nation broadcast; the orderkey join is the one shuffle; one
    partial+final agg on a (25 x years) domain.

    Reference parity: app.py's per-origin margin breakdown."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # integer 1e-4-dollar units per term (r8, caught by the top-60 sf1
    # parity sweep): prices/discounts are 2-decimal, so each term is an
    # exact multiple of 1e-4 — rounding it to an integer BEFORE the sum
    # makes the aggregation exact integer arithmetic, order-invariant
    # across layouts and engines. The float-sum form flipped the final
    # cent on one (nation, year) group at sf1 (~1e-13 drift on a 1.7e8
    # sum landing on a round-half boundary).
    term = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.10)
    profit_units = F.round(term * F.lit(10000), 0).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit_units) / F.lit(10000.0), 2).alias("profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


PRIORITY_LINE_COUNTS_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("priority_line_counts", PRIORITY_LINE_COUNTS_ORACLE)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional bucket counting: per return flag,
    how many 1997-shipped lines belong to urgent/high- vs lower-
    priority orders. The CASE-sum pair turns what would be two
    filtered jobs into one aggregation pass.

    The shipdate range is a real parquet pushed filter on the fact
    scan (min/max row-group pruning at scale); the orderkey equi-join
    carries only (o_orderkey, o_orderpriority) from orders — the
    projection prunes the rest at the scan. One partial+final agg on
    a 3-row domain.

    Reference parity: app.py's priority-mix stacked bars."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


PROMO_REVENUE_SHARE_ORACLE = f"""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN u ELSE 0 END)
             / CAST(sum(u) AS DOUBLE), 4) AS promo_share_pct,
       round(sum(CASE WHEN p_type = 'PROMO' THEN u ELSE 0 END) / 10000.0, 2)
           AS promo_revenue,
       round(sum(u) / 10000.0, 2) AS total_revenue
FROM (
    SELECT p_type,
           {sql_units("l_extendedprice * (1 - l_discount)", 10000)} AS u
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
)
"""


@register("promo_revenue_share", PROMO_REVENUE_SHARE_ORACLE)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion effect: the percentage of one
    month's revenue that came from PROMO-typed parts. Single
    conditional-ratio aggregate over a month-bounded fact scan.

    Same determinism rule as market_share_by_year: the percentage
    divides two exact integer 1e-4-unit sums so both engines divide
    identical integers (r9 rewrite of the pre-rounded-double form).
    The month predicate is a pushed parquet filter
    (at scale: partition pruning if the lake is shipdate-partitioned);
    part broadcasts pre-projected to (key, type).

    Reference parity: app.py's campaign-lift KPI tile."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    u = units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", u).otherwise(F.lit(0)))
    total = F.sum(u)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * promo / total, 4).alias("promo_share_pct"),
            F.round(promo / F.lit(10000.0), 2).alias("promo_revenue"),
            F.round(total / F.lit(10000.0), 2).alias("total_revenue"),
        )
    )


TOP_REVENUE_SUPPLIER_ORACLE = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_cents AS total_revenue_cents
FROM rev
JOIN supplier ON s_suppkey = l_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
ORDER BY s_suppkey
"""


@register("top_revenue_supplier", TOP_REVENUE_SUPPLIER_ORACLE)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — max-of-aggregate: the supplier(s) whose
    quarterly revenue equals the maximum quarterly revenue, ties kept.

    Decorrelation: the per-supplier revenue aggregates once; the max
    is a 1-row aggregate of THAT result broadcast back (a broadcast
    nested loop over one row, metadata-scale) — never a driver
    collect, never a second scan of lineitem. Revenue compares in
    exact integer cents (per-line round to cents, then bigint sum):
    both engines round the identical IEEE product, so the max and the
    equality are exact — no float max boundary to straddle.

    Reference parity: app.py's "top seller of the quarter" callout."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    mx = rev.agg(F.max("rev_cents").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("rev_cents") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev_cents").alias("total_revenue_cents"))
        .orderBy("s_suppkey")
    )


SUPPLIER_PART_VARIETY_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("supplier_part_variety", SUPPLIER_PART_VARIETY_ORACLE)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — supplier variety per part profile, with
    negative predicates (brand <>, type <>, size IN) and a NOT IN
    subquery excluding distrusted suppliers (acctbal < 0 stands in for
    Q16's complaint-comment scan; this schema has no comments).

    The NOT IN decorrelates to a LEFT ANTI broadcast join (the
    excluded set is a handful of rows; s_suppkey is non-null by
    construction so NOT IN == anti-join here). The count(DISTINCT)
    shuffles once on the (brand, type, size) group keys with the
    suppkey riding along for the distinct — Spark plans it as the
    standard two-phase expand+agg, which partial-aggregates map-side.

    Reference parity: app.py's assortment-breadth table."""
    p = (
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SMALL_QTY_AVG_REVENUE_ORACLE = f"""
WITH pq AS (
    SELECT l_partkey AS pk,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_partkey
)
SELECT round(sum({sql_units("l_extendedprice")}) / 100.0 / 7.0, 2)
           AS avg_weekly_revenue,
       CAST(count(*) AS BIGINT) AS matched_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq   ON pk = l_partkey
WHERE p_brand = 'Brand#13' AND p_type = 'SMALL'
  AND CAST(l_quantity AS BIGINT) * 5 * n < qty_sum
"""


@register("small_qty_avg_revenue", SMALL_QTY_AVG_REVENUE_ORACLE)
def small_qty_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — the correlated-average subquery: revenue from
    lines whose quantity is below 20 % of their part's average
    quantity, for one brand+type band.

    Decorrelation + pushdown: the per-part average only matters for
    parts in the band, so the brand-filtered part dim broadcasts FIRST
    and the per-part (sum, count) aggregates over just those parts'
    lines — the oracle computes the same stats over all parts and
    joins, identical per-part values, but the Spark plan never
    aggregates the full fact table. The "below 20 % of average"
    comparison cross-multiplies in exact bigints (qty*5*n < sum):
    quantities are integral, so no float average crosses the engine
    boundary and boundary lines cannot flip on a ulp.

    Reference parity: app.py's small-order leakage KPI."""
    band = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#13") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    band_lines = li.join(F.broadcast(band), li.l_partkey == band.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pq = band_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        band_lines.join(F.broadcast(pq), F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity").cast("bigint") * 5 * F.col("n") < F.col("qty_sum"))
        .agg(
            F.round(
                exact_sum_units("l_extendedprice") / F.lit(100.0) / F.lit(7.0), 2
            ).alias("avg_weekly_revenue"),
            F.count(F.lit(1)).alias("matched_lines"),
        )
    )


WAITING_SUPPLIER_RANKING_ORACLE = """
WITH li AS (
    SELECT l_orderkey, l_suppkey, l_shipdate
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
),
g AS (
    SELECT l_orderkey, max(l_shipdate) AS mx,
           count(DISTINCT l_suppkey) AS nsup
    FROM li GROUP BY l_orderkey
),
lastx AS (
    SELECT li.l_orderkey, li.l_suppkey
    FROM li JOIN g ON li.l_orderkey = g.l_orderkey AND li.l_shipdate = g.mx
    WHERE g.nsup >= 2
    GROUP BY li.l_orderkey, li.l_suppkey
),
u AS (
    SELECT l_orderkey, max(l_suppkey) AS blamed
    FROM lastx GROUP BY l_orderkey HAVING count(*) = 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM u JOIN supplier ON s_suppkey = blamed
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register("waiting_supplier_ranking", WAITING_SUPPLIER_RANKING_ORACLE)
def waiting_supplier_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the blame ranking: in finished multi-supplier
    orders, the supplier who UNIQUELY shipped last (Q21's
    EXISTS-other-supplier AND NOT-EXISTS-other-late-supplier pair,
    re-expressed over l_shipdate — this schema has no
    commit/receipt dates).

    Both correlated EXISTS decorrelate into ONE per-order aggregate
    (max shipdate + distinct-supplier count) joined back to the fact —
    a self-join against a rollup that is strictly smaller than the
    fact, keyed on the same orderkey the fact already hash-partitions
    on, so the join-back reuses the aggregation's exchange rather than
    adding one. "Uniquely last" is a second tiny group-by on the
    surviving (order, supplier) pairs with HAVING count(*)=1. The
    final ranking aggregates a per-supplier domain and top-10s on a
    total order (numwait DESC, s_name).

    Reference parity: app.py's slowest-vendor leaderboard."""
    fo = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    g = li.groupBy(F.col("l_orderkey").alias("gk")).agg(
        F.max("l_shipdate").alias("mx"),
        F.countDistinct("l_suppkey").alias("nsup"),
    )
    lastx = (
        li.join(
            g,
            (F.col("l_orderkey") == F.col("gk"))
            & (F.col("l_shipdate") == F.col("mx"))
            & (F.col("nsup") >= 2),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    u = (
        lastx.groupBy("l_orderkey")
        .agg(F.max("l_suppkey").alias("blamed"), F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == 1)
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        u.join(F.broadcast(s), F.col("blamed") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


PRICING_MEASURES_MELT_ORACLE = """
WITH s AS (
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM s
UNION ALL
SELECT l_returnflag, 'n_lines' AS measure, n_lines AS value FROM s
ORDER BY l_returnflag, measure
"""


@register("pricing_measures_melt", PRICING_MEASURES_MELT_ORACLE)
def pricing_measures_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping (melt / UNPIVOT) — the inverse of
    order_priority_pivot: the per-flag measures aggregate once, then
    ``DataFrame.unpivot`` turns the measure columns into (measure,
    value) rows. The unpivot is a row-local Expand over the ALREADY
    AGGREGATED 3-row frame — the reshape costs nothing at any scale
    because it happens after the reduction, never on the fact table
    (the oracle's UNION ALL re-reads the CTE; Spark's Expand is the
    single-pass equivalent).

    Reference parity: app.py's long-format frames for its plotting
    library (pandas .melt before px.bar)."""
    s = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return s.unpivot(
        ["l_returnflag"], ["sum_qty", "n_lines"], "measure", "value"
    ).orderBy("l_returnflag", "measure")


# --------------------------------------------------------------------------
# TPC-H Q6 / Q11 / Q20 shapes — completes the 22-query sweep
# --------------------------------------------------------------------------

DISCOUNT_REVENUE_FORECAST_ORACLE = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_increase_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("discount_revenue_forecast", DISCOUNT_REVENUE_FORECAST_ORACLE)
def discount_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — revenue-change forecast: how much extra revenue
    would have been booked in 1997 had small-quantity discounts in the
    [5%, 7%] band been eliminated. A single conjunctive-filter scan
    feeding one global aggregate — no join, no group keys.

    This is the purest pushdown test in the sweep: all three
    predicates (shipdate range, discount band, quantity cap) land in
    PushedFilters on the parquet scan, so at scale row groups outside
    the year are never read, and the aggregate is one partial+final
    pair over whatever survives. Revenue sums in exact integer cents
    (per-line round, bigint sum) so both engines add identical
    integers regardless of reduction order.

    Reference parity: app.py's what-if KPI tiles (global scalar aggs,
    app.py:234-239) with a compound filter mask (app.py:215-226)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_increase_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


CONCENTRATED_PART_VALUE_ORACLE = """
WITH nv AS (
    SELECT l_partkey,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS BIGINT) AS value_cents
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value_cents
FROM nv
WHERE CAST(value_cents AS DOUBLE) >
      (SELECT CAST(sum(value_cents) AS DOUBLE) FROM nv) / 250
ORDER BY value_cents DESC, p_partkey
"""


@register("concentrated_part_value", CONCENTRATED_PART_VALUE_ORACLE)
def concentrated_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — value concentration: parts whose revenue from
    one nation's suppliers exceeds a fixed fraction (1/250) of that
    nation's total, i.e. a HAVING against a scalar subquery over the
    SAME aggregate. (The reference lake has no partsupp table, so
    shipped revenue stands in for stock value — the plan shape is
    identical.)

    Decorrelation: the per-part aggregate materializes once; the
    nation total is a 1-row re-aggregate of THAT result broadcast back
    (metadata-scale nested-loop over one row) — lineitem is scanned
    exactly once, matching the oracle's CTE-reuse. The nation filter
    reaches lineitem as a broadcast semi-structured join on the
    filtered supplier keys, so the fact scan drops ~24/25 of rows
    before the aggregate. Integer-cents sums make the threshold
    comparison exact in both engines (values < 2^53 stay
    double-exact).

    Reference parity: the dashboard's "top contributors above x% of
    total" callouts (dashboard.py:173-183 normalized by A5 totals)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    nation_suppliers = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey")
    nv = scoped_persist(
        li.join(F.broadcast(nation_suppliers), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("value_cents")
        )
    )
    threshold = nv.agg(
        (F.sum("value_cents").cast("double") / F.lit(250)).alias("__thr")
    )
    return (
        nv.join(F.broadcast(threshold))
        .where(F.col("value_cents").cast("double") > F.col("__thr"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
        .orderBy(F.col("value_cents").desc(), "p_partkey")
    )


DOMINANT_PART_SUPPLIERS_ORACLE = """
WITH sp AS (
    SELECT l_suppkey, l_partkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sp
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND p_name LIKE 'red %'
    GROUP BY l_suppkey, l_partkey
),
pt AS (
    SELECT l_partkey, CAST(sum(qty_sp) AS BIGINT) AS qty_part
    FROM sp GROUP BY l_partkey
)
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM sp JOIN pt USING (l_partkey)
    WHERE 2 * qty_sp > qty_part
)
ORDER BY s_suppkey
"""


@register("dominant_part_suppliers", DOMINANT_PART_SUPPLIERS_ORACLE)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — nested aggregate semi-join: suppliers who
    dominate some red part (shipped more than half of that part's 1997
    volume), i.e. a per-(supplier, part) aggregate compared against a
    per-part re-aggregate, reduced to a DISTINCT supplier set that
    semi-joins the supplier dimension. (No partsupp table in this
    lake, so "dominates shipped volume" stands in for Q20's excess
    availqty — same two-level-aggregate + semi-join plan.)

    Scan once: the part-name filter broadcasts ~1/8 of the part keys
    into the fact scan (with the shipdate range pushed), the
    (suppkey, partkey) aggregate reduces before anything wide, and
    the per-part total re-aggregates THAT result — never a second
    lineitem pass, matching the oracle's CTE reuse. Quantities are
    integral by generation, so bigint sums compare exactly; the
    dominance test ``2*qty_sp > qty_part`` stays in integers. The
    distinct supplier set (bounded by the supplier dim) broadcasts
    into the dimension join.

    Reference parity: app.py's dominant-operator watchlist (the
    "which operator owns this route" drill-down)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    red_parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    sp = scoped_persist(
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty_sp"))
    )
    pt = sp.groupBy("l_partkey").agg(
        F.sum("qty_sp").cast("bigint").alias("qty_part")
    )
    dominant = (
        sp.join(pt, "l_partkey")
        .where(2 * F.col("qty_sp") > F.col("qty_part"))
        .select("l_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.join(F.broadcast(dominant), sup.s_suppkey == F.col("l_suppkey"), "semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


EVENTS_GROUPING_SETS_ORACLE = f"""
SELECT coalesce(event_type, 'ALL') AS event_type,
       CAST(coalesce(CAST(hour(ts) AS BIGINT), -1) AS BIGINT) AS hr,
       CAST(grouping(event_type) * 2 + grouping(hour(ts)) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       {sql_exact_sum("value")} AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (hour(ts)), (event_type, hour(ts)))
ORDER BY gid, event_type, hr
"""


@register("events_grouping_sets", EVENTS_GROUPING_SETS_ORACLE)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form cube/rollup sugar over):
    per-type totals, per-hour totals, and the full (type, hour) matrix
    in ONE aggregation pass, disambiguated by grouping_id — the report
    shape dashboards compute as three separate queries and the
    reference computes as three pandas groupbys (dashboard.py:
    173-252).

    Spark plans grouping sets as a single Expand (3 rows per input
    row, row-local) feeding one partial+final hash aggregate — one
    shuffle of grouped partials for all three granularities, versus
    three scans for the naive version. At 100 TB the Expand multiplies
    map-side rows BEFORE the partial aggregate collapses them, so the
    shuffle still carries only group cardinalities.

    NULL group keys coalesce to sentinels ('ALL' / -1) because the
    driver hash treats NULL != NULL across engines; grouping_id
    disambiguates a real NULL key from a rolled-up one."""
    ev = _t(spark, sf_dir, "events")
    hr = F.hour("ts")
    gid = (F.grouping("event_type") * 2 + F.grouping(hr)).cast("int")
    return (
        ev.groupingSets(
            [["event_type"], [hr], ["event_type", hr]],
            "event_type",
            hr,
        )
        .agg(
            gid.alias("gid"),
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("hour(ts)").cast("bigint"), F.lit(-1)).alias("hr"),
            "gid",
            "n",
            "total_value",
        )
        .orderBy("gid", "event_type", "hr")
    )


REFERENTIAL_INTEGRITY_ORACLE = """
SELECT 'customer->nation' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
WHERE n_nationkey IS NULL
UNION ALL
SELECT 'lineitem->orders', CAST(count(*) AS BIGINT)
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey IS NULL
UNION ALL
SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
WHERE p_partkey IS NULL
UNION ALL
SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
WHERE s_suppkey IS NULL
UNION ALL
SELECT 'orders->customer', CAST(count(*) AS BIGINT)
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE c_custkey IS NULL
ORDER BY fk
"""


@register("referential_integrity_audit", REFERENTIAL_INTEGRITY_ORACLE)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign-key
    relationship in the lake, in one result — the write-expectation
    check (sources/metadata.py's expectations) run retrospectively as
    a query. A healthy lake reports zeros; any nonzero row names the
    broken edge.

    Each relationship is a LEFT ANTI join reduced to a count before
    the union — the anti side carries only the join key (projection-
    pruned scan), dims broadcast, and the one fact-fact edge
    (lineitem->orders) is an equi-join AQE handles (bucketed tables
    co-locate it at 100 TB, tests/test_bucketing.py). The 5-row union
    is metadata-scale."""
    def orphans(fact, key, dim, dkey, label, bcast):
        d = dim.select(dkey)
        if bcast:
            d = F.broadcast(d)
        return (
            fact.select(key)
            .join(d, F.col(key) == F.col(dkey), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    checks = [
        orphans(c, "c_nationkey", _t(spark, sf_dir, "nation"), "n_nationkey",
                "customer->nation", True),
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders", False),
        orphans(li, "l_partkey", _t(spark, sf_dir, "part"), "p_partkey",
                "lineitem->part", True),
        orphans(li, "l_suppkey", _t(spark, sf_dir, "supplier"), "s_suppkey",
                "lineitem->supplier", True),
        orphans(o, "o_custkey", c, "c_custkey", "orders->customer", True),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out.orderBy("fk")


JOIN_KEY_SKEW_ORACLE = """
WITH k AS (
    SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS c
    FROM lineitem GROUP BY l_orderkey
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS max_rows,
           round(avg(c), 4) AS avg_rows
    FROM k
),
top AS (
    SELECT CAST(sum(c) AS BIGINT) AS top10_rows
    FROM (SELECT c FROM k ORDER BY c DESC, key LIMIT 10)
)
SELECT n_keys, n_rows, max_rows, avg_rows,
       round(CAST(max_rows AS DOUBLE) / avg_rows, 4) AS skew_factor,
       round(CAST(top10_rows AS DOUBLE) / n_rows, 6) AS top10_share
FROM s, top
"""


@register("join_key_skew_profile", JOIN_KEY_SKEW_ORACLE)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the distribution profile of the
    lineitem→orders join key — max/avg rows per key (the skew factor
    that predicts straggler tasks) and the row share of the 10
    heaviest keys. This is the query an operator runs BEFORE choosing
    between a plain shuffle join, AQE skew splitting, or the salted
    twin (`operators/skew.py`): a skew factor near 1 means shuffle
    joins balance; a heavy top-10 share names the keys to salt.

    Shape: one partial-aggregated count per key, then two
    metadata-scale reductions of that result (a 1-row stats aggregate
    and a TakeOrdered top-10) joined back as 1-row broadcasts — raw
    rows are touched once."""
    k = scoped_persist(
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    s = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_rows"),
        F.round(F.avg("c"), 4).alias("avg_rows"),
    )
    top = (
        k.orderBy(F.col("c").desc(), "key")
        .limit(10)
        .agg(F.sum("c").cast("bigint").alias("top10_rows"))
    )
    return (
        s.crossJoin(F.broadcast(top))
        .select(
            "n_keys",
            "n_rows",
            "max_rows",
            "avg_rows",
            F.round(F.col("max_rows").cast("double") / F.col("avg_rows"), 4).alias(
                "skew_factor"
            ),
            F.round(F.col("top10_rows").cast("double") / F.col("n_rows"), 6).alias(
                "top10_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Percent-of-total contribution (ratio-to-report)
# ---------------------------------------------------------------------------

REVENUE_CONTRIBUTION_ORACLE = f"""
WITH nat AS (
    SELECT r.r_name AS region, n.n_name AS nation,
           sum({sql_units("o.o_totalprice")}) AS rev_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
)
SELECT region, nation,
       round(rev_cents / 100.0, 2) AS revenue,
       round(100.0 * rev_cents
             / CAST(sum(rev_cents) OVER (PARTITION BY region) AS DOUBLE), 4)
           AS pct_of_region,
       rank() OVER (PARTITION BY region ORDER BY rev_cents DESC, nation)
           AS rank_in_region
FROM nat
ORDER BY region, rank_in_region, nation
"""


@register("revenue_contribution", REVENUE_CONTRIBUTION_ORACLE)
def revenue_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's order
    revenue, plus its in-region rank — the percent-of-total window
    shape every BI tool emits (Oracle RATIO_TO_REPORT, Tableau
    percent-of-pane).

    Scale shape: the fact scan aggregates down to |nations| rows
    FIRST (one partial-aggregated shuffle; customer/nation/region
    dims broadcast), so both windows run over a 25-row frame —
    metadata-scale, same argument as monthly_revenue_growth. Revenue
    stays in EXACT integer cents through the window sum (r9): the
    share divides two integers both engines agree on bit-for-bit, so
    no window-frame summation order can flip the 4th decimal."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    nat = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(exact_sum_units("o_totalprice").alias("rev_cents"))
    )
    wsum = Window.partitionBy("region")
    wrank = Window.partitionBy("region").orderBy(F.desc("rev_cents"), "nation")
    return nat.select(
        "region",
        "nation",
        F.round(F.col("rev_cents") / F.lit(100.0), 2).alias("revenue"),
        F.round(
            100.0 * F.col("rev_cents") / F.sum("rev_cents").over(wsum), 4
        ).alias("pct_of_region"),
        F.rank().over(wrank).cast("bigint").alias("rank_in_region"),
    ).orderBy("region", "rank_in_region", "nation")


# ---------------------------------------------------------------------------
# Time-hierarchy ROLLUP (year -> month -> grand total)
# ---------------------------------------------------------------------------

TIME_ROLLUP_ORACLE = f"""
SELECT coalesce(CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS VARCHAR), 'ALL') AS yr,
       coalesce(strftime(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)), '%Y-%m'),
                'ALL') AS mon,
       CAST(grouping(year(CAST(o_orderdate AS TIMESTAMP)))
            + grouping(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)))
            AS BIGINT) AS lvl,
       CAST(count(*) AS BIGINT) AS n_orders,
       {sql_exact_sum("o_totalprice")} AS revenue
FROM orders
GROUP BY ROLLUP (year(CAST(o_orderdate AS TIMESTAMP)),
                 date_trunc('month', CAST(o_orderdate AS TIMESTAMP)))
ORDER BY lvl, yr, mon
"""


@register("revenue_time_rollup", TIME_ROLLUP_ORACLE)
def revenue_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy ROLLUP: order counts and revenue at month,
    year, and grand-total levels in one pass, with a grouping-level
    column — the drill-down hierarchy shape (completing the
    multi-dimensional family next to orders_cube's CUBE and
    events_grouping_sets' explicit GROUPING SETS).

    Scale shape: Spark expands ROLLUP into one Expand + one hash
    aggregate — a single shuffle of 3x the partial-aggregated rows
    (one replica per hierarchy level), never a per-level rescan of
    the fact table."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        F.year("o_orderdate").alias("y"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("m"),
        "o_totalprice",
    )
    rolled = base.rollup("y", "m").agg(
        F.grouping("y").cast("bigint").alias("gy"),
        F.grouping("m").cast("bigint").alias("gm"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        exact_sum("o_totalprice").alias("revenue"),
    )
    return rolled.select(
        F.coalesce(F.col("y").cast("string"), F.lit("ALL")).alias("yr"),
        F.coalesce(F.col("m"), F.lit("ALL")).alias("mon"),
        (F.col("gy") + F.col("gm")).alias("lvl"),
        "n_orders",
        "revenue",
    ).orderBy("lvl", "yr", "mon")


# ---------------------------------------------------------------------------
# Supplier fulfillment lead time (date arithmetic)
# ---------------------------------------------------------------------------

LEAD_TIME_ORACLE = """
WITH lead AS (
    SELECT l.l_suppkey,
           date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
               AS lead_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(avg(lead_days), 4) AS avg_lead_days,
       round(quantile_cont(lead_days, 0.95), 4) AS p95_lead_days
FROM lead JOIN supplier s ON lead.l_suppkey = s.s_suppkey
GROUP BY 1, 2
ORDER BY avg_lead_days DESC, s_suppkey
LIMIT 25
"""


@register("supplier_lead_time", LEAD_TIME_ORACLE)
def supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowest 25 suppliers by average order-to-ship lead time (with
    exact p95) — the fulfillment SLA report, and the registry's
    date-arithmetic aggregation representative (datediff over a
    fact x fact key join).

    Scale shape: lineitem x orders is the one genuine fact x fact
    equi-join in the schema — on a cluster these two tables are
    BUCKETED on the order key (tests/test_bucketing.py pins the
    zero-shuffle plan for exactly this join); at test SF it's a plain
    hash join. The supplier dim broadcasts; the rollup
    partial-aggregates to |suppliers| rows before the top-k."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    lead = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("lead_days"),
    )
    return (
        lead.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            lead.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.avg("lead_days"), 4).alias("avg_lead_days"),
            F.round(F.expr("percentile(lead_days, 0.95)"), 4).alias("p95_lead_days"),
        )
        .orderBy(F.desc("avg_lead_days"), "s_suppkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Rank movers (period-over-period rank delta + indexed-to-base)
# ---------------------------------------------------------------------------

RANK_MOVERS_ORACLE = f"""
WITH yearly AS (
    SELECT n.n_name AS nation,
           year(CAST(o.o_orderdate AS TIMESTAMP)) AS yr,
           sum({sql_units("o.o_totalprice")}) AS rev_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
),
r1 AS (
    SELECT nation, yr, rev_cents,
           rank() OVER (PARTITION BY yr ORDER BY rev_cents DESC, nation) AS rnk,
           first_value(rev_cents) OVER (
               PARTITION BY nation ORDER BY yr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS base_cents
    FROM yearly
),
ranked AS (
    SELECT *, lag(rnk) OVER (PARTITION BY nation ORDER BY yr) AS prev_rnk
    FROM r1
)
SELECT nation, CAST(yr AS BIGINT) AS yr,
       round(rev_cents / 100.0, 2) AS revenue,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(prev_rnk - rnk AS BIGINT) AS rank_gain,
       round(100.0 * rev_cents / base_cents, 4) AS index_to_base
FROM ranked
WHERE prev_rnk IS NOT NULL
ORDER BY yr, rnk, nation
"""


@register("nation_rank_movers", RANK_MOVERS_ORACLE)
def nation_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year league-table movement: each nation's revenue
    rank within the year, how many places it gained vs the prior
    year, and its revenue indexed to its own first year (the
    "percent of base period" line every KPI deck draws) — rank-over-
    rank plus first_value baselines, the two window features the
    registry didn't yet compose.

    Scale shape: the fact scan rolls up to |nations| x |years| rows
    first (dims broadcast, one partial-aggregated shuffle); all three
    windows run over that metadata-scale frame."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    yearly = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(exact_sum_units("o_totalprice").alias("rev_cents"))
    )
    w_rank = Window.partitionBy("yr").orderBy(F.desc("rev_cents"), "nation")
    w_hist = Window.partitionBy("nation").orderBy("yr")
    ranked = yearly.select(
        "nation",
        F.col("yr").cast("bigint").alias("yr"),
        "rev_cents",
        F.rank().over(w_rank).cast("bigint").alias("rnk"),
        F.first("rev_cents").over(
            w_hist.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("base_cents"),
    )
    prev = F.lag("rnk").over(w_hist)
    return (
        ranked.select(
            "nation",
            "yr",
            F.round(F.col("rev_cents") / F.lit(100.0), 2).alias("revenue"),
            "rnk",
            (prev - F.col("rnk")).cast("bigint").alias("rank_gain"),
            F.round(
                100.0 * F.col("rev_cents") / F.col("base_cents"), 4
            ).alias("index_to_base"),
        )
        .where(F.col("rank_gain").isNotNull())
        .orderBy("yr", "rnk", "nation")
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) of orders: expensive AND recent
# ---------------------------------------------------------------------------

PARETO_FRONTIER_ORACLE = """
WITH p AS (SELECT o_orderkey, o_totalprice AS price, CAST(o_orderdate AS DATE) AS d
           FROM orders),
g AS (SELECT price, max(d) AS maxd FROM p GROUP BY price),
w AS (SELECT price, maxd, max(maxd) OVER (ORDER BY price DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax FROM g),
f AS (SELECT p.o_orderkey, p.price, p.d FROM p JOIN w USING (price)
      WHERE p.d = w.maxd AND (w.prevmax IS NULL OR p.d > w.prevmax))
SELECT o_orderkey, round(price, 2) AS price, strftime(d, '%Y-%m-%d') AS order_date
FROM f ORDER BY price DESC, o_orderkey
"""


@register("order_pareto_frontier", PARETO_FRONTIER_ORACLE)
def order_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline query: orders not dominated on (totalprice,
    orderdate) — no other order is both at-least-as-expensive and
    at-least-as-recent with one strict. The classic skyline operator
    (Borzsony/Kossmann/Stocker, ICDE'01) as a sweep: ordered by price
    descending, a row survives iff its date beats the running max
    date of every strictly-higher-priced row (and, within its own
    price, iff it carries the price group's max date).

    Scale shape: the sweep's running max is the EXCLUSIVE global
    cummax — computed with windows.global_cummax_prev (range exchange
    + pid-partitioned window + broadcast prefix maxes; no
    single-partition window), over the per-price rollup rather than
    raw rows. Dates ride as integral epoch days, so partition
    recombination is exact. The frontier is tiny by nature (~log n
    for independent dims); it materializes eagerly so the range-bound
    cache releases."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    g = (
        o.groupBy("price")
        .agg(F.max("d").alias("maxd"))
        .withColumn("neg_price", -F.col("price"))
        .withColumn("mday", F.datediff("maxd", F.lit("1970-01-01").cast("date")).cast("long"))
    )
    ranked, release = win.global_cummax_prev(
        g, ["neg_price", "price"], "mday", out_col="prevmax"
    )
    day = F.datediff("d", F.lit("1970-01-01").cast("date")).cast("long")
    frontier = (
        o.join(ranked.select("price", "maxd", "prevmax"), "price")
        .where(
            (F.col("d") == F.col("maxd"))
            & (F.col("prevmax").isNull() | (day > F.col("prevmax")))
        )
        .select(
            "o_orderkey",
            F.round("price", 2).alias("price"),
            F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("price").desc(), "o_orderkey")
    )
    try:
        rows = frontier.collect()
    finally:
        release()
    return spark.createDataFrame(rows, frontier.schema).orderBy(
        F.col("price").desc(), "o_orderkey"
    )


# --------------------------------------------------------------------------
# Spark 4 VARIANT: semi-structured profiling without a fixed schema
# --------------------------------------------------------------------------

VARIANT_PROPS_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       round(avg(k), 2) AS avg_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM (
    SELECT event_type,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k
    FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


@register("variant_props_profile", VARIANT_PROPS_ORACLE)
def variant_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured profiling through Spark 4's VARIANT type:
    ``try_parse_json`` ingests the payload once into the binary
    VARIANT encoding, ``try_variant_get`` extracts typed fields
    null-safely — the modern lakehouse bronze-parse (vs
    json_props_extract's regex/get_json_object string path, which
    re-parses the JSON text per extraction).  At 100 TB the
    difference is material: VARIANT decodes each payload once into a
    shredded binary form, and malformed rows degrade to NULL instead
    of failing the job.

    Scale shape: row-local parse + extract (codegen), one
    partial-aggregated shuffle to the |event_type| domain."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )
