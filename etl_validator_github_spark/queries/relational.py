"""Relational operator coverage queries (SURVEY.md §2.3-2.7, §2.9).

Each query maps reference operators onto the driver's TPC-H-ish testdata
tables and carries a DuckDB oracle. Operator provenance is cited per
query; expressions follow the determinism rules in contract.py.
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_validator_github_spark.contract import Query, cents, load
from etl_validator_github_spark.functions.ranks import global_row_number

# ---------------------------------------------------------------------------
# Q1: pricing summary (scan → filter → hash agg; the flagship bench query).
# Exercises A1-A5-style grouped aggregation (PIPE:856-861) at TPC-H shape.
# ---------------------------------------------------------------------------


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(cents("l_extendedprice")) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(cents(disc_price)) / F.lit(100.0)).alias("sum_disc_price"),
            (F.sum(cents(charge)) / F.lit(100.0)).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc_price,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_charge,
       COUNT(*) AS count_order,
       (CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0) / COUNT(*) AS avg_qty,
       (CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0) / COUNT(*) AS avg_price
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# Q3: shipping priority (3-way join → agg → deterministic top-10).
# Customer side is small → Catalyst broadcasts it; limit carries a full
# tie-broken ORDER BY so both engines pick the same rows (O1, PIPE:1110).
# ---------------------------------------------------------------------------


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-06-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1998-06-01")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"),
                 "o_orderpriority")
        .agg((F.sum(cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
              / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
  AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# ---------------------------------------------------------------------------
# Q5: local-supplier revenue (6-way join; dims broadcast, fact co-joined).
# ---------------------------------------------------------------------------


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg((F.sum(cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
              / F.lit(100.0)).alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


_Q5_SQL = """
SELECT n_name, r_name,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1998-01-01'
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Q6: forecast revenue change — pure scan+filter+sum; the pushdown
# showcase (every predicate reaches the parquet reader).
# ---------------------------------------------------------------------------


def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents(F.col("l_extendedprice") * F.col("l_discount")))
             / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# ---------------------------------------------------------------------------
# Q10: returned-item reporting — who returned the most revenue.
# ---------------------------------------------------------------------------


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1997-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-07-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
              / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

# ---------------------------------------------------------------------------
# Q14: promotion revenue share — conditional-sum ratio (exact ints, one
# final IEEE division).
# ---------------------------------------------------------------------------


def _q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-09-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-10-01"))
    )
    rev = cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    economy = F.sum(
        F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast("long"))
    )
    total = F.sum(rev)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (economy / F.lit(100.0)).alias("economy_revenue"),
            (total / F.lit(100.0)).alias("total_revenue"),
            (F.lit(100.0) * economy / total).alias("economy_share_pct"),
        )
    )


_Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) / 100.0 AS economy_revenue,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_revenue,
       CAST(100.0 AS DOUBLE) * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT)
             / CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS economy_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-10-01'
"""

# ---------------------------------------------------------------------------
# Top-10 customers by revenue (join → agg → deterministic top-k, O1/O2).
# ---------------------------------------------------------------------------


def _top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg((F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total_spend"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


_TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_spend,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
"""

# ---------------------------------------------------------------------------
# Semi / anti joins (J2 payee IN-list fetch PIPE:904-914; T1 key-set
# difference PIPE:941-948).
# ---------------------------------------------------------------------------


def _customers_with_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 45000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 45000)
"""


# Every fixture customer has at least one order, so an unrestricted anti
# join is vacuously empty at every SF (VERDICT r6 finding #2). Restricting
# the order side to "recent" orders preserves the left_anti / NOT EXISTS
# shape while giving the operator real rows to negate: 14 / 135 / 1355
# idle customers at sf0.001 / 0.01 / 0.1.
_ANTI_CUTOFF = "2000-01-01"


def _customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ANTI_CUTOFF
    )
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_ANTI_SQL = f"""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '{_ANTI_CUTOFF}')
"""

# ---------------------------------------------------------------------------
# Latest order per customer — window dedup, the Spark form of the
# reference's latest-file selection (O1, PIPE:1110-1111: sort by
# LastModified desc, take first).
# ---------------------------------------------------------------------------


def _latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.to_date("o_orderdate").alias("latest_date"),
            "o_totalprice",
        )
    )


_LATEST_SQL = """
SELECT o_custkey, o_orderkey AS latest_orderkey,
       CAST(o_orderdate AS DATE) AS latest_date, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""

# ---------------------------------------------------------------------------
# Duplicate-key detection (R23: count(*) over key > 1, PIPE:2696-2739).
# groupBy + having rather than a window: one shuffle, map-side partial agg.
# ---------------------------------------------------------------------------


def _duplicate_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.min("o_orderkey").alias("first_orderkey"))
        .filter(F.col("n_orders") > 1)
    )


_DUPES_SQL = """
SELECT o_custkey, o_orderpriority, COUNT(*) AS n_orders,
       MIN(o_orderkey) AS first_orderkey
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) > 1
"""

# ---------------------------------------------------------------------------
# Per-key collected set (A1: payee → error list, PIPE:856-861), rendered
# as a sorted joined string so the value is engine-order-independent.
# ---------------------------------------------------------------------------


def _priorities_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.count_distinct("o_orderpriority").alias("n_distinct_priorities"),
    )


_COLLECT_SQL = """
SELECT o_custkey,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities,
       COUNT(DISTINCT o_orderpriority) AS n_distinct_priorities
FROM orders
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# String function battery (§2.9: regexp_extract, lpad, split, concat,
# lower/upper, substring, length, levenshtein).
# ---------------------------------------------------------------------------


def _string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    brand_num = F.regexp_extract("p_brand", r"([0-9]+)", 1)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.split("p_name", " ").getItem(0).alias("first_token"),
        brand_num.cast("int").alias("brand_num"),
        F.lpad(brand_num, 3, "0").alias("brand_num_padded"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat_ws("-", F.col("p_brand"), F.lower("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.levenshtein(F.col("p_name"), F.lit("red widget")).alias("lev_red_widget"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_name").alias("name_rev"),
    )


_STRING_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       string_split(p_name, ' ')[1] AS first_token,
       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
       lpad(regexp_extract(p_brand, '([0-9]+)', 1), 3, '0') AS brand_num_padded,
       substring(p_type, 1, 3) AS type_prefix,
       concat_ws('-', p_brand, lower(p_type)) AS brand_type,
       length(p_name) AS name_len,
       levenshtein(p_name, 'red widget') AS lev_red_widget,
       replace(p_name, ' ', '_') AS name_snake,
       reverse(p_name) AS name_rev
FROM part
"""

# ---------------------------------------------------------------------------
# Date/time function battery (§2.9: to_date, date_format, date_add,
# current-date-free arithmetic, epoch conversion PIPE:1513-1520).
# ---------------------------------------------------------------------------


def _date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        d.alias("order_date"),
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("q"),
        (F.weekday(d) + F.lit(1)).alias("iso_dow"),
        F.trunc(d, "month").alias("month_start"),
        F.date_add(d, 30).alias("plus_30d"),
        F.last_day(d).alias("last_dom"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_t0"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


_DATE_SQL = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(isodow(o_orderdate) AS INT) AS iso_dow,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus_30d,
       last_day(CAST(o_orderdate AS DATE)) AS last_dom,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_t0,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
"""

# ---------------------------------------------------------------------------
# Events: tumbling-window rollup (batch form of the Structured Streaming
# windowed agg; §2.11) + JSON-ish prop extraction.
# ---------------------------------------------------------------------------


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` replaced by canonical ``ts_us`` (BIGINT epoch-µs).

    The testdata generator has stored ``ts`` as both TIMESTAMP(NANOS)
    (which Spark's vectorized reader rejects unless read as BIGINT nanos
    via ``nanosAsLong``) and plain timestamp[us] (which loads as
    TIMESTAMP_NTZ) across regenerations. Both shapes normalize here to
    ONE integer-microsecond column, so every downstream time expression
    is exact integer arithmetic on the same basis DuckDB's ``epoch_us``
    produces — engine-independent and regeneration-proof.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "bigint":  # nanos-as-long path
        ts_us = F.expr("ts div 1000")
    else:
        # TIMESTAMP_NTZ µs storage: the session is pinned UTC, so the
        # naive→instant cast matches DuckDB's epoch_us on naive ts.
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.withColumn("ts_us", ts_us.cast("long")).drop("ts")


_US_PER_HOUR = 3600 * 1_000_000


def _events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    k = F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("long")
    hour_epoch = (F.expr(f"ts_us div {_US_PER_HOUR}") * F.lit(3600)).alias("hour_epoch")
    return (
        ev.groupBy(hour_epoch, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("value_total"),
            F.sum(k).alias("k_total"),
        )
    )


_EVENTS_ROLLUP_SQL = f"""
SELECT (epoch_us(ts) // {_US_PER_HOUR}) * 3600 AS hour_epoch,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS value_total,
       CAST(SUM(TRY_CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) AS BIGINT) AS k_total
FROM events
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Events: gap-based sessionization (lag window → cumulative session ids).
# The scale path for clickstream pipelines: one shuffle on user_id, all
# window work stays within the partition.
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1800 * 1_000_000


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_events already yields the canonical µs basis both engines
    # share (sub-µs digits, when present in storage, are floored away
    # identically on both sides).
    ev = load_events(spark, sf_dir).withColumnRenamed("ts_us", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts")).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col("ts") - prev) > SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_sid = ev.withColumn("session_id", F.sum(new_session).over(cum))
    per_session = with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), with_sid AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM with_sid GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY 1
"""

# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent click at or
# before it. Spark has no ASOF JOIN operator; the scalable re-expression
# is union-the-sides + carry-forward window — ONE shuffle on user_id and
# a linear in-partition pass, versus the O(n²)-per-user inequality join a
# naive translation would produce. DuckDB's native ASOF LEFT JOIN is the
# oracle, which also pins the inclusive (ts_click <= ts_purchase)
# semantics. Same-µs click ties collapse to max event_id BEFORE the
# union so both engines see one candidate per instant.
# ---------------------------------------------------------------------------


def _events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("event_id"))
        .select("user_id", "ts_us", "event_id", F.lit(0).alias("is_p"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id", F.lit(1).alias("is_p")
    )
    both = clicks.unionAll(purchases)
    # Clicks sort before purchases at the same instant (is_p asc), so the
    # carry-forward value at a purchase row includes same-µs clicks.
    w = Window.partitionBy("user_id").orderBy("ts_us", "is_p", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    click_only = lambda c: F.when(F.col("is_p") == 0, c)  # noqa: E731
    tagged = both.withColumn(
        "last_click_id", F.last(click_only(F.col("event_id")), ignorenulls=True).over(w)
    ).withColumn(
        "last_click_ts", F.last(click_only(F.col("ts_us")), ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("is_p") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        "last_click_id",
        (F.col("ts_us") - F.col("last_click_ts")).alias("gap_us"),
    )


_ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2
), purchases AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts_us AS purchase_ts_us,
       c.event_id AS last_click_id,
       p.ts_us - c.ts_us AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
"""

# ---------------------------------------------------------------------------
# Range join: events matched to overlapping value intervals (derived
# from nation keys). Implemented with the grid-bucketed range-join
# operator (plans/range_join.py) — an equi-join on the bucket key
# instead of the BroadcastNestedLoopJoin Spark would otherwise plan for
# BETWEEN — then aggregated per interval. Oracle: plain BETWEEN join.
# ---------------------------------------------------------------------------

_RANGE_WIDTH = 18.0
_RANGE_SPAN = 36.0


def _events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_validator_github_spark.plans.range_join import bucketed_range_join

    ev = load_events(spark, sf_dir).select("event_id", "value")
    intervals = load(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        (F.col("n_nationkey") * _RANGE_WIDTH).alias("lo"),
        (F.col("n_nationkey") * _RANGE_WIDTH + _RANGE_SPAN).alias("hi"),
    )
    joined = bucketed_range_join(
        ev, intervals, point_col="value", lo_col="lo", hi_col="hi",
        bucket_width=_RANGE_WIDTH,
    )
    return (
        joined.groupBy("n_nationkey", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("value_total"),
        )
        .orderBy("n_nationkey")
    )


_RANGE_JOIN_SQL = f"""
WITH intervals AS (
  SELECT n_nationkey, n_name,
         n_nationkey * {_RANGE_WIDTH} AS lo,
         n_nationkey * {_RANGE_WIDTH} + {_RANGE_SPAN} AS hi
  FROM nation
)
SELECT n_nationkey, n_name,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS value_total
FROM events JOIN intervals ON value BETWEEN lo AND hi
GROUP BY 1, 2
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# Q2 essence: correlated scalar subquery (min per group) decorrelated
# into a window min — one shuffle on the group key instead of a
# re-executed subquery per row.
# ---------------------------------------------------------------------------


def _min_balance_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        sup.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name",
                F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


_MIN_BAL_SQL = """
SELECT s_suppkey, s_name, n_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (
  SELECT MIN(s2.s_acctbal) FROM supplier s2
  WHERE s2.s_nationkey = supplier.s_nationkey
)
ORDER BY s_suppkey
"""

# ---------------------------------------------------------------------------
# Exact percentile aggregates per order priority. Percentiles run over
# integer cents so both engines interpolate between identical BIGINTs;
# the result is rounded back to cents to absorb any last-bit difference
# in the two engines' (mathematically identical) interpolation formulas.
# ---------------------------------------------------------------------------


def _order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    pct = lambda p: (F.round(F.percentile(c, F.lit(p))) / F.lit(100.0))  # noqa: E731
    return (
        orders.withColumn("__cents", c)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            (F.min("__cents") / F.lit(100.0)).alias("min_price"),
            pct(0.5).alias("median_price"),
            pct(0.9).alias("p90_price"),
            (F.max("__cents") / F.lit(100.0)).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


_PERCENTILES_SQL = """
WITH c AS (
  SELECT o_orderpriority, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(MIN(cents) AS BIGINT) / 100.0 AS min_price,
       round(quantile_cont(cents, 0.5)) / 100.0 AS median_price,
       round(quantile_cont(cents, 0.9)) / 100.0 AS p90_price,
       CAST(MAX(cents) AS BIGINT) / 100.0 AS max_price
FROM c
GROUP BY 1
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# Q7 shape: bilateral trade volume between two nations — supplier and
# customer nations joined independently (both broadcast), the
# directionality constraint expressed as an OR of the two orderings,
# yearly rollup.
# ---------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_1", "NATION_2")


def _q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1, n2 = _Q7_NATIONS
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    s_nat = nat.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    c_nat = nat.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
        | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(s_nat), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(c_nat), cust.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year(F.to_date("l_shipdate")).alias("l_year"))
        .agg((F.sum(cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
              / F.lit(100.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT s_nat.n_name AS supp_nation,
       c_nat.n_name AS cust_nation,
       CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation s_nat ON s_nationkey = s_nat.n_nationkey
JOIN nation c_nat ON c_nationkey = c_nat.n_nationkey
WHERE (s_nat.n_name = '{_Q7_NATIONS[0]}' AND c_nat.n_name = '{_Q7_NATIONS[1]}')
   OR (s_nat.n_name = '{_Q7_NATIONS[1]}' AND c_nat.n_name = '{_Q7_NATIONS[0]}')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

# ---------------------------------------------------------------------------
# Q9 shape: profit by part type and year — revenue minus a
# quantity-scaled cost (p_retailprice stands in for supplycost, which
# the schema lacks). Exercises mixed fact/dim arithmetic inside the
# aggregate with exact cents.
# ---------------------------------------------------------------------------


def _q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    profit = cents(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", F.year(F.to_date("l_shipdate")).alias("l_year"))
        .agg((F.sum(profit) / F.lit(100.0)).alias("profit"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_type", "l_year")
    )


_Q9_SQL = """
SELECT p_type,
       CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
       CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)
                            - p_retailprice * l_quantity * 0.1) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS profit,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
ORDER BY 1, 2
"""

# ---------------------------------------------------------------------------
# Native pivot: per-user event-type counts as columns. groupBy().pivot()
# with an EXPLICIT value list — at scale the explicit list is mandatory
# anyway (the implicit form runs a distinct scan first, and unbounded
# pivot width breaks the row format).
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
        .orderBy("user_id")
    )


_PIVOT_SQL = f"""
SELECT user_id,
       {", ".join(
           f"COUNT(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES
       )}
FROM events
GROUP BY 1
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# Q17 shape: lineitems under 20% of their part's average quantity. The
# correlated per-part AVG decorrelates into a grouped aggregate joined
# back on partkey — part-cardinality rows, so at scale the avg side is
# small relative to the fact and AQE/broadcast handles it. Quantities
# are quantized so the 0.2×avg threshold compares exact integers
# (avg = sum/count stays rational: compare q * 5 * count < sum).
# ---------------------------------------------------------------------------


def _q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load(spark, sf_dir, "lineitem")
    qcents = cents("l_quantity")
    avgs = (
        li.groupBy("l_partkey")
        .agg(F.sum(qcents).alias("sum_q"), F.count(F.lit(1)).alias("n_q"))
    )
    # q < 0.2 * (sum_q / n_q)  ⇔  q * 5 * n_q < sum_q  (exact integers)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avgs, "l_partkey")
        .filter(qcents * F.lit(5) * F.col("n_q") < F.col("sum_q"))
        .agg(
            (F.sum(cents("l_extendedprice")) / F.lit(100.0)).alias("total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


_Q17_SQL = """
WITH avgs AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_q,
         COUNT(*) AS n_q
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price,
       COUNT(*) AS n_small
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avgs USING (l_partkey)
WHERE p_brand = 'Brand#23'
  AND CAST(round(l_quantity * 100) AS BIGINT) * 5 * n_q < sum_q
"""

# ---------------------------------------------------------------------------
# Q22 shape: rich-but-idle customers — global scalar subquery (average
# balance of positive-balance customers) broadcast into a filter, then
# an anti join against orders. The scalar is one row: Spark plans it as
# a (free) broadcast; never recomputed per row.
# ---------------------------------------------------------------------------


# "Idle" = no order since the cutoff. The fixture has no order-less
# customer at all, so TPC-H's literal "no orders in 7 years" filter was
# vacuous here (VERDICT r6 finding #2); the recent-order restriction
# keeps the scalar-subquery + anti-join shape and yields 5 / 5 segment
# rows at sf0.001 / sf0.01.
_Q22_CUTOFF = "2000-01-01"


def _q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _Q22_CUTOFF
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(cents("c_acctbal")) / F.count(F.lit(1))).alias("avg_cents"))
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(cents("c_acctbal") > F.col("avg_cents"))
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(cents("c_acctbal")) / F.lit(100.0)).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


_Q22_SQL = f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / COUNT(*) AS avg_cents
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_balance
FROM customer, avg_bal
WHERE CAST(round(c_acctbal * 100) AS BIGINT) > avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '{_Q22_CUTOFF}')
GROUP BY 1
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# CUBE grouping sets: all 2^k subtotal combinations in one pass (ROLLUP's
# sibling — rollup_order_counts covers the hierarchical form). NULL
# grouping markers are replaced with a literal so the cross-engine hash
# compare is unambiguous.
# ---------------------------------------------------------------------------


def _status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("o_orderpriority"),
            "n_orders", "total_price",
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


_CUBE_SQL = """
SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus,
       coalesce(o_orderpriority, '<all>') AS o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY 1, 2
"""

# ---------------------------------------------------------------------------
# RANGE-frame window: per customer, revenue of all their orders within
# the trailing 30 days of each order — a value-based frame
# (rangeBetween), unlike the row-based frames in window_functions.
# Day-integer basis on both sides keeps the frame boundary exact.
# ---------------------------------------------------------------------------


def _trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_day"))
        .rangeBetween(-30, 0)
    )
    return (
        orders.select(
            "o_orderkey", "o_custkey", day.alias("o_day"), cents("o_totalprice").alias("c")
        )
        .withColumn("trailing_30d_orders", F.count(F.lit(1)).over(w))
        .withColumn("trailing_30d_total", (F.sum("c").over(w) / F.lit(100.0)))
        .select("o_orderkey", "o_custkey", "o_day",
                "trailing_30d_orders", "trailing_30d_total")
        .orderBy("o_orderkey")
    )


_TRAILING_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS o_day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
)
SELECT o_orderkey, o_custkey, o_day,
       COUNT(*) OVER w AS trailing_30d_orders,
       CAST(SUM(c) OVER w AS BIGINT) / 100.0 AS trailing_30d_total
FROM base
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""

# ---------------------------------------------------------------------------
# Q20 shape: semi-join against an aggregated keep-list — suppliers who
# shipped a large total of a brand's parts. The aggregation runs BEFORE
# the semi-join so the probe side carries only qualifying suppkeys.
# ---------------------------------------------------------------------------

Q20_QTY = 300


def _q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = load(spark, sf_dir, "lineitem")
    big_shippers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("qty"))
        .filter(F.col("qty") > Q20_QTY)
    )
    return (
        sup.join(big_shippers, sup.s_suppkey == big_shippers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name",
                F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


_Q20_SQL = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11'
  GROUP BY l_suppkey
  HAVING CAST(round(SUM(l_quantity)) AS BIGINT) > {Q20_QTY}
)
ORDER BY s_suppkey
"""

# ---------------------------------------------------------------------------
# Q8 shape: market share — one nation's fraction of yearly revenue
# among orders from customers in one region. Numerator and denominator
# are conditional exact-cent sums in the SAME aggregation; the share is
# one final IEEE division.
# ---------------------------------------------------------------------------

# NATION_3 sits in EUROPE in the fixture (region names are continent-style
# AFRICA/AMERICA/ASIA/EUROPE/MIDDLE EAST; nations are NATION_n). The region
# MUST be the one containing the target nation or the share is trivially 0;
# pre-r7 this was "REGION_1", which matched no fixture row and left the
# whole 6-table join vacuously green (VERDICT r6 finding #1).
_Q8_NATION = "NATION_3"
_Q8_REGION = "EUROPE"


def _q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    c_nat = nat.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_regionkey").alias("c_rk"))
    s_nat = nat.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    rev = cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    target = F.sum(F.when(F.col("supp_nation") == _Q8_NATION, rev)
                   .otherwise(F.lit(0).cast("long")))
    total = F.sum(rev)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(c_nat), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(reg), F.col("c_rk") == reg.r_regionkey)
        .filter(F.col("r_name") == _Q8_REGION)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(s_nat), supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year(F.to_date("o_orderdate")).alias("o_year"))
        .agg(
            (target / F.lit(100.0)).alias("nation_revenue"),
            (total / F.lit(100.0)).alias("total_revenue"),
            (target.cast("double") / total).alias("market_share"),
        )
        .orderBy("o_year")
    )


_Q8_SQL = f"""
SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
       CAST(SUM(CASE WHEN s_nat.n_name = '{_Q8_NATION}'
                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) / 100.0 AS nation_revenue,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_revenue,
       CAST(SUM(CASE WHEN s_nat.n_name = '{_Q8_NATION}'
                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS market_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation c_nat ON c_nationkey = c_nat.n_nationkey
JOIN region   ON c_nat.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation s_nat ON s_nationkey = s_nat.n_nationkey
WHERE r_name = '{_Q8_REGION}'
GROUP BY 1
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# Null-safe equality join: '' normalized to NULL, then joined with <=> —
# NULL keys MATCH each other (unlike plain =, which drops them). Oracle
# uses IS NOT DISTINCT FROM, the ANSI spelling of the same operator.
# ---------------------------------------------------------------------------


def _null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # Derive a nullable key: priority digit for urgent/high, else NULL.
    key = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        F.substring("o_orderpriority", 1, 1),
    )
    left = orders.select(F.col("o_orderkey").alias("l_key"), key.alias("l_pri"))
    tiers = spark.createDataFrame(
        [("1", "critical"), ("2", "elevated"), (None, "routine")],
        "t_pri: string, tier: string",
    )
    return (
        left.join(F.broadcast(tiers), left.l_pri.eqNullSafe(tiers.t_pri))
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("tier")
    )


_NULL_SAFE_SQL = """
WITH lhs AS (
  SELECT o_orderkey AS l_key,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN substring(o_orderpriority, 1, 1) END AS l_pri
  FROM orders
), tiers(t_pri, tier) AS (
  VALUES ('1', 'critical'), ('2', 'elevated'), (NULL, 'routine')
)
SELECT tier, COUNT(*) AS n_orders
FROM lhs JOIN tiers ON l_pri IS NOT DISTINCT FROM t_pri
GROUP BY 1
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# Q21 shape: suppliers who were the ONLY late shipper on multi-supplier
# orders (lateness adapted to shipdate > orderdate + 60d — the schema
# has no commit/receipt dates). EXISTS (another supplier on the order)
# + NOT EXISTS (another LATE supplier on the order) decorrelate into a
# semi-join and an anti-join on the order key.
# ---------------------------------------------------------------------------


def _q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey",
                                                "l_shipdate")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.to_date("l_shipdate")
                > F.date_add(F.to_date("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # EXISTS another supplier on the same order:
    other_supp = pairs.select(F.col("l_orderkey").alias("o2"),
                              F.col("l_suppkey").alias("s2"))
    multi = late.join(
        other_supp,
        (late.l_orderkey == F.col("o2")) & (late.l_suppkey != F.col("s2")),
        "left_semi",
    )
    # NOT EXISTS another LATE supplier on the same order:
    other_late = late.select(F.col("l_orderkey").alias("o3"),
                             F.col("l_suppkey").alias("s3"))
    sole = multi.join(
        other_late,
        (multi.l_orderkey == F.col("o3")) & (multi.l_suppkey != F.col("s3")),
        "left_anti",
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(25)
    )


_Q21_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM late l JOIN supplier ON l.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM pairs p
    WHERE p.l_orderkey = l.l_orderkey AND p.l_suppkey <> l.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l2
    WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey
  )
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 25
"""

# ---------------------------------------------------------------------------
# Q11 shape: groups whose total exceeds a FRACTION of the global total —
# the scaled-global-threshold pattern. Both aggregates are exact integer
# cents; the fraction comparison is integer-only (group * N > global)
# so no float threshold crosses engines.
# ---------------------------------------------------------------------------

Q11_FRACTION_DEN = 25  # keep groups holding > 1/25th of the global total


def _q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    per_nation = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(cents("s_acctbal")).alias("bal_cents"))
    )
    total = per_nation.agg(F.sum("bal_cents").alias("total_cents"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("bal_cents") * Q11_FRACTION_DEN > F.col("total_cents"))
        .select("n_name", (F.col("bal_cents") / F.lit(100.0)).alias("nation_balance"))
        .orderBy("n_name")
    )


_Q11_SQL = f"""
WITH per_nation AS (
  SELECT n_name,
         CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1
)
SELECT n_name, bal_cents / 100.0 AS nation_balance
FROM per_nation
WHERE bal_cents * {Q11_FRACTION_DEN} > (SELECT SUM(bal_cents) FROM per_nation)
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# Q15 shape: top-revenue supplier(s) — an aggregate compared against the
# max OF that aggregate. The one-row max broadcasts; ties all surface
# (no arbitrary limit), which is the part naive top-1 queries get wrong.
# ---------------------------------------------------------------------------


def _q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-04-01"))
    )
    sup = load(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
             .alias("rev_cents"))
    )
    top = rev.agg(F.max("rev_cents").alias("max_cents"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name",
                (F.col("rev_cents") / F.lit(100.0)).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_cents = (SELECT MAX(rev_cents) FROM rev)
ORDER BY s_suppkey
"""

# ---------------------------------------------------------------------------
# Q16 shape: supplier variety per part attribute, excluding an
# unwanted-brand list — NOT IN compiles to an anti join, then
# count-distinct per group.
# ---------------------------------------------------------------------------

_Q16_EXCLUDED_BRANDS = ("Brand#1", "Brand#2")


def _q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin(*_Q16_EXCLUDED_BRANDS)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_type"), F.asc("p_size"))
        .limit(50)
    )


_Q16_SQL = f"""
SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN {_Q16_EXCLUDED_BRANDS!r}
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_type ASC, p_size ASC
LIMIT 50
"""

# ---------------------------------------------------------------------------
# SQL-API entry path: the same engine driven through spark.sql over
# registered temp views — Catalyst produces the identical plan as the
# DataFrame form, and the text is near-verbatim the DuckDB oracle
# (differences: explicit casts only). Demonstrates the spark.sql surface
# users of SQL-first tooling expect.
# ---------------------------------------------------------------------------

# NB: ``/ 100.0`` alone would diverge — Spark's SQL parser types the
# literal as DECIMAL (→ Decimal result) while DuckDB yields DOUBLE; the
# explicit CAST keeps one identical text valid and double-typed on both.
_SQL_API_QUERY = """
SELECT n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         / CAST(100.0 AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
GROUP BY n_name
HAVING COUNT(*) >= 5
ORDER BY n_name
"""


def _sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_SQL_API_QUERY)


# ---------------------------------------------------------------------------
# Set operations (T1/T2/T3, PIPE:941-956): intersect / except / union with
# provenance tags.
# ---------------------------------------------------------------------------


def _nation_balance_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    rich = joined.filter(F.col("c_acctbal") > 9500).select("n_name").distinct()
    poor = joined.filter(F.col("c_acctbal") < 0).select("n_name").distinct()
    return (
        rich.intersect(poor).withColumn("tag", F.lit("both"))
        .unionAll(rich.subtract(poor).withColumn("tag", F.lit("rich_only")))
        .unionAll(poor.subtract(rich).withColumn("tag", F.lit("poor_only")))
    )


_SETOPS_SQL = """
WITH rich AS (
  SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_acctbal > 9500
), poor AS (
  SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_acctbal < 0
)
SELECT n_name, 'both' AS tag FROM (SELECT n_name FROM rich INTERSECT SELECT n_name FROM poor)
UNION ALL
SELECT n_name, 'rich_only' AS tag FROM (SELECT n_name FROM rich EXCEPT SELECT n_name FROM poor)
UNION ALL
SELECT n_name, 'poor_only' AS tag FROM (SELECT n_name FROM poor EXCEPT SELECT n_name FROM rich)
"""

# ---------------------------------------------------------------------------
# Conditional aggregation / pivot-style rollup (A2/A4 count matching by
# group, PIPE:797-809) — one pass, no pivot shuffle.
# ---------------------------------------------------------------------------


def _status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")

    def n(status: str):
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0))

    def total(status: str):
        return (
            F.sum(
                F.when(F.col("o_orderstatus") == status, cents("o_totalprice"))
                .otherwise(F.lit(0).cast("long"))
            )
            / F.lit(100.0)
        )

    return orders.groupBy("o_orderpriority").agg(
        n("F").alias("n_f"), n("O").alias("n_o"), n("P").alias("n_p"),
        total("F").alias("total_f"), total("O").alias("total_o"),
        total("P").alias("total_p"),
    )


_STATUS_ROLLUP_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS total_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS total_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS total_p
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Window-function battery: running totals, ranks, lag/lead deltas — the
# §2.6 ordering operators generalized. One shuffle on the partition key;
# all window work is partition-local.
# ---------------------------------------------------------------------------


def _window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price_c = cents("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.row_number().over(w).alias("order_seq"),
        F.rank().over(
            Window.partitionBy("o_custkey").orderBy(price_c.desc(), F.col("o_orderkey"))
        ).alias("price_rank"),
        (F.sum(price_c).over(wrun) / F.lit(100.0)).alias("running_spend"),
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w)),
        ).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


_WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(row_number() OVER w AS INT) AS order_seq,
       CAST(rank() OVER (PARTITION BY o_custkey
                         ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                                  o_orderkey) AS INT) AS price_rank,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0 AS running_spend,
       CAST(date_diff('day',
                      CAST(lag(o_orderdate) OVER w AS DATE),
                      CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev,
       lead(o_orderkey) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

# ---------------------------------------------------------------------------
# Salted two-stage aggregation — the skew pattern from SURVEY §4/§7.4.7:
# pre-aggregate on (key, salt) so one hot key spreads over N reducers,
# then combine the tiny partials. Result is identical to a plain groupBy
# (exact integer sums are associative), which is what the oracle runs.
# ---------------------------------------------------------------------------

N_SALTS = 16


def _skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    salt = F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).alias("salt")
    partial = (
        ev.groupBy(F.col("event_type"), salt)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("value")).alias("v"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("v") / F.lit(100.0)).alias("value_total"),
        )
    )


_SKEW_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS value_total
FROM events
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Grouping sets: ROLLUP over (priority, status) — subtotals + grand total
# in one pass (Spark expands to a single shuffle with grouping-id).
# ---------------------------------------------------------------------------


def _rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total_spend"),
        )
    )


_ROLLUP_SQL = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_spend
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""

# ---------------------------------------------------------------------------
# Changelog compaction: the reference's RecordOperation Add/Change/Delete
# semantics (GEN:137 'A (Add), C (Change), D (Delete)'; rule R1) applied
# as a dataflow. The reference only VALIDATES the op column — the
# downstream system it feeds applies the ops to current state; this
# operator is that application, CDC-style: latest record per key wins,
# a trailing delete removes the key. Orders stand in for the changelog
# (key = o_custkey, version = (o_orderdate, o_orderkey), status 'F' =
# delete). One shuffle on the key; the window work is in-partition —
# the shape that compacts a 100 TB changelog.
# ---------------------------------------------------------------------------


def _changelog_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("o_orderstatus") != "F")  # trailing delete drops key
    )
    return (
        latest.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_live_keys"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("live_value"),
        )
    )


_CHANGELOG_SQL = """
WITH latest AS (
  SELECT *,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_orderpriority,
       COUNT(*) AS n_live_keys,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS live_value
FROM latest
WHERE rn = 1 AND o_orderstatus <> 'F'
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# SCD2 interval construction: the other half of the RecordOperation
# story. changelog_latest_state compacts to CURRENT state; a warehouse
# also needs the HISTORY — each change record becomes a validity
# interval [valid_from, valid_to) closed by the key's next change
# (Kimball type-2 dimension build from a CDC stream). Delete records
# ('F' status standing in for RecordOperation D, as above) close their
# predecessor's interval but emit no interval of their own.
#
# Scale shape: one shuffle on the key; lead() is in-partition window
# work over each key's (date, id)-ordered history — no self-join of
# the changelog against itself, which is the naive SQL formulation
# and quadratic per key.
# ---------------------------------------------------------------------------


def _changelog_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select("o_custkey", "o_orderkey", "o_orderdate",
                      "o_orderstatus")
        .withColumn("valid_to", F.lead("o_orderdate").over(w))
        .filter(F.col("o_orderstatus") != "F")
        .select(
            "o_custkey", "o_orderkey",
            F.col("o_orderdate").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().cast("int").alias("is_current"),
            F.datediff("valid_to", "o_orderdate").alias("active_days"),
        )
    )


_SCD2_SQL = """
WITH ordered AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate ASC, o_orderkey ASC)
           AS valid_to
  FROM orders
)
SELECT o_custkey, o_orderkey,
       o_orderdate AS valid_from,
       valid_to,
       CAST(valid_to IS NULL AS INT) AS is_current,
       CAST(date_diff('day', o_orderdate, valid_to) AS INT) AS active_days
FROM ordered
WHERE o_orderstatus <> 'F'
"""

# ---------------------------------------------------------------------------
# Schema-drift detection (R24): compare an arriving frame's columns to an
# expected contract, reporting ok/missing/extra per column — the file-
# level validation the reference runs before row rules (PIPE:2279-2408).
# ---------------------------------------------------------------------------

_EXPECTED_CUSTOMER = (
    "c_custkey", "c_name", "c_nationkey", "c_acctbal",
    "c_mktsegment", "c_loyalty_tier",   # deliberately not in the data
)


def _schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    actual = load(spark, sf_dir, "customer").columns
    expected = _EXPECTED_CUSTOMER
    rows = [(c, "ok" if c in actual else "missing") for c in expected]
    rows += [(c, "extra") for c in actual if c not in expected]
    return spark.createDataFrame(
        sorted(rows), schema="column_name string, status string"
    )


_SCHEMA_DRIFT_SQL = """
WITH actual AS (
  SELECT column_name
  FROM (DESCRIBE customer)
), expected AS (
  SELECT unnest(['c_custkey', 'c_name', 'c_nationkey', 'c_acctbal',
                 'c_mktsegment', 'c_loyalty_tier']) AS column_name
)
SELECT e.column_name,
       CASE WHEN a.column_name IS NULL THEN 'missing' ELSE 'ok' END AS status
FROM expected e LEFT JOIN actual a USING (column_name)
UNION ALL
SELECT a.column_name, 'extra' AS status
FROM actual a LEFT JOIN expected e USING (column_name)
WHERE e.column_name IS NULL
"""


# ---------------------------------------------------------------------------
# Q4 shape: priority counts over orders with EXISTS-style semi-join that
# carries a non-equi condition (late shipment). The semi-join keeps the
# orders side un-duplicated — no fan-out, no distinct needed — and the
# extra predicate rides the join instead of a second pass.
# ---------------------------------------------------------------------------


def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1997-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-07-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (F.to_date(li.l_shipdate) > F.date_add(F.to_date(orders.o_orderdate), 60)),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
  )
GROUP BY 1
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# Q12 shape: two-way conditional counts (high- vs low-priority orders) per
# lineitem status — CASE-sum inside one hash agg after an equi-join.
# ---------------------------------------------------------------------------


def _q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_priority_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
GROUP BY 1
ORDER BY 1
"""

# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — left outer join so
# zero-order customers survive, then a second aggregation over the first
# (count-of-counts). Two shuffles by construction; the first groups on
# the join key so it reuses the join's partitioning.
# ---------------------------------------------------------------------------


def _q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY 1
)
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""

# ---------------------------------------------------------------------------
# Q18 shape: large-volume orders — agg-filtered key list (HAVING) joined
# back to the fact tables, deterministic top-100. The keep-list join is
# the same shape as corpus_clean's dedup keep-list semi-join.
# ---------------------------------------------------------------------------

Q18_QTY_THRESHOLD = 200


def _q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_totalprice,
       CAST(round(total_qty) AS BIGINT) AS total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING CAST(round(SUM(l_quantity)) AS BIGINT) > {Q18_QTY_THRESHOLD}
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicates (brand × size ×
# quantity OR-branches) over a broadcast part join. Catalyst pushes the
# part-only disjuncts into the dim scan; the OR across joined columns
# stays as the join filter.
# ---------------------------------------------------------------------------


def _q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        joined.filter(branch1 | branch2 | branch3)
        .agg(
            (F.sum(cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
             / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q19_SQL = """
SELECT CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Events: ordered funnel analysis — per-user staged conversion through
# view → click → purchase, each stage strictly after the previous one
# AND within the conversion window (funnels without a window are
# vacuous on long-lived users: given enough time everyone "converts").
# FIRST-TOUCH semantics, the common product-analytics convention: each
# stage anchors to the EARLIEST qualifying event, so a user whose first
# in-window click leads nowhere counts as stalled even if a later
# click→purchase chain would have qualified (any-path attribution is a
# different, strictly more expensive operator — per-user sequence scan).
# Three conditional min-aggregations chained by joins, all keyed on the
# uniform user_id (AQE coalesces the small exchanges); the per-user
# event history never needs to be collected or sorted whole. The
# single-groupBy sorted-array-fold alternative saves two shuffles but
# drags every event row's payload through one aggregate — the 3-join
# form shuffles only (user_id, ts) pairs per stage.
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("view", "click", "purchase")
#: Conversion window per stage transition: next stage within 24 h.
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000


def _events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    a, b, c = _FUNNEL_STAGES
    s1 = (
        ev.filter(F.col("event_type") == a)
        .groupBy("user_id").agg(F.min("ts_us").alias("t1_us"))
    )
    s2 = (
        ev.filter(F.col("event_type") == b)
        .join(s1, "user_id")
        .filter((F.col("ts_us") > F.col("t1_us"))
                & (F.col("ts_us") <= F.col("t1_us") + FUNNEL_WINDOW_US))
        .groupBy("user_id").agg(F.min("ts_us").alias("t2_us"))
    )
    s3 = (
        ev.filter(F.col("event_type") == c)
        .join(s2, "user_id")
        .filter((F.col("ts_us") > F.col("t2_us"))
                & (F.col("ts_us") <= F.col("t2_us") + FUNNEL_WINDOW_US))
        .groupBy("user_id").agg(F.min("ts_us").alias("t3_us"))
    )
    stage = (
        F.lit(1)
        + F.col("t2_us").isNotNull().cast("int")
        + F.col("t3_us").isNotNull().cast("int")
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "t1_us", "t2_us", "t3_us", stage.alias("stage"))
    )


_FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), s1 AS (
  SELECT user_id, MIN(ts_us) AS t1_us FROM ev
  WHERE event_type = '{_FUNNEL_STAGES[0]}' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(e.ts_us) AS t2_us
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STAGES[1]}' AND e.ts_us > s1.t1_us
    AND e.ts_us <= s1.t1_us + {FUNNEL_WINDOW_US}
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(e.ts_us) AS t3_us
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STAGES[2]}' AND e.ts_us > s2.t2_us
    AND e.ts_us <= s2.t2_us + {FUNNEL_WINDOW_US}
  GROUP BY 1
)
SELECT s1.user_id, s1.t1_us, s2.t2_us, s3.t3_us,
       CAST(1 + (CASE WHEN s2.t2_us IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN s3.t3_us IS NOT NULL THEN 1 ELSE 0 END) AS INT)
         AS stage
FROM s1
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


# ---------------------------------------------------------------------------
# Q2 shape: min-cost supplier — the correlated-min subquery over a
# supply relation, restricted to one region, with Q2's tie-broken
# top-k ordering. The fixture has no partsupp table, so the supply
# relation derives from lineitem: a supplier's cost for a part = the
# minimum unit price (exact cents of price/qty) it ever charged for
# it — same grain as partsupp (one row per (part, supplier)).
# Written DECORRELATED, the shape that scales: one hash-agg builds
# per-(part, supplier) costs, then a partkey-partitioned window min
# keeps the argmin rows in the same pass — the textbook correlated
# subquery would re-scan supply per part, and the self-join form would
# scan lineitem twice and sort-merge the two aggregates (the plan Spark
# actually produced for it — no common-subplan reuse). Two shuffles
# total: the supply hash-agg and the window repartition; plan-gated in
# tests/test_plans.py.
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_SIZE_MOD = 5
_Q2_TOPK = 100


def _q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    supply = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.min(cents(F.col("l_extendedprice") / F.col("l_quantity")))
            .alias("unit_cents")
        )
    )
    eu = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .filter(F.col("r_name") == _Q2_REGION)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_supply = supply.join(
        F.broadcast(eu), supply.suppkey == eu.s_suppkey
    )
    parts = part.filter(F.col("p_size") % _Q2_SIZE_MOD == 0).select(
        "p_partkey", "p_brand"
    )
    min_w = Window.partitionBy("partkey")
    return (
        eu_supply.withColumn("min_cents", F.min("unit_cents").over(min_w))
        .filter(F.col("unit_cents") == F.col("min_cents"))
        .join(F.broadcast(parts), F.col("partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            (F.col("unit_cents") / F.lit(100.0)).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
                 F.asc("p_partkey"))
        .limit(_Q2_TOPK)
    )


_Q2_SQL = f"""
WITH supply AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT))
           AS unit_cents
  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{_Q2_REGION}'
), eu_supply AS (
  SELECT * FROM supply JOIN eu ON suppkey = s_suppkey
), min_per_part AS (
  SELECT partkey, MIN(unit_cents) AS min_cents FROM eu_supply GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       unit_cents / 100.0 AS unit_cost
FROM eu_supply
JOIN min_per_part USING (partkey)
JOIN part ON partkey = p_partkey
WHERE unit_cents = min_cents AND p_size % {_Q2_SIZE_MOD} = 0
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT {_Q2_TOPK}
"""


RELATIONAL_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("q1_pricing_summary", _q1, _Q1_SQL,
              "TPC-H Q1-shaped scan→filter→agg; quantized exact sums.", bench=True),
        Query("q2_min_cost_supplier", _q2, _Q2_SQL,
              "TPC-H Q2 shape: decorrelated per-part regional min-cost "
              "argmin over a lineitem-derived supply relation, "
              "tie-broken top-100."),
        Query("q3_shipping_priority", _q3, _Q3_SQL,
              "3-way join + agg + deterministic top-10.", bench=True),
        Query("q5_local_supplier", _q5, _Q5_SQL,
              "6-way join with broadcast dims (TPC-H Q5 shape).", bench=True),
        Query("q6_forecast_revenue", _q6, _Q6_SQL,
              "Pure scan+filter+sum; full predicate pushdown (TPC-H Q6 shape).",
              bench=True),
        Query("q10_returned_items", _q10, _Q10_SQL,
              "Returned-item revenue top-20 (TPC-H Q10 shape).", bench=True),
        Query("q14_promo_share", _q14, _Q14_SQL,
              "Conditional-sum revenue share (TPC-H Q14 shape)."),
        Query("q4_late_orders", _q4, _Q4_SQL,
              "EXISTS semi-join with non-equi condition (TPC-H Q4 shape)."),
        Query("q12_priority_by_status", _q12, _Q12_SQL,
              "Two-way conditional counts after equi-join (TPC-H Q12 shape)."),
        Query("q13_order_count_distribution", _q13, _Q13_SQL,
              "Outer-join count-of-counts distribution (TPC-H Q13 shape)."),
        Query("q18_large_volume_orders", _q18, _Q18_SQL,
              "HAVING keep-list joined back to facts, top-100 (TPC-H Q18 "
              "shape).", bench=True),
        Query("q19_disjunctive_predicates", _q19, _Q19_SQL,
              "OR-of-conjuncts predicate over broadcast dim join (TPC-H Q19 shape)."),
        Query("top_customers", _top_customers, _TOP_CUSTOMERS_SQL,
              "Join + agg + tie-broken top-k (O1/O2)."),
        Query("customers_with_high_value_orders", _customers_with_high_value_orders,
              _SEMI_SQL, "Left-semi join (J2 IN-list fetch)."),
        Query("customers_without_orders", _customers_without_orders, _ANTI_SQL,
              "Left-anti join (T1 key-set difference)."),
        Query("latest_order_per_customer", _latest_order_per_customer, _LATEST_SQL,
              "Window row_number dedup (O1 latest-file selection).", bench=True),
        Query("duplicate_customer_priority", _duplicate_customer_priority, _DUPES_SQL,
              "Duplicate-key detection via groupBy-having (R23)."),
        Query("priorities_per_customer", _priorities_per_customer, _COLLECT_SQL,
              "Per-key sorted collect_set (A1 payee→errors grouping)."),
        Query("string_functions", _string_functions, _STRING_SQL,
              "Scalar string function battery (§2.9)."),
        Query("date_functions", _date_functions, _DATE_SQL,
              "Scalar date function battery (§2.9)."),
        Query("events_hourly_rollup", _events_hourly_rollup, _EVENTS_ROLLUP_SQL,
              "Tumbling-window rollup + regex prop extraction.", bench=True),
        Query("events_sessionize", _events_sessionize, _SESSIONIZE_SQL,
              "Gap-based sessionization via lag + cumulative windows.", bench=True),
        Query("events_asof_join", _events_asof_join, _ASOF_SQL,
              "As-of join via union + carry-forward window (oracle: native "
              "ASOF LEFT JOIN).", bench=True),
        Query("events_range_join", _events_range_join, _RANGE_JOIN_SQL,
              "Grid-bucketed range join (equi-join on bucket key instead "
              "of nested-loop BETWEEN).", bench=True),
        Query("events_funnel", _events_funnel, _FUNNEL_SQL,
              "Ordered funnel conversion: per-user staged min-timestamps "
              "(view → click → purchase, strictly increasing) via "
              "chained conditional aggregations on the user key."),
        Query("min_balance_suppliers", _min_balance_suppliers, _MIN_BAL_SQL,
              "Correlated min subquery decorrelated to a window (TPC-H Q2 "
              "essence)."),
        Query("order_value_percentiles", _order_percentiles, _PERCENTILES_SQL,
              "Exact percentiles + count-distinct per priority over integer "
              "cents."),
        Query("q7_bilateral_trade", _q7, _Q7_SQL,
              "Bilateral nation-pair revenue with OR-direction predicate "
              "(TPC-H Q7 shape)."),
        Query("q9_product_profit", _q9, _Q9_SQL,
              "Profit by part type and year with dim-scaled cost (TPC-H "
              "Q9 shape)."),
        Query("events_type_pivot", _events_pivot, _PIVOT_SQL,
              "Native pivot with explicit value list (mandatory at scale)."),
        Query("status_priority_cube", _status_priority_cube, _CUBE_SQL,
              "CUBE grouping sets: all subtotal combinations in one pass."),
        Query("trailing_30d_window", _trailing_window, _TRAILING_SQL,
              "Value-based RANGE window frame (trailing 30 days per "
              "customer)."),
        Query("sql_api_segment_balances", _sql_api, _SQL_API_QUERY,
              "spark.sql over temp views — the SQL entry path; oracle is "
              "the same text."),
        Query("q20_brand_volume_suppliers", _q20, _Q20_SQL,
              "Semi-join against an aggregated keep-list (TPC-H Q20 shape)."),
        Query("q8_market_share", _q8, _Q8_SQL,
              "Conditional-sum market-share ratio per year (TPC-H Q8 "
              "shape)."),
        Query("null_safe_tier_join", _null_safe_join, _NULL_SAFE_SQL,
              "Null-safe equality join (<=> / IS NOT DISTINCT FROM)."),
        Query("q21_sole_late_supplier", _q21, _Q21_SQL,
              "EXISTS + NOT EXISTS on the same fact via semi- and "
              "anti-joins (TPC-H Q21 shape)."),
        Query("q11_important_balances", _q11, _Q11_SQL,
              "Groups above a fraction of the global total, integer-only "
              "threshold (TPC-H Q11 shape)."),
        Query("q15_top_supplier", _q15, _Q15_SQL,
              "Aggregate vs max-of-aggregate with ties surfaced (TPC-H Q15 "
              "shape)."),
        Query("q16_supplier_variety", _q16, _Q16_SQL,
              "NOT-IN brand exclusion + count-distinct per group (TPC-H "
              "Q16 shape)."),
        Query("q17_small_quantity_revenue", _q17, _Q17_SQL,
              "Correlated per-part AVG threshold decorrelated to a grouped "
              "join (TPC-H Q17 shape, exact rational compare)."),
        Query("q22_idle_rich_customers", _q22, _Q22_SQL,
              "Global scalar subquery broadcast + anti join (TPC-H Q22 "
              "shape)."),
        Query("nation_balance_setops", _nation_balance_setops, _SETOPS_SQL,
              "INTERSECT/EXCEPT/UNION with provenance tags (T1-T3)."),
        Query("status_rollup", _status_rollup, _STATUS_ROLLUP_SQL,
              "Pivot-style conditional aggregation in one pass (A2/A4)."),
        Query("window_functions", _window_functions, _WINDOW_SQL,
              "Running totals, ranks, lag/lead deltas per customer."),
        Query("skew_salted_rollup", _skew_salted_rollup, _SKEW_SQL,
              "Two-stage salted aggregation (skew pattern); oracle is the "
              "equivalent plain groupBy."),
        Query("schema_drift", _schema_drift, _SCHEMA_DRIFT_SQL,
              "File-level schema validation: ok/missing/extra columns (R24)."),
        Query("rollup_order_counts", _rollup_order_counts, _ROLLUP_SQL,
              "ROLLUP grouping sets: subtotals + grand total in one pass."),
        Query("changelog_latest_state", _changelog_latest_state,
              _CHANGELOG_SQL,
              "RecordOperation A/C/D applied as CDC compaction: latest "
              "record per key wins, trailing delete drops the key."),
        Query("changelog_scd2", _changelog_scd2, _SCD2_SQL,
              "SCD2 history build from the changelog: per-key lead() "
              "closes each validity interval, deletes close but don't "
              "emit — one key shuffle, no changelog self-join."),
    ]
}


# ---------------------------------------------------------------------------
# Events: cohort retention — the weekly retention triangle. Users are
# cohorted by the week of their first event; each (cohort_week,
# week_offset) cell counts distinct users active that many weeks later.
# Two uniform-key shuffles (user_id for the cohort min + the distinct
# activity weeks, then the tiny (cohort, offset) rollup); the per-user
# event history is never collected. Weeks are integer epoch-week
# numbers, so every value is exact cross-engine.
# ---------------------------------------------------------------------------

_US_PER_WEEK = 7 * 24 * 3600 * 1_000_000


def _events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "ts_us")
    # Deterministic onboarding stagger: the fixture's users all start in
    # the same week, which would collapse the triangle to one cohort.
    # Treating events before a (user_id % 4)-week per-user "signup" as
    # pre-onboarding spreads users over four cohorts — mirrored in the
    # oracle, and exactly the filter a real pipeline applies with true
    # signup dates.
    gmin = ev.agg(F.min("ts_us").alias("__g"))
    ev = (
        ev.crossJoin(F.broadcast(gmin))
        .filter(
            F.col("ts_us")
            >= F.col("__g") + (F.col("user_id") % 4) * F.lit(_US_PER_WEEK)
        )
        .select("user_id", "ts_us")
    )
    week = F.expr(f"ts_us div {_US_PER_WEEK}")
    cohorts = ev.groupBy("user_id").agg(
        F.min(week).alias("cohort_week")
    )
    active = ev.select("user_id", week.alias("week")).distinct()
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_RETENTION_SQL = f"""
WITH raw AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events
), ev AS (
  SELECT user_id, ts_us // {_US_PER_WEEK} AS week
  FROM raw
  WHERE ts_us >= (SELECT MIN(ts_us) FROM raw)
                 + (user_id % 4) * {_US_PER_WEEK}
), cohorts AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1
), active AS (
  SELECT DISTINCT user_id, week FROM ev
)
SELECT c.cohort_week,
       a.week - c.cohort_week AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Events: type-transition matrix — counts of consecutive event-type
# pairs per user stream (the input to Markov-chain/session-model
# analyses). One shuffle on user_id for the lag window (ties broken by
# event_id, so the sequence is total and engine-independent), then the
# tiny (from_type, to_type) rollup. Probabilities are exact integer
# ratios quantized to milli — cross-engine identical.
# ---------------------------------------------------------------------------


def _events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "event_id",
                                           "event_type", "ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.select(
        "from_type", "to_type", "n",
        F.expr("(1000 * n) div sum(n) over (partition by from_type)")
        .alias("p_milli"),
    )


_TRANSITIONS_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS next_type
  FROM ev
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST((1000 * n) // CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
            AS BIGINT) AS p_milli
FROM pairs
"""


# ---------------------------------------------------------------------------
# Events: hourly anomaly detection — the alerting read-out over the
# rollup stream. The 2σ rule evaluated in EXACT integers: with N hours,
# S = Σn and Q = Σn² per event type, |n − μ| > 2σ multiplies out to
# (N·n − S)² > 4·(N·Q − S²), so the flag is bit-identical in any engine
# — no float mean, no float variance, no sqrt. Two tiny shuffles: the
# (type, hour) rollup, then the per-type stats broadcast back onto the
# hourly rows. At 100 TB the hourly table is already minute compared to
# the event stream; everything after the first rollup is negligible.
# ---------------------------------------------------------------------------


def hourly_anomalies(ev: DataFrame) -> DataFrame:
    """Anomalous (event_type, hour) cells of an events frame carrying
    ``event_type`` and ``ts_us`` columns."""
    hourly = (
        ev.groupBy(
            "event_type",
            F.expr(f"ts_us div {_US_PER_HOUR}").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # 100 TB overflow discipline (the Mann-Whitney r11 lesson): with a
    # hot event type at ~3×10⁹ events, S² and Σn² leave int64 — Spark
    # would wrap silently while DuckDB errors. Accumulate Q and run the
    # (N·n − S)² > 4(N·Q − S²) comparison in DECIMAL(38,0)/HUGEINT;
    # the OUTPUT columns stay BIGINT (mean, sign — always in range).
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("s_tot"),
        F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * n")).alias("q_tot"),
    )
    dev = F.expr("CAST(n_hours AS DECIMAL(38,0)) * n - s_tot")
    var4 = F.expr(
        "4 * (CAST(n_hours AS DECIMAL(38,0)) * q_tot"
        "     - CAST(s_tot AS DECIMAL(38,0)) * s_tot)"
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(dev * dev > var4)
        .select(
            "event_type",
            (F.col("hour") * F.lit(3600)).alias("hour_epoch"),
            F.col("n").alias("n_events"),
            "n_hours",
            # 1000·S stays in the 128-bit lane too (ADVICE r12): past
            # ~9.2e15 events per type int64 would wrap on Spark while
            # DuckDB errors — same class as q_tot/dev/var4 above.
            F.expr(
                "CAST((1000 * CAST(s_tot AS DECIMAL(38,0))) div n_hours"
                "     AS BIGINT)"
            ).alias("mean_milli"),
            F.when(dev > 0, F.lit(1)).otherwise(F.lit(-1))
            .cast("int").alias("dev_sign"),
        )
    )


def _events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_anomalies(load_events(spark, sf_dir))


_ANOMALIES_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(n) AS BIGINT) AS s_tot,
         SUM(CAST(n AS HUGEINT) * n) AS q_tot
  FROM hourly GROUP BY 1
)
SELECT h.event_type,
       h.hour * 3600 AS hour_epoch,
       h.n AS n_events,
       s.n_hours,
       CAST((1000 * CAST(s.s_tot AS HUGEINT)) // s.n_hours AS BIGINT)
         AS mean_milli,
       CAST(CASE WHEN CAST(s.n_hours AS HUGEINT) * h.n - s.s_tot > 0
                 THEN 1 ELSE -1 END AS INT) AS dev_sign
FROM hourly h JOIN stats s USING (event_type)
WHERE (CAST(s.n_hours AS HUGEINT) * h.n - s.s_tot)
      * (CAST(s.n_hours AS HUGEINT) * h.n - s.s_tot)
      > 4 * (CAST(s.n_hours AS HUGEINT) * s.q_tot
             - CAST(s.s_tot AS HUGEINT) * s.s_tot)
"""


#: Past-gate additions (registered AFTER the relational priority list in
#: queries/__init__.py): repo-local parity covers them until a future
#: rotation brings them into the driver window.
# ---------------------------------------------------------------------------
# Z-order cell census — cross-engine parity for the Morton-key bit math
# that `plans/layout.py` clusters files by (the layout benefit itself is
# measured from parquet row-group statistics in tests/test_layout.py;
# this query pins that both engines compute identical interleaved keys,
# so a DuckDB-side reader agrees on cell membership).
# ---------------------------------------------------------------------------

_Z_SIDE_BITS = 10          # 10-bit x and y → 20-bit Morton key
_Z_CELL_SHIFT = 12         # keep the top 8 key bits → ≤256 cells


def _zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_validator_github_spark.plans.layout import zorder_key

    orders = load(spark, sf_dir, "orders")
    side = 1 << _Z_SIDE_BITS
    keyed = orders.select(
        zorder_key(
            F.col("o_custkey") % side,
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")) % side,
            bits=_Z_SIDE_BITS,
        ).alias("z")
    )
    return (
        keyed.groupBy(F.shiftright("z", _Z_CELL_SHIFT).alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def _zorder_sql() -> str:
    side = 1 << _Z_SIDE_BITS
    terms = []
    for i in range(_Z_SIDE_BITS):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i + 1})")
    z = " + ".join(terms)
    return f"""
WITH xy AS (
  SELECT CAST(o_custkey % {side} AS BIGINT) AS x,
         CAST(datediff('day', DATE '1970-01-01', o_orderdate) % {side}
              AS BIGINT) AS y
  FROM orders
), keyed AS (
  SELECT ({z}) AS z FROM xy
)
SELECT z >> {_Z_CELL_SHIFT} AS cell, COUNT(*) AS n_orders
FROM keyed GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Trend detection: per-type OLS slope over the hourly volume series,
# kept in EXACT integers — the regression identity
#   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
# needs no float moments, and the slope is invariant under shifting x,
# so x is rebased to (hour − min hour per type) first. Rebasing is the
# load-bearing trick for BOTH engines: raw epoch-hours (~4.9e5) would
# push n·Σx² toward BIGINT range at year-long spans, while rebased x
# is bounded by the series length. Output is the exact (numerator,
# denominator) pair — as STRING since r12: with hourly counts ~10⁹ the
# pair leaves int64, so the moments accumulate in DECIMAL(38,0)/
# HUGEINT and the digits go out representation-stable (contract.py's
# decimal-free rule) — plus their milli-quotient via floor() on the
# identical double quotient (numerator may be negative — the
# contract.py rule for possibly-negative division).
#
# Scale shape: one input-sized hash-agg (the hourly rollup), then a
# min-window + final agg that both reuse the rollup's type
# partitioning — bounded by calendar span × types, like the gap-fill.
# ---------------------------------------------------------------------------


def _events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            "event_type",
            F.expr(f"ts_us div {_US_PER_HOUR}").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    rebased = hourly.select(
        "event_type", "y",
        (F.col("h")
         - F.min("h").over(Window.partitionBy("event_type"))).alias("x"),
    )
    # 100 TB overflow discipline (the Mann-Whitney r11 lesson): with
    # hourly counts y ~ 10⁹ per hot type, n·Σxy leaves int64 even
    # after the rebasing trick bounds x. Accumulate the moments in
    # DECIMAL(38,0)/HUGEINT and emit the exact (num, den) pair as
    # STRING (decimal-free-schema contract); the milli quotient is the
    # same single decimal→double cast on both engines.
    agg = rebased.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    num = ("CAST(n_buckets AS DECIMAL(38,0)) * sxy"
           " - CAST(sx AS DECIMAL(38,0)) * sy")
    den = ("CAST(n_buckets AS DECIMAL(38,0)) * sxx"
           " - CAST(sx AS DECIMAL(38,0)) * sx")
    return agg.select(
        "event_type",
        F.col("n_buckets").cast("int").alias("n_buckets"),
        F.expr(f"CAST({num} AS STRING)").alias("slope_num"),
        F.expr(f"CAST({den} AS STRING)").alias("slope_den"),
        F.expr(
            f"CASE WHEN {den} != 0 THEN "
            f"cast(floor(1000.0 * cast({num} as double)"
            f" / cast({den} as double)) as bigint) END"
        ).alias("slope_milli_per_hour"),
    )


_TREND_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS h,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
), rebased AS (
  SELECT event_type, y,
         h - MIN(h) OVER (PARTITION BY event_type) AS x
  FROM hourly
), agg AS (
  SELECT event_type,
         COUNT(*) AS n_buckets,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM rebased GROUP BY 1
), frac AS (
  SELECT event_type, n_buckets,
         CAST(n_buckets AS HUGEINT) * sxy
           - CAST(sx AS HUGEINT) * sy AS num,
         CAST(n_buckets AS HUGEINT) * sxx
           - CAST(sx AS HUGEINT) * sx AS den
  FROM agg
)
SELECT event_type,
       CAST(n_buckets AS INT) AS n_buckets,
       CAST(num AS VARCHAR) AS slope_num,
       CAST(den AS VARCHAR) AS slope_den,
       CAST(CASE WHEN den != 0 THEN
              floor(1000.0 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
            END AS BIGINT) AS slope_milli_per_hour
FROM frac
"""


# ---------------------------------------------------------------------------
# Robust aggregation: rank-exact winsorized statistics per event type.
# Plain means are one fat-finger outlier away from useless in metric
# pipelines; winsorizing clamps to exact p05/p95 before aggregating.
#
# Value-at-rank is engine-portable despite row_number's arbitrary tie
# order: ordered by cents alone, every row_number inside a tie run
# carries the SAME cents value, so min(cents WHERE rn >= rank) — the
# value at the ceil-rank position — is deterministic. Ceil ranks are
# exact integers ((5n+99) div 100); all values are positive cents so
# div is portable (contract.py).
#
# Scale shape: only the cutoff branch pays the per-type sort window
# (Catalyst prunes rn/n off the clamp branch, which re-scans raw
# events map-side into the broadcast join + 5-key agg — plan-gated).
# The cost that matters is that one sort: exact order statistics need
# it (bounded-cardinality group keys only); above that, swap the
# cutoffs for orders_quantile_sketch buckets and keep the identical
# clamp+agg tail.
# ---------------------------------------------------------------------------


def _events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "event_type", cents("value").alias("c")
    )
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "c",
        F.row_number().over(wp.orderBy("c")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    r_lo = F.expr("(5 * n + 99) div 100")
    r_hi = F.expr("(95 * n + 99) div 100")
    cuts = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") >= r_lo, F.col("c"))).alias("lo_cents"),
        F.min(F.when(F.col("rn") >= r_hi, F.col("c"))).alias("hi_cents"),
    )
    clamped = ranked.join(F.broadcast(cuts), "event_type").select(
        "event_type", "c", "lo_cents", "hi_cents",
        F.expr("least(greatest(c, lo_cents), hi_cents)").alias("w"),
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("int").alias("n"),
        F.min("lo_cents").alias("lo_cents"),
        F.min("hi_cents").alias("hi_cents"),
        F.sum((F.col("c") < F.col("lo_cents")).cast("int"))
        .cast("int").alias("n_clamped_low"),
        F.sum((F.col("c") > F.col("hi_cents")).cast("int"))
        .cast("int").alias("n_clamped_high"),
        F.sum("w").alias("sum_winsor_cents"),
        F.expr("(10 * sum(w)) div count(1)").alias("winsor_mean_milli"),
    )


_WINSOR_SQL = """
WITH ranked AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value * 100) AS BIGINT))
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), cuts AS (
  SELECT event_type,
         MIN(CASE WHEN rn >= (5 * n + 99) // 100 THEN c END) AS lo_cents,
         MIN(CASE WHEN rn >= (95 * n + 99) // 100 THEN c END) AS hi_cents
  FROM ranked GROUP BY 1
), clamped AS (
  SELECT r.event_type, r.c, t.lo_cents, t.hi_cents,
         least(greatest(r.c, t.lo_cents), t.hi_cents) AS w
  FROM ranked r JOIN cuts t USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS INT) AS n,
       MIN(lo_cents) AS lo_cents,
       MIN(hi_cents) AS hi_cents,
       CAST(SUM(CASE WHEN c < lo_cents THEN 1 ELSE 0 END) AS INT)
         AS n_clamped_low,
       CAST(SUM(CASE WHEN c > hi_cents THEN 1 ELSE 0 END) AS INT)
         AS n_clamped_high,
       CAST(SUM(w) AS BIGINT) AS sum_winsor_cents,
       (10 * CAST(SUM(w) AS BIGINT)) // COUNT(*) AS winsor_mean_milli
FROM clamped GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Time-series regularization: gap-fill the hourly rollup to a dense
# per-type grid and forward-fill the last observed value — the
# resample/ffill shape every monitoring and feature-engineering
# pipeline needs before windowed models (a sparse rollup silently
# shortens moving windows; the dense grid makes missingness explicit).
#
# Scale shape: the only input-sized work is the first (hour, type)
# hash-agg. Everything after operates on the rollup — |types| ×
# |span hours| rows regardless of event count (a year is ~8.8k rows
# per type) — so the grid explode, the left join and the per-type
# forward-fill window are all bounded by calendar time, not data.
# Non-negative-epoch div bucketing per contract.py.
# ---------------------------------------------------------------------------


def _events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            F.expr(f"ts_us div {_US_PER_HOUR}").alias("bucket_hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(cents("value")).alias("sum_cents"))
    )
    span = hourly.groupBy("event_type").agg(
        F.min("bucket_hour").alias("lo"), F.max("bucket_hour").alias("hi")
    )
    grid = span.select(
        "event_type", F.explode(F.expr("sequence(lo, hi)")).alias("bucket_hour")
    )
    w = (Window.partitionBy("event_type").orderBy("bucket_hour")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(hourly, ["event_type", "bucket_hour"], "left")
        .select(
            "event_type",
            "bucket_hour",
            F.coalesce("n", F.lit(0)).cast("int").alias("n_events"),
            F.col("n").isNull().cast("int").alias("is_gap"),
            F.last("sum_cents", ignorenulls=True).over(w)
            .alias("filled_sum_cents"),
        )
    )


_GAPFILL_SQL = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {_US_PER_HOUR} AS bucket_hour, event_type,
         COUNT(*) AS n,
         SUM(CAST(round(value * 100) AS BIGINT)) AS sum_cents
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, MIN(bucket_hour) AS lo, MAX(bucket_hour) AS hi
  FROM hourly GROUP BY 1
), grid AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS bucket_hour FROM span
)
SELECT g.event_type, g.bucket_hour,
       CAST(COALESCE(h.n, 0) AS INT) AS n_events,
       CAST(CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
       CAST(last_value(h.sum_cents IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket_hour
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS filled_sum_cents
FROM grid g LEFT JOIN hourly h USING (event_type, bucket_hour)
"""


# ---------------------------------------------------------------------------
# Native sliding windows: F.window(ts, "2 hours", "1 hour") — each
# event lands in TWO overlapping windows. The oracle is the manual
# fan-out (explode k ∈ {0,1}: window start = floor(t/slide)·slide −
# k·slide, keep starts > t − size), so the driver hash match proves
# the operator's window-assignment arithmetic, the same
# cross-formulation pattern as events_session_windows. The tumbling
# special case is events_hourly_rollup; sliding is what
# alerting/rate-limit rollups actually use (every hour sees its full
# trailing 2-hour context).
#
# Scale shape: the fan-out is a deterministic ×(size/slide) map-side
# explode inside the operator; one shuffle on (window, type) — same
# class as the tumbling rollup, ×2 rows.
# ---------------------------------------------------------------------------

_SLIDE_US = 3600 * 1_000_000
_WIN_US = 2 * _SLIDE_US


def _events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    ts = F.timestamp_micros(F.col("ts_us"))
    grouped = ev.groupBy(
        F.window(ts, "2 hours", "1 hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.sum(cents("value")).alias("sum_cents"),
    )
    return grouped.select(
        F.unix_micros("window.start").alias("start_us"),
        "event_type", "n_events", "sum_cents",
    )


_SLIDING_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS tu,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), fanout AS (
  SELECT event_type, c,
         (tu // {_SLIDE_US}) * {_SLIDE_US} - k * {_SLIDE_US} AS start_us
  FROM ev, unnest([0, 1]) AS t(k)
  WHERE (tu // {_SLIDE_US}) * {_SLIDE_US} - k * {_SLIDE_US} > tu - {_WIN_US}
)
SELECT start_us, event_type,
       CAST(COUNT(*) AS INT) AS n_events,
       CAST(SUM(c) AS BIGINT) AS sum_cents
FROM fanout GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Native session windows: the same gap-sessionization shape as
# `events_sessionize`, but through Spark's built-in
# ``F.session_window`` operator instead of the lag/cumsum islands —
# and the ORACLE is the islands formulation, so the driver's hash
# match is a machine-checked equivalence proof between the two.
#
# Boundary semantics (pinned by a hand test): session_window treats
# the per-event window as CLOSED [t, t+gap] — two events exactly gap
# apart MERGE (the next window's start equals the current end, and
# Spark merges on start ≤ end), one microsecond past splits. That is
# the same strict-> split convention as the islands query, so the two
# formulations agree everywhere, including the boundary. Session end
# is last event + gap, exactly as the operator reports it.
#
# Scale shape: one shuffle on user_id; the operator's in-partition
# merge is linear, the same cost class as the islands window — what
# the native form buys is streaming-engine integration (watermark-
# driven state eviction) for free when this moves to readStream.
# ---------------------------------------------------------------------------


def _events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    ts = F.timestamp_micros(F.col("ts_us"))
    grouped = ev.groupBy(
        F.session_window(ts, "30 minutes"), "user_id"
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.sum(cents("value")).alias("sum_cents"),
    )
    return grouped.select(
        "user_id",
        F.unix_micros("session_window.start").alias("start_us"),
        F.unix_micros("session_window.end").alias("end_us"),
        "n_events", "sum_cents",
    )


_SESSION_WINDOW_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS tu,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), marks AS (
  SELECT user_id, tu, c,
         CASE WHEN lag(tu) OVER w IS NULL
                   OR tu - lag(tu) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS ns
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tu)
), sid AS (
  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY tu
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
)
SELECT user_id,
       MIN(tu) AS start_us,
       MAX(tu) + {SESSION_GAP_US} AS end_us,
       CAST(COUNT(*) AS INT) AS n_events,
       CAST(SUM(c) AS BIGINT) AS sum_cents
FROM sid GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# Lag/rolling feature engineering over the DENSE grid — the downstream
# consumer that justifies gap-fill: row-based frames (lag 1, lag 24,
# rolling 3-row sum) only mean "1 hour ago / 24 hours ago / last 3
# hours" when every hour is present. Run on the sparse rollup these
# same frames silently reach across gaps; run on the gap-filled grid
# they are exact calendar semantics. Series-head NULLs are preserved
# (a model should see "no history yet", not a zero).
#
# Scale shape: everything here is post-rollup (calendar-bounded); the
# feature window reuses the grid's event_type partitioning.
# ---------------------------------------------------------------------------


def _events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _events_gapfill(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket_hour")
    w3 = w.rowsBetween(-2, Window.currentRow)
    return grid.select(
        "event_type", "bucket_hour", "n_events",
        F.lag("n_events", 1).over(w).alias("lag_1h"),
        F.lag("n_events", 24).over(w).alias("lag_24h"),
        F.sum("n_events").over(w3).cast("long").alias("sum_3h"),
    )


_LAG_FEATURES_SQL = f"""
WITH grid_out AS ({_GAPFILL_SQL})
SELECT event_type, bucket_hour, n_events,
       CAST(lag(n_events, 1) OVER w AS INT) AS lag_1h,
       CAST(lag(n_events, 24) OVER w AS INT) AS lag_24h,
       CAST(SUM(n_events) OVER (PARTITION BY event_type
                                ORDER BY bucket_hour
                                ROWS 2 PRECEDING) AS BIGINT) AS sum_3h
FROM grid_out
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_hour)
"""


# ---------------------------------------------------------------------------
# Table profiling — the data-validation primitive underneath the
# reference's schema/quality checks (schema.py drift detection reports
# WHAT changed; the profile reports the column-level facts an operator
# diffs between loads): per column, null count, exact distinct count,
# and min/max. One pass over the table; the exact multi-column
# COUNT(DISTINCT) compiles to Spark's Expand shape (rows × #distinct
# aggregates before the partial agg) — the standard plan for exact
# multi-distinct, chosen deliberately because a validator reports
# EXACT distincts (approx_count_distinct is the 100 TB knob when ±2%
# is acceptable, and drops the Expand). min/max are emitted as DOUBLE
# for numeric/timestamp columns (epoch µs — exact in a double through
# 2255) and as raw strings for text columns, so the output schema is
# column-shape-independent and binary collation agrees cross-engine.
# ---------------------------------------------------------------------------

#: (column, kind) spec for the orders profile; kind ∈ num | ts | str.
PROFILE_SPEC = (
    ("o_orderkey", "num"), ("o_custkey", "num"), ("o_orderstatus", "str"),
    ("o_totalprice", "num"), ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def table_profile(df: DataFrame,
                  spec=PROFILE_SPEC) -> DataFrame:
    """One row per column: (column_name, n_nulls, n_distinct, min_num,
    max_num, min_str, max_str)."""
    aggs = []
    for name, kind in spec:
        aggs.append(F.sum(F.col(name).isNull().cast("long"))
                    .alias(f"{name}__nu"))
        aggs.append(F.countDistinct(F.col(name)).alias(f"{name}__nd"))
        if kind == "num":
            aggs.append(F.min(name).cast("double").alias(f"{name}__mn"))
            aggs.append(F.max(name).cast("double").alias(f"{name}__mx"))
        elif kind == "ts":
            aggs.append(F.expr(f"unix_micros(cast(min({name}) as "
                               "timestamp))").cast("double")
                        .alias(f"{name}__mn"))
            aggs.append(F.expr(f"unix_micros(cast(max({name}) as "
                               "timestamp))").cast("double")
                        .alias(f"{name}__mx"))
        else:
            aggs.append(F.min(name).alias(f"{name}__sn"))
            aggs.append(F.max(name).alias(f"{name}__sx"))
    row = df.agg(*aggs)
    parts = []
    for name, kind in spec:
        if kind == "str":
            mn, mx = "cast(null as double)", "cast(null as double)"
            sn, sx = f"`{name}__sn`", f"`{name}__sx`"
        else:
            mn, mx = f"`{name}__mn`", f"`{name}__mx`"
            sn, sx = "cast(null as string)", "cast(null as string)"
        parts.append(f"'{name}', `{name}__nu`, `{name}__nd`, "
                     f"{mn}, {mx}, {sn}, {sx}")
    return row.selectExpr(
        f"stack({len(spec)}, {', '.join(parts)}) AS "
        "(column_name, n_nulls, n_distinct, min_num, max_num, "
        "min_str, max_str)")


def _table_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_profile(load(spark, sf_dir, "orders"))


def _table_profile_sql() -> str:
    selects = []
    for name, kind in PROFILE_SPEC:
        if kind == "str":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            sn, sx = f"MIN({name})", f"MAX({name})"
        elif kind == "ts":
            mn = f"CAST(epoch_us(MIN({name})) AS DOUBLE)"
            mx = f"CAST(epoch_us(MAX({name})) AS DOUBLE)"
            sn, sx = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        else:
            mn = f"CAST(MIN({name}) AS DOUBLE)"
            mx = f"CAST(MAX({name}) AS DOUBLE)"
            sn, sx = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        selects.append(
            f"SELECT '{name}' AS column_name, "
            f"CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS n_nulls, "
            f"CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, "
            f"{sn} AS min_str, {sx} AS max_str FROM orders")
    return "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# Truncated EWMA over the gap-filled grid: the classic exponentially
# weighted moving average is a recursion (y_t = a·x_t + (1-a)·y_{t-1})
# no engine's window frames express directly; the standard distributed
# re-expression truncates the geometric tail — with decay 1/2 the
# weight of anything older than 8 steps is < 0.4% of the total. Kept
# integer-exact: the weighted numerator uses power-of-two weights
# (128, 64, …, 1 over lags 0..7, pre-series hours counting as 0), and
# the readout quantizes via floor((1000·num)/255) — 255 = Σ weights —
# so both engines agree bit-for-bit, per contract.py.
#
# Scale shape: all work is post-rollup (calendar-bounded grid); the 8
# lags share ONE window spec, so this adds no exchange beyond the
# grid's own — same cost class as events_lag_features.
# ---------------------------------------------------------------------------

_EWMA_WEIGHTS = tuple(2 ** (7 - i) for i in range(8))  # lag 0 → 128 … lag 7 → 1


def _events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _events_gapfill(spark, sf_dir).select(
        "event_type", "bucket_hour", "n_events"
    )
    w = Window.partitionBy("event_type").orderBy("bucket_hour")
    num = F.lit(0).cast("long")
    for i, wt in enumerate(_EWMA_WEIGHTS):
        x = F.col("n_events") if i == 0 else F.lag("n_events", i).over(w)
        num = num + F.coalesce(x, F.lit(0)).cast("long") * F.lit(wt)
    return (
        grid.withColumn("ewma_num", num.cast("long"))
        .withColumn("ewma_milli", F.expr("(1000 * ewma_num) div 255"))
    )


_EWMA_TERMS_SQL = " + ".join(
    f"{wt} * COALESCE(lag(n_events, {i}) OVER w, 0)" if i else f"{wt} * n_events"
    for i, wt in enumerate(_EWMA_WEIGHTS)
)

_EWMA_SQL = f"""
WITH grid_out AS ({_GAPFILL_SQL}),
wsum AS (
  SELECT event_type, bucket_hour, n_events,
         CAST({_EWMA_TERMS_SQL} AS BIGINT) AS ewma_num
  FROM grid_out
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_hour)
)
SELECT event_type, bucket_hour, n_events, ewma_num,
       (1000 * ewma_num) // 255 AS ewma_milli
FROM wsum
"""


# ---------------------------------------------------------------------------
# PageRank over the nation trade graph, two Jacobi iterations unrolled
# — the iterative-graph-algorithm shape on DataFrames, same unrolling
# pattern as embed_kmeans (similarity.py) unrolls Lloyd. Nodes are the
# 25 nations; a directed edge u→v exists when any supplier in u shipped
# a lineitem to a customer in v (distinct pairs, self-loops dropped).
# Integer-exact per contract.py: ranks live at scale 10^12, damping
# 0.85 is applied as ((85·r) div 100) div outdeg with explicit floor
# ordering, the teleport term is ((15·SCALE) div 100) div N. Dangling
# mass (nations with no out-edges at small SF) is dropped — the
# standard simplification, applied identically in the oracle.
#
# Scale shape: the only input-sized work is the one-pass edge build
# (lineitem ⋈ supplier/orders/customer — the q7 join tree); the edge
# list folds to ≤ N² rows and is localCheckpoint'ed (lazy) so the
# iterations reuse it instead of re-running the build per step, the
# same lineage-barrier pattern as the PQ codebook
# (similarity.py:1322). Each iteration is broadcast joins over ≤ N²
# rows — iteration cost is independent of the fact tables, which is
# what lets the loop run to convergence on a cluster.
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12


def _trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(F.col("s_nationkey").alias("src"),
                F.col("c_nationkey").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_nodes = nation.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = (
        nation.select("n_nationkey")
        .crossJoin(F.broadcast(n_nodes))  # documented 1-row BNLJ fold
        .select("n_nationkey", "n_nodes",
                F.expr(f"{_PR_SCALE} div n_nodes").alias("rank"))
    )

    def step(r: DataFrame) -> DataFrame:
        inflow = (
            r.join(F.broadcast(outdeg), r.n_nationkey == outdeg.src)
            .select("src", F.expr("((85 * rank) div 100) div outdeg")
                    .alias("contrib"))
            .join(F.broadcast(edges), "src")
            .groupBy("dst").agg(F.sum("contrib").alias("inflow"))
        )
        return (
            r.select("n_nationkey", "n_nodes")
            .join(F.broadcast(inflow),
                  F.col("n_nationkey") == F.col("dst"), "left")
            .select(
                "n_nationkey", "n_nodes",
                (F.expr(f"((15 * {_PR_SCALE}) div 100) div n_nodes")
                 + F.coalesce("inflow", F.lit(0))).cast("long").alias("rank"),
            )
        )

    r1 = step(ranks)
    r2 = step(r1)
    return (
        nation.select("n_nationkey", "n_name")
        .join(F.broadcast(outdeg),
              F.col("n_nationkey") == F.col("src"), "left")
        .join(F.broadcast(r1.select(F.col("n_nationkey").alias("k1"),
                                    F.col("rank").alias("rank_1"))),
              F.col("n_nationkey") == F.col("k1"))
        .join(F.broadcast(r2.select(F.col("n_nationkey").alias("k2"),
                                    F.col("rank").alias("rank_2"))),
              F.col("n_nationkey") == F.col("k2"))
        .select("n_name",
                F.coalesce("outdeg", F.lit(0)).cast("int").alias("outdeg"),
                "rank_1", "rank_2")
    )


_PAGERANK_SQL = f"""
WITH e AS (
  SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE s_nationkey <> c_nationkey
), deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
nn AS (SELECT COUNT(*) AS n_nodes FROM nation),
r0 AS (
  SELECT n_nationkey AS k, {_PR_SCALE} // n_nodes AS rank
  FROM nation CROSS JOIN nn
), c1 AS (
  SELECT e.dst, SUM(((85 * r0.rank) // 100) // d.outdeg) AS inflow
  FROM r0 JOIN deg d ON r0.k = d.src JOIN e ON e.src = d.src GROUP BY 1
), r1 AS (
  SELECT n.n_nationkey AS k,
         ((15 * {_PR_SCALE}) // 100) // nn.n_nodes
           + COALESCE(c1.inflow, 0) AS rank
  FROM nation n CROSS JOIN nn LEFT JOIN c1 ON n.n_nationkey = c1.dst
), c2 AS (
  SELECT e.dst, SUM(((85 * r1.rank) // 100) // d.outdeg) AS inflow
  FROM r1 JOIN deg d ON r1.k = d.src JOIN e ON e.src = d.src GROUP BY 1
), r2 AS (
  SELECT n.n_nationkey AS k,
         ((15 * {_PR_SCALE}) // 100) // nn.n_nodes
           + COALESCE(c2.inflow, 0) AS rank
  FROM nation n CROSS JOIN nn LEFT JOIN c2 ON n.n_nationkey = c2.dst
)
SELECT n.n_name,
       CAST(COALESCE(d.outdeg, 0) AS INT) AS outdeg,
       CAST(r1.rank AS BIGINT) AS rank_1,
       CAST(r2.rank AS BIGINT) AS rank_2
FROM nation n
LEFT JOIN deg d ON n.n_nationkey = d.src
JOIN r1 ON n.n_nationkey = r1.k
JOIN r2 ON n.n_nationkey = r2.k
"""


# ---------------------------------------------------------------------------
# MERGE-INTO upsert semantics as ONE full-outer hash join — the batch
# CDC-apply primitive under Delta/Iceberg MERGE, here as a plain
# DataFrame operator: WHEN MATCHED AND op='U' THEN UPDATE, WHEN
# MATCHED AND op='D' THEN DELETE, WHEN NOT MATCHED AND op='I' THEN
# INSERT, unmatched-source U/D are no-ops, untouched target rows pass
# through. The change batch is derived deterministically from orders
# (key mod classes) so both engines build byte-identical inputs.
# Complements changelog_latest_state (which compacts a FULL history);
# MERGE applies one keyed delta batch to a snapshot.
#
# Scale shape: one shuffle on the key for the full-outer join, then
# map-side CASE routing — no window, no second pass. On a real table
# the join prunes to touched partitions via partition/file stats
# (the Z-order layout writer in plans/layout.py is that half).
# ---------------------------------------------------------------------------


def _orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        cents("o_totalprice").alias("price_cents"),
        "o_orderstatus",
    )
    base = (o.filter(F.col("o_orderkey") % 5 != 4)
            .withColumn("in_base", F.lit(1)))
    op = (F.when(F.col("o_orderkey") % 10 == 1, F.lit("U"))
          .when(F.col("o_orderkey") % 10 == 2, F.lit("D"))
          .when(F.col("o_orderkey") % 5 == 4, F.lit("I")))
    changes = (
        o.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "o_orderkey", "op",
            F.when(F.col("op") == "U", F.col("price_cents") + 500)
            .when(F.col("op") == "I", F.col("price_cents") + 100)
            .alias("new_price_cents"),
        )
    )
    j = base.join(changes, "o_orderkey", "full_outer")
    matched = F.col("in_base").isNotNull()
    action = (
        F.when(matched & (F.col("op") == "U"), F.lit("update"))
        .when(matched & (F.col("op") == "D"), F.lit(None).cast("string"))
        .when(matched, F.lit("keep"))
        .when(F.col("op") == "I", F.lit("insert"))
    )
    return (
        j.withColumn("action", action)
        .filter(F.col("action").isNotNull())
        .select(
            "o_orderkey",
            "action",
            F.when(F.col("action") == "keep", F.col("price_cents"))
            .otherwise(F.col("new_price_cents")).alias("out_price_cents"),
            F.when(F.col("action") == "keep", F.col("o_orderstatus"))
            .otherwise(F.col("op")).alias("out_status"),
        )
    )


_MERGE_SQL = """
WITH o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderstatus
  FROM orders
), base AS (
  SELECT *, 1 AS in_base FROM o WHERE o_orderkey % 5 <> 4
), changes AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 1 THEN 'U'
              WHEN o_orderkey % 10 = 2 THEN 'D'
              WHEN o_orderkey % 5 = 4 THEN 'I' END AS op,
         CASE WHEN o_orderkey % 10 = 1 THEN price_cents + 500
              WHEN o_orderkey % 5 = 4 THEN price_cents + 100 END
           AS new_price_cents
  FROM o
  WHERE o_orderkey % 10 IN (1, 2) OR o_orderkey % 5 = 4
), m AS (
  SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
         b.in_base, b.price_cents, b.o_orderstatus,
         c.op, c.new_price_cents,
         CASE WHEN b.in_base IS NOT NULL AND c.op = 'U' THEN 'update'
              WHEN b.in_base IS NOT NULL AND c.op = 'D' THEN NULL
              WHEN b.in_base IS NOT NULL THEN 'keep'
              WHEN c.op = 'I' THEN 'insert' END AS action
  FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
)
SELECT o_orderkey, action,
       CASE WHEN action = 'keep' THEN price_cents
            ELSE new_price_cents END AS out_price_cents,
       CASE WHEN action = 'keep' THEN o_orderstatus
            ELSE op END AS out_status
FROM m
WHERE action IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Market-basket co-occurrence mining: part pairs ordered together, with
# support and integer-milli lift — the association-analysis family
# (FP-growth's first pass is exactly this pair census). The Spark side
# generates pairs by exploding an in-codegen array comprehension over
# each order's sorted distinct part set (i<j upper triangle via
# transform/slice — no join); the ORACLE is the classic relational
# self-join on order key with p1 < p2, so the driver's hash match is a
# cross-formulation equivalence proof, same pattern as
# events_session_windows. Pairs below support 2 are dropped (HAVING),
# lift_milli = floor(1000·n_ab·N / (n_a·n_b)) in exact integers.
#
# Scale shape: pair fan-out is map-side and bounded by (basket size
# choose 2) per order — TPC-H baskets average ~4 items, so ~6 pairs
# per order, NOT |parts|². One shuffle to the (p1, p2) hash-agg; item
# supports ride the same per-order distinct set; support join sides
# are |parts|-sized → broadcast.
# ---------------------------------------------------------------------------

_PAIRS_EXPR = """
flatten(transform(parts, (x, i) ->
  transform(slice(parts, i + 2, size(parts)), y ->
    struct(x AS p1, y AS p2))))
"""


def _basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Three consumers (pairs, item supports, order total) need the
    # per-order set; the lazy checkpoint materializes the scan + the
    # one l_orderkey shuffle ONCE instead of re-deriving them per
    # consumer — 1 fact scan + 1 wide shuffle + a compact (key, int
    # array) intermediate, the same lineage-barrier trade as the PQ
    # codebook (similarity.py:1322) but on a fact-sized frame, chosen
    # because the alternative is 3× the scan AND 3× the shuffle.
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint(eager=False)
    )
    support = (
        baskets.select(F.explode("parts").alias("p"))
        .groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    pairs = (
        baskets.select(F.explode(F.expr(_PAIRS_EXPR)).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    sup_a = F.broadcast(support.select(F.col("p").alias("p1"),
                                       F.col("n").alias("n_a")))
    sup_b = F.broadcast(support.select(F.col("p").alias("p2"),
                                       F.col("n").alias("n_b")))
    return (
        pairs.join(sup_a, "p1").join(sup_b, "p2")
        .crossJoin(F.broadcast(totals))  # documented 1-row BNLJ fold
        .select(
            "p1", "p2", "n_ab", "n_a", "n_b", "n_orders",
            F.expr("(1000 * n_ab * n_orders) div (n_a * n_b)")
            .alias("lift_milli"),
        )
    )


_BASKET_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
tot AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
sup AS (SELECT p, COUNT(*) AS n FROM op GROUP BY 1),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, COUNT(*) AS n_ab
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT p1, p2,
       CAST(n_ab AS BIGINT) AS n_ab,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(t.n_orders AS BIGINT) AS n_orders,
       (1000 * n_ab * t.n_orders) // (sa.n * sb.n) AS lift_milli
FROM pairs
JOIN sup sa ON pairs.p1 = sa.p
JOIN sup sb ON pairs.p2 = sb.p
CROSS JOIN tot t
"""


# ---------------------------------------------------------------------------
# Triangle counting on the co-purchase graph — the canonical "join the
# graph with itself, carefully" pattern. Edges are the support>=2
# basket pairs (u < v by id); a triangle is a wedge (a<b, b<c) closed
# by the (a, c) edge, so the id-orientation alone guarantees each
# triangle is found exactly once (a<b<c) with no permutation dedup.
# Output is per-node triangle participation.
#
# Scale shape: the edge list is built once behind a lazy checkpoint
# (three self-join references would otherwise re-run the basket
# build), and the filtered edge set is orders of magnitude smaller
# than the fact table, so the wedge join broadcasts. The id
# orientation bounds wedge fan-out at out-degree²; at 100 TB the
# standard refinement is DEGREE orientation (point edges low-degree →
# high-degree), which provably caps wedge count at O(E^1.5) — same
# plan, one extra degree join to re-orient.
# ---------------------------------------------------------------------------


def _basket_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    return (
        baskets.select(F.explode(F.expr(_PAIRS_EXPR)).alias("pr"))
        .groupBy(F.col("pr.p1").alias("u"), F.col("pr.p2").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
        .select("u", "v")
    )


def _basket_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _basket_edges(spark, sf_dir).localCheckpoint(eager=False)
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = (
        e1.join(F.broadcast(e2), "b")
        .join(F.broadcast(e3), ["a", "c"])
        .select("a", "b", "c")
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


_TRIANGLES_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), nodes AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY 1
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation — the marketing-analytics read-out: per
# customer, recency (last order day), frequency (order count),
# monetary (lifetime cents), each cut into quintiles, concatenated
# into the 'rfm' segment label. Quintile assignment is computed
# EXPLICITLY as 1 + ((rn-1)·5) div n from a fully tie-broken
# row_number (metric DESC, custkey ASC) rather than through ntile(),
# whose remainder-distribution convention need not agree across
# engines — the arithmetic form is floor-exact in both.
#
# Scale shape: the three ranks run over the CUSTOMER AGGREGATE
# (|customers| rows, ~1.5% of facts), not the fact table, and each is
# an exact range-partitioned rank (functions/ranks.py: balanced range
# shuffle + broadcast per-partition offsets — no single-partition
# sort, the same output bit-for-bit). A sketch variant with DDSketch
# quantile cutoffs broadcast back (scale/sketches.py) trades ±ε bucket
# edges for one pass when three range shuffles are too many.
# ---------------------------------------------------------------------------


def _customers_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.max(F.to_date("o_orderdate")), F.lit("1970-01-01"))
        .alias("recency_day"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(cents("o_totalprice")).alias("monetary_cents"),
    )
    n = per_cust.agg(F.count(F.lit(1)).alias("n_cust"))
    out = per_cust.crossJoin(F.broadcast(n))  # documented 1-row BNLJ fold
    for metric, col in [("recency_day", "r_q"), ("frequency", "f_q"),
                        ("monetary_cents", "m_q")]:
        out = (
            global_row_number(
                out, [F.col(metric).desc(), F.col("o_custkey")],
                rank_col="__rn",
            )
            .withColumn(col, F.expr(
                "cast(1 + ((__rn - 1) * 5) div n_cust as int)"))
            .drop("__rn")
        )
    return out.select(
        "o_custkey", "recency_day", "frequency", "monetary_cents",
        "r_q", "f_q", "m_q",
        F.concat_ws("", "r_q", "f_q", "m_q").alias("segment"),
    )


_RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(MAX(o_orderdate) AS DATE)) AS INT)
           AS recency_day,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY 1
), n AS (SELECT COUNT(*) AS n_cust FROM per_cust),
ranked AS (
  SELECT p.*, n.n_cust,
         row_number() OVER (ORDER BY recency_day DESC, o_custkey) AS rn_r,
         row_number() OVER (ORDER BY frequency DESC, o_custkey) AS rn_f,
         row_number() OVER (ORDER BY monetary_cents DESC, o_custkey) AS rn_m
  FROM per_cust p CROSS JOIN n
)
SELECT o_custkey, recency_day, frequency, monetary_cents,
       CAST(1 + ((rn_r - 1) * 5) // n_cust AS INT) AS r_q,
       CAST(1 + ((rn_f - 1) * 5) // n_cust AS INT) AS f_q,
       CAST(1 + ((rn_m - 1) * 5) // n_cust AS INT) AS m_q,
       CAST(1 + ((rn_r - 1) * 5) // n_cust AS VARCHAR)
         || CAST(1 + ((rn_f - 1) * 5) // n_cust AS VARCHAR)
         || CAST(1 + ((rn_m - 1) * 5) // n_cust AS VARCHAR) AS segment
FROM ranked
"""


# ---------------------------------------------------------------------------
# Market concentration (Herfindahl–Hirschman index) per brand: each
# supplier's revenue share of the brand in integer basis points, HHI =
# Σ share_bp² div 10000 — the antitrust/market-structure aggregate,
# exact-integer per contract.py (shares floor to bp BEFORE squaring,
# identically in both engines).
#
# Scale shape: one fact pass → (brand, supplier) partial-agg'd hash
# aggregation; the brand totals re-agg and the share join operate on
# |brands × suppliers-per-brand| rows. part joins broadcast.
# ---------------------------------------------------------------------------


def _brand_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey",
                                                "l_extendedprice")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Two consumers (brand totals, share join) would re-run the fact
    # pass; the lazy checkpoint pins the tiny |brands × suppliers|
    # aggregate so lineitem is scanned once (similarity.py:1322).
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(cents("l_extendedprice")).alias("rev_cents"))
        .localCheckpoint(eager=False)
    )
    tot = rev.groupBy("p_brand").agg(
        F.sum("rev_cents").alias("tot_cents"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return (
        rev.join(F.broadcast(tot), "p_brand")
        .withColumn("share_bp", F.expr("(10000 * rev_cents) div tot_cents"))
        .groupBy("p_brand")
        .agg(
            F.first("n_suppliers").cast("int").alias("n_suppliers"),
            F.first("tot_cents").alias("tot_rev_cents"),
            F.expr("sum(share_bp * share_bp) div 10000").alias("hhi_bp"),
        )
    )


_HHI_SQL = """
WITH rev AS (
  SELECT p_brand, l_suppkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), tot AS (
  SELECT p_brand, SUM(rev_cents) AS tot_cents,
         COUNT(*) AS n_suppliers
  FROM rev GROUP BY 1
)
SELECT r.p_brand,
       CAST(MIN(t.n_suppliers) AS INT) AS n_suppliers,
       CAST(MIN(t.tot_cents) AS BIGINT) AS tot_rev_cents,
       CAST(SUM(((10000 * r.rev_cents) // t.tot_cents)
                * ((10000 * r.rev_cents) // t.tot_cents)) // 10000
            AS BIGINT) AS hhi_bp
FROM rev r JOIN tot t ON r.p_brand = t.p_brand
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Record linkage: q-gram-blocked edit-distance fuzzy join over part
# names — the dedup-across-messy-catalogs primitive. Candidate pairs
# come from a shared-BIGRAM block (content q-grams, q=2): one edit
# destroys at most q of a string's q-grams, so two strings of length
# ≥ 6 within edit distance 2 always share a surviving bigram — the
# blocking is provably lossless here (min fixture name length is 7,
# asserted in tests), and the brute-force oracle certifies zero false
# negatives on every run. Verification (levenshtein) touches only the
# blocked candidates.
#
# Scale shape: the DISTINCT-name table is orders of magnitude smaller
# than the fact table (catalog names repeat); candidates join on the
# gram key, never all-pairs. At 100 TB the refinement is positional
# q-grams + a count filter (shared ≥ L−1−dq) to shrink blocks further,
# and salting for stopword-grams; same plan shape.
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 2


def _part_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(
        F.count(F.lit(1)).cast("int").alias("n_parts")
    )
    grams = names.select(
        "p_name",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, length(p_name) - 1), "
            "          i -> substring(p_name, i, 2))"
        ))).alias("gram"),
    )
    a = grams.select(F.col("gram"), F.col("p_name").alias("name_a"))
    b = grams.select(F.col("gram"), F.col("p_name").alias("name_b"))
    cand = (
        a.join(b, "gram")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        # length filter: |len diff| > d cannot be within distance d
        .filter(
            F.abs(F.length("name_a") - F.length("name_b"))
            <= FUZZY_MAX_DIST
        )
    )
    matched = cand.select(
        "name_a", "name_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
    ).filter(F.col("dist") <= FUZZY_MAX_DIST)
    na = names.select(F.col("p_name").alias("name_a"),
                      F.col("n_parts").alias("n_parts_a"))
    nb = names.select(F.col("p_name").alias("name_b"),
                      F.col("n_parts").alias("n_parts_b"))
    return (
        matched.join(F.broadcast(na), "name_a")
        .join(F.broadcast(nb), "name_b")
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
    )


_FUZZY_SQL = f"""
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS INT) AS n_parts
  FROM part GROUP BY 1
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit — the classic anomaly screen for amount
# columns (fabricated/synthetic values rarely follow the log-uniform
# leading-digit law). Expected shares are log10(1+1/d); ln/log10 are
# NOT correctly rounded across libm implementations, so the expected
# table is computed ONCE in Python and inlined as integer-milli
# literals into BOTH plans (the embed_ann_lsh hyperplane precedent).
# First digit extraction is string-cast of the exact cents BIGINT —
# identical in any engine, no float formatting involved.
#
# Scale shape: one fact pass → 9-row hash-agg; the total re-join is a
# broadcast of a 1-row fold. Map-side partial aggregation does all the
# work at 100 TB.
# ---------------------------------------------------------------------------

#: floor(1000·log10(1+1/d)) for d = 1..9 — evaluated at import time in
#: Python (one libm, one value) and inlined as literals in both engines.
_BENFORD_MILLI: dict[int, int] = {
    d: int(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)
}


def _benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(cents("o_totalprice").cast("string"), 1, 1)
        .cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").alias("total"))
    expected = spark.createDataFrame(
        [(d, m) for d, m in _BENFORD_MILLI.items()],
        "digit int, benford_milli int",
    )
    return (
        counts.crossJoin(F.broadcast(total))  # documented 1-row BNLJ fold
        .join(F.broadcast(expected), "digit")
        .select(
            "digit", "n",
            F.expr("cast((1000 * n) div total as int)").alias("share_milli"),
            "benford_milli",
            (F.expr("cast((1000 * n) div total as int)")
             - F.col("benford_milli")).cast("int").alias("delta_milli"),
        )
    )


def _benford_sql() -> str:
    expected = " UNION ALL ".join(
        f"SELECT {d} AS digit, {m} AS benford_milli"
        for d, m in _BENFORD_MILLI.items()
    )
    return f"""
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
), tot AS (SELECT SUM(n) AS total FROM counts),
expected AS ({expected})
SELECT c.digit, c.n,
       CAST((1000 * c.n) // t.total AS INT) AS share_milli,
       e.benford_milli,
       CAST((1000 * c.n) // t.total - e.benford_milli AS INT) AS delta_milli
FROM counts c CROSS JOIN tot t JOIN expected e ON c.digit = e.digit
"""


# ---------------------------------------------------------------------------
# Join-key skew audit — the pre-flight check before planning a big
# join: per candidate key of the fact table, row count, distinct
# count, and the heaviest key's share in ppm. A top-1 share in the
# percent range means the shuffled join needs salting or AQE skew
# splits; this report is how you find that out for 9 figures of rows
# without eyeballing anything.
#
# Scale shape: one fact pass unioned per key column (Spark scans once
# per branch but each branch reads ONE column; at 100 TB you'd fuse
# them with a single pass + posexplode if scan dominates) → two-level
# hash-agg: (key, value) counts, then a per-key top-1 via
# max(struct(count, value)) — deterministic argmax, ties to the larger
# value, no window, no sort.
# ---------------------------------------------------------------------------

_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


def _skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    per_key = None
    for key in _SKEW_KEYS:
        branch = li.select(
            F.lit(key).alias("key_col"),
            F.col(key).cast("long").alias("key_value"),
        )
        per_key = branch if per_key is None else per_key.unionByName(branch)
    counts = per_key.groupBy("key_col", "key_value").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy("key_col")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.max(F.struct("c", "key_value")).alias("__top"),
        )
        .select(
            "key_col", "n_rows", "n_distinct",
            F.col("__top.c").cast("long").alias("top_count"),
            F.col("__top.key_value").alias("top_value"),
            F.expr("cast((1000000 * __top.c) div n_rows as int)")
            .alias("top_share_ppm"),
        )
    )


def _skew_sql() -> str:
    branches = " UNION ALL ".join(
        f"SELECT '{k}' AS key_col, CAST({k} AS BIGINT) AS key_value "
        f"FROM lineitem"
        for k in _SKEW_KEYS
    )
    return f"""
WITH long AS ({branches}),
counts AS (
  SELECT key_col, key_value, COUNT(*) AS c FROM long GROUP BY 1, 2
), top AS (
  SELECT key_col, c AS top_count, key_value AS top_value
  FROM counts
  QUALIFY row_number() OVER (PARTITION BY key_col
                             ORDER BY c DESC, key_value DESC) = 1
)
SELECT c.key_col,
       CAST(SUM(c.c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MIN(t.top_count) AS BIGINT) AS top_count,
       CAST(MIN(t.top_value) AS BIGINT) AS top_value,
       CAST((1000000 * MIN(t.top_count)) // SUM(c.c) AS INT)
         AS top_share_ppm
FROM counts c JOIN top t USING (key_col)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Transitive closure over the high-value trade graph — WITH RECURSIVE,
# native in Spark 4 (SPARK-24497) and DuckDB, so the iterative
# reachability that PageRank had to unroll by hand runs as ONE
# recursive CTE in BOTH engines (same text modulo the edge build).
# Edges: nation→nation lanes with ≥ $9.5M total revenue (sparsifies
# the dense TPC-H trade matrix into a 47-edge graph with genuine
# 2–3-hop structure at sf0.01). Output: min-hop distance per
# reachable (src, dst) pair, depth-capped at 4.
#
# Scale shape: the edge build is the one fact pass (broadcast dims +
# hash-agg); recursion then iterates on the EDGE-sized frontier —
# each step is a broadcast join of frontier × edges, never touching
# the fact table again. UNION ALL + depth guard keeps both engines'
# recursion semantics identical; the min() rollup absorbs duplicate
# walks.
# ---------------------------------------------------------------------------

_REACH_MIN_REV_CENTS = 950_000_000
_REACH_MAX_HOPS = 4


def _trade_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.sum(cents("l_extendedprice")).alias("rev_cents"))
        .filter(F.col("rev_cents") >= _REACH_MIN_REV_CENTS)
        .select("src", "dst")
        # Barrier the edge list (lazy — materializes inside the timed
        # run, the file's standing idiom): the recursive CTE references
        # this relation in its anchor AND in every iteration's step, so
        # without it each of the ≤ _REACH_MAX_HOPS loop turns re-runs
        # the whole lineitem⋈supplier⋈orders⋈customer aggregation
        # (guide §2.4 — don't recompute a shared subtree). The edge
        # list is nation×nation-bounded (≤ 625 rows at any scale), so
        # the checkpoint is always tiny. Warm 2.6 → 1.5 s at sf0.01,
        # first run 10.8 → 1.8 s; rows identical.
        .localCheckpoint(eager=False)
    )
    # WITH RECURSIVE needs a named relation, but a session-global name
    # would race concurrent builds and leak (ADVICE r8): use a per-call
    # unique view and drop it once spark.sql has ANALYZED the statement
    # (view resolution is eager at analysis, so the returned DataFrame's
    # plan no longer references the name).
    view = f"__trade_edges_{uuid.uuid4().hex}"
    edges.createOrReplaceTempView(view)
    try:
        return spark.sql(f"""
WITH RECURSIVE reach(src, dst, hops) AS (
  SELECT src, dst, 1 FROM {view}
  UNION ALL
  SELECT r.src, e.dst, r.hops + 1
  FROM reach r JOIN {view} e ON r.dst = e.src
  WHERE r.hops < {_REACH_MAX_HOPS} AND r.src <> e.dst
)
SELECT src, dst, CAST(MIN(hops) AS INT) AS min_hops
FROM reach GROUP BY src, dst
""")
    finally:
        spark.catalog.dropTempView(view)


_REACH_SQL = f"""
WITH RECURSIVE rev AS (
  SELECT s_nationkey AS src, c_nationkey AS dst,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE s_nationkey <> c_nationkey
  GROUP BY 1, 2
), e AS (
  SELECT src, dst FROM rev WHERE rev_cents >= {_REACH_MIN_REV_CENTS}
), reach(src, dst, hops) AS (
  SELECT src, dst, 1 FROM e
  UNION ALL
  SELECT r.src, e.dst, r.hops + 1
  FROM reach r JOIN e ON r.dst = e.src
  WHERE r.hops < {_REACH_MAX_HOPS} AND r.src <> e.dst
)
SELECT src, dst, CAST(MIN(hops) AS INT) AS min_hops
FROM reach GROUP BY src, dst
"""


# ---------------------------------------------------------------------------
# Semi-structured extraction through the VARIANT type — Spark 4's
# schema-on-read path for JSON columns (parse_json → variant_get with
# a type template), exercised over the events table's real `props`
# JSON strings. VARIANT keeps the parsed tree in a binary form that is
# ~an order of magnitude faster to re-probe than from_json-per-field
# re-parsing when queries touch several paths; a missing path yields
# NULL, not an error, so the extraction doubles as the malformed-data
# gate.
#
# Scale shape: parse + extract are map-only expressions; the rollup is
# one hash-agg on the tiny event_type key space. At 100 TB the win is
# storing the column AS variant (shredded parquet) so probes skip
# parsing entirely — write-side change only, same query.
# ---------------------------------------------------------------------------


def _variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        F.expr("variant_get(parse_json(props), '$.missing', 'int')")
        .alias("m"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("k").isNull().cast("long")).cast("long")
        .alias("n_null_k"),
        F.sum(F.col("m").isNull().cast("long")).cast("long")
        .alias("n_null_missing"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"),
    )


_VARIANT_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN CAST(props->>'$.k' AS INT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
       CAST(SUM(CASE WHEN CAST(props->>'$.missing' AS INT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null_missing,
       CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(props->>'$.k' AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(props->>'$.k' AS INT)) AS INT) AS max_k
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Referential-integrity audit — the ETL-validation counterpart of the
# row-rule catalog, at TABLE granularity: for every FK edge of the
# star schema, how many child rows point at a missing parent, plus the
# orphan share in ppm. A lakehouse has no enforced constraints, so
# this audit IS the constraint check, run after every load.
#
# Scale shape: each edge is one LEFT ANTI join from the child to the
# parent's key projection (runtime-Bloom-joinable; the parent side is
# keys only). Each edge also re-counts its child table — at 100 TB
# the counts for edges sharing a child (lineitem×3) come from one
# cached count, not three scans; kept per-edge here for plan clarity.
# ---------------------------------------------------------------------------

_FK_EDGES = (
    # child, child key, parent, parent key
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for child, ck, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child)
        # Parent keys are primary keys (unique), so a 1:1 LEFT join with
        # a hit marker counts child rows and orphans in the SAME pass —
        # the previous count-crossJoin-anti shape scanned every child
        # twice (r13; 18 scans -> 12 across the six edges, one BNLJ
        # fold per edge removed).
        p = (load(spark, sf_dir, parent).select(pk)
             .withColumn("__hit", F.lit(1)))
        row = (
            c.select(F.col(ck).alias(pk)).join(p, pk, "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                # coalesce: sum() over an EMPTY child table is NULL,
                # where the old count-over-anti-join shape yielded 0
                # (ADVICE r13) — keep the degenerate case's output.
                F.coalesce(
                    F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)),
                    F.lit(0),
                ).alias("n_orphans"),
            )
            .select(
                F.lit(f"{child}.{ck}").alias("fk"),
                F.lit(parent).alias("parent"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
                F.expr("cast((1000000 * n_orphans) div n_child as int)")
                .alias("orphan_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _fk_audit_sql() -> str:
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        parts.append(f"""
SELECT '{child}.{ck}' AS fk, '{parent}' AS parent,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM {child} c
             ANTI JOIN {parent} p ON c.{ck} = p.{pk}) AS BIGINT)
         AS n_orphans,
       CAST((1000000 * (SELECT COUNT(*) FROM {child} c
                        ANTI JOIN {parent} p ON c.{ck} = p.{pk}))
            // (SELECT COUNT(*) FROM {child}) AS INT) AS orphan_ppm""")
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# Last-touch attribution — the marketing-analytics join of purchases to
# the most recent preceding click by the same user within a 1-hour
# lookback. Same carry-forward-window machinery as the as-of join
# (events_asof_join): ONE shuffle on user_id, a linear in-partition
# pass with last(..., ignorenulls) — never the naive per-purchase
# inequality join (O(n²) per user). Ties on ts break by event_id so
# both engines see one ordering.
# ---------------------------------------------------------------------------

_ATTRIB_WINDOW_US = 3_600 * 1_000_000


def _events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value", "ts_us"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_click = ev.withColumn(
        "last_click_us",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts_us")),
            ignorenulls=True,
        ).over(w),
    )
    purchases = with_click.filter(F.col("event_type") == "purchase")
    attributed = (
        F.col("last_click_us").isNotNull()
        & (F.col("ts_us") - F.col("last_click_us")
           <= F.lit(_ATTRIB_WINDOW_US))
    )
    v = cents("value")
    return purchases.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(attributed.cast("long")).cast("long").alias("n_attributed"),
        F.sum(F.when(attributed, v).otherwise(F.lit(0)))
        .cast("long").alias("attributed_cents"),
        F.sum(F.when(~attributed, v).otherwise(F.lit(0)))
        .cast("long").alias("unattributed_cents"),
    )


_ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, value,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
), w AS (
  SELECT *,
         last_value(CASE WHEN event_type = 'click' THEN ts_us END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_us
  FROM ev
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN last_click_us IS NOT NULL
                      AND ts_us - last_click_us <= {_ATTRIB_WINDOW_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       CAST(SUM(CASE WHEN last_click_us IS NOT NULL
                      AND ts_us - last_click_us <= {_ATTRIB_WINDOW_US}
                     THEN CAST(round(value * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS attributed_cents,
       CAST(SUM(CASE WHEN last_click_us IS NOT NULL
                      AND ts_us - last_click_us <= {_ATTRIB_WINDOW_US}
                     THEN 0
                     ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
         AS unattributed_cents
FROM w
WHERE event_type = 'purchase'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# CUSUM change-point detection per hourly series — the monitoring
# primitive behind "when did this metric's level shift". The classic
# statistic Σ(yᵢ − ȳ) needs the float mean; scaling by n keeps it
# EXACT: CUSUM_k = n·Σ_{i≤k} yᵢ − k·Σy (integer, sign-identical to
# the textbook form). The change point is the bucket maximizing
# |CUSUM| (tie → earliest hour), found via max(struct) argmax — no
# second pass.
#
# Scale shape: one input-sized hash-agg (hourly rollup), one window
# pass over the per-type series (bounded by calendar span × types),
# one per-type argmax agg. Same cost envelope as the trend query.
# ---------------------------------------------------------------------------


def _events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.expr(f"ts_us div {_US_PER_HOUR}").alias("h")
    ).agg(F.count(F.lit(1)).alias("y"))
    w_ord = (
        Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cusum = hourly.select(
        "event_type", "h",
        (F.count(F.lit(1)).over(w_all) * F.sum("y").over(w_ord)
         - F.row_number().over(
             Window.partitionBy("event_type").orderBy("h"))
         * F.sum("y").over(w_all)).alias("cusum"),
        F.count(F.lit(1)).over(w_all).alias("n_buckets"),
    )
    return (
        cusum.groupBy("event_type")
        .agg(
            F.first("n_buckets").cast("int").alias("n_buckets"),
            F.max(F.struct(
                F.abs("cusum").alias("a"),
                (-F.col("h")).alias("neg_h"),
                F.col("cusum").alias("c"),
            )).alias("__b"),
        )
        .select(
            "event_type", "n_buckets",
            (-F.col("__b.neg_h")).cast("long").alias("change_hour"),
            F.col("__b.c").cast("long").alias("cusum_scaled"),
            F.col("__b.a").cast("long").alias("abs_cusum"),
        )
    )


_CUSUM_SQL = f"""
WITH hourly AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // {_US_PER_HOUR} AS h,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, h,
         COUNT(*) OVER (PARTITION BY event_type)
           * SUM(y) OVER (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
         - row_number() OVER (PARTITION BY event_type ORDER BY h)
           * SUM(y) OVER (PARTITION BY event_type) AS cusum,
         COUNT(*) OVER (PARTITION BY event_type) AS n_buckets
  FROM hourly
)
SELECT event_type, CAST(MIN(n_buckets) AS INT) AS n_buckets,
       CAST(MIN(CASE WHEN rnk = 1 THEN h END) AS BIGINT) AS change_hour,
       CAST(MIN(CASE WHEN rnk = 1 THEN cusum END) AS BIGINT)
         AS cusum_scaled,
       CAST(MIN(CASE WHEN rnk = 1 THEN abs(cusum) END) AS BIGINT)
         AS abs_cusum
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(cusum) DESC, h ASC) AS rnk
  FROM c
) t
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# k-anonymity audit — the data-governance counterpart of the PII scrub
# (scale/text.py): before publishing a table, check that every
# quasi-identifier combination (here nation × market segment) hides
# each row among ≥ k peers. Output is one row per anonymity level with
# the at-risk population, plus the minimum group size — the number a
# privacy review asks for first.
#
# Scale shape: one hash-agg on the quasi-identifier key, then a
# histogram-of-group-sizes agg (distinct-group-count-sized input).
# ---------------------------------------------------------------------------

_K_ANON = 5


def _k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("g")
    )
    return (
        groups.select(
            F.when(F.col("g") < _K_ANON, F.lit("at_risk"))
            .otherwise(F.lit("anonymous")).alias("status"),
            "g",
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("g").cast("long").alias("n_rows"),
            F.min("g").cast("long").alias("min_group_size"),
            F.max("g").cast("long").alias("max_group_size"),
        )
    )


_K_ANON_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS g
  FROM customer GROUP BY 1, 2
)
SELECT CASE WHEN g < {_K_ANON} THEN 'at_risk' ELSE 'anonymous' END
         AS status,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(g) AS BIGINT) AS n_rows,
       CAST(MIN(g) AS BIGINT) AS min_group_size,
       CAST(MAX(g) AS BIGINT) AS max_group_size
FROM groups GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Consistent-universe sampling — the referential-integrity-preserving
# downsample (BigQuery/Snowflake "sample by hash of the entity key"):
# pick ~10% of CUSTOMERS by md5 threshold, then take exactly their
# orders and their lineitems. Row-level Bernoulli on each table would
# break every FK; hashing the ENTITY key keeps the subset closed under
# joins, so the sample is a working miniature warehouse.
#
# Scale shape: the customer filter is map-only (hash threshold); orders
# filter joins the sampled-key set (runtime-Bloom-joinable semi-join);
# lineitem reaches customers through orders with a second semi-join.
# Output: per-table before/after counts + sampled-universe revenue.
# ---------------------------------------------------------------------------

_SAMPLE_MOD = 10


def _universe_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    picked = cust.filter(
        F.expr("cast(conv(substring(md5(cast(c_custkey as string)), 1, 8), "
               f"16, 10) as bigint) % {_SAMPLE_MOD} = 0")
    ).select("c_custkey")
    s_orders = orders.join(
        picked, orders.o_custkey == picked.c_custkey, "left_semi"
    )
    s_li = li.join(
        s_orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"), "left_semi"
    )

    def row(name, full_df, sample_df, rev_col=None):
        rev = (F.sum(cents(rev_col)) if rev_col is not None
               else F.lit(0)).alias("rev_cents")
        full = full_df.agg(F.count(F.lit(1)).alias("n_full"))
        samp = sample_df.agg(F.count(F.lit(1)).alias("n_sample"), rev)
        return full.crossJoin(samp).select(  # two 1-row folds
            F.lit(name).alias("table"),
            F.col("n_full").cast("long").alias("n_full"),
            F.col("n_sample").cast("long").alias("n_sample"),
            F.expr("cast((1000000 * n_sample) div n_full as int)")
            .alias("sample_ppm"),
            F.coalesce(F.col("rev_cents"), F.lit(0)).cast("long")
            .alias("rev_cents"),
        )

    return (
        row("customer", cust, picked)
        .unionByName(row("orders", orders, s_orders, "o_totalprice"))
        .unionByName(row("lineitem", li, s_li, "l_extendedprice"))
    )


_UNIVERSE_SAMPLE_SQL = f"""
WITH picked AS (
  SELECT c_custkey FROM customer
  WHERE CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                                    1, 8)) AS BIGINT)
        % {_SAMPLE_MOD} = 0
), s_orders AS (
  SELECT * FROM orders SEMI JOIN picked ON o_custkey = c_custkey
), s_li AS (
  SELECT * FROM lineitem SEMI JOIN s_orders ON l_orderkey = o_orderkey
)
SELECT 'customer' AS "table",
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_full,
       CAST((SELECT COUNT(*) FROM picked) AS BIGINT) AS n_sample,
       CAST((1000000 * (SELECT COUNT(*) FROM picked))
            // (SELECT COUNT(*) FROM customer) AS INT) AS sample_ppm,
       CAST(0 AS BIGINT) AS rev_cents
UNION ALL
SELECT 'orders',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM s_orders),
       CAST((1000000 * (SELECT COUNT(*) FROM s_orders))
            // (SELECT COUNT(*) FROM orders) AS INT),
       CAST(COALESCE((SELECT SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                      FROM s_orders), 0) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM s_li),
       CAST((1000000 * (SELECT COUNT(*) FROM s_li))
            // (SELECT COUNT(*) FROM lineitem) AS INT),
       CAST(COALESCE((SELECT SUM(CAST(round(l_extendedprice * 100)
                                      AS BIGINT)) FROM s_li), 0) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# Chi-square independence audit — are two categorical columns
# (order priority × status) independent? The third member of the
# statistical data-quality family (Benford = digit law, CUSUM = level
# shifts, chi² = association). Exact-integer formulation: with
# observed O, row total R, column total C, grand total N, the per-cell
# term (O·N − R·C)² / (N·R·C) is computed as a FLOORED micro-unit —
# per-cell floor-then-sum is deterministic under any engine (the same
# discipline as the HHI basis-point floor).
#
# Overflow discipline (ADVICE r8): the naive int64 form
# ``1000000·d² div m`` (d = O·N − R·C, m = N·R·C) scales as N⁴·10⁶ and
# wraps silently in non-ANSI Spark around N ≈ 10⁵ while DuckDB raises —
# engine divergence exactly where the 100 TB framing matters. The
# per-cell term is instead computed 128-bit-wide — DECIMAL(38,0) in
# Spark, HUGEINT in DuckDB — via the exact decomposition
#   floor(10⁶·d²/m) = (d² div m)·10⁶ + ((d² mod m)·10⁶) div m
# (all operands non-negative, so Spark's truncating ``div`` and
# DuckDB's flooring ``//`` agree). Every intermediate fits 38 digits
# for N ≤ 3·10⁹ orders (binding term d² ≤ N⁴ < 10³⁸); beyond that
# BOTH engines raise rather than silently diverging (Spark 4 ANSI
# decimal overflow, DuckDB INT128 overflow). At 100 TB a real
# deployment shards the contingency audit by partition key (e.g.
# month) long before any shard holds 3e9 rows.
#
# Scale shape: one fact pass → |priorities × statuses| contingency
# hash-agg; the margins re-aggregate the tiny table and broadcast
# back. dof rides along so a reader can look up the critical value.
# ---------------------------------------------------------------------------


def _chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    obs = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("o")
    ).localCheckpoint(eager=False)  # 3 margin consumers, one fact pass
    rows_ = obs.groupBy("o_orderpriority").agg(F.sum("o").alias("r"))
    cols_ = obs.groupBy("o_orderstatus").agg(F.sum("o").alias("c"))
    n_ = obs.agg(F.sum("o").alias("n"),
                 F.count_distinct("o_orderpriority").alias("n_rows_dim"),
                 F.count_distinct("o_orderstatus").alias("n_cols_dim"))
    cell = (
        obs.join(F.broadcast(rows_), "o_orderpriority")
        .join(F.broadcast(cols_), "o_orderstatus")
        .crossJoin(F.broadcast(n_))  # 1-row fold
        # 128-bit-wide cell term (see overflow discipline above):
        # d, m, d² all DECIMAL(38,0)-exact for N ≤ 3e9; ``div`` on
        # decimals yields BIGINT, so term_micro lands as long.
        .select(
            F.expr(
                "CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) "
                "- CAST(r AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))"
            ).alias("d"),
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * CAST(r AS DECIMAL(38,0)) "
                "* CAST(c AS DECIMAL(38,0))"
            ).alias("m"),
            "n_rows_dim", "n_cols_dim",
        )
        .select(
            F.expr("((d * d) div m) * 1000000 "
                   "+ (((d * d) % m) * 1000000) div m").alias("term_micro"),
            "n_rows_dim", "n_cols_dim",
        )
    )
    return cell.groupBy("n_rows_dim", "n_cols_dim").agg(
        F.count(F.lit(1)).cast("int").alias("n_cells"),
        F.sum("term_micro").cast("long").alias("chi2_micro"),
    ).select(
        "n_cells",
        ((F.col("n_rows_dim") - 1) * (F.col("n_cols_dim") - 1))
        .cast("int").alias("dof"),
        "chi2_micro",
    )


_CHI2_SQL = """
WITH obs AS (
  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
), r AS (
  SELECT o_orderpriority, SUM(o) AS r FROM obs GROUP BY 1
), c AS (
  SELECT o_orderstatus, SUM(o) AS c FROM obs GROUP BY 1
), n AS (
  SELECT SUM(o) AS n,
         COUNT(DISTINCT o_orderpriority) AS n_rows_dim,
         COUNT(DISTINCT o_orderstatus) AS n_cols_dim
  FROM obs
)
, cell AS (
  -- 128-bit cell term (HUGEINT), same div/mod decomposition as the
  -- Spark plan: floor(1e6*d^2/m) = (d^2//m)*1e6 + ((d^2%m)*1e6)//m.
  SELECT CAST(obs.o AS HUGEINT) * n.n - CAST(r.r AS HUGEINT) * c.c AS d,
         CAST(n.n AS HUGEINT) * r.r * c.c AS m,
         n.n_rows_dim, n.n_cols_dim
  FROM obs
  JOIN r USING (o_orderpriority)
  JOIN c USING (o_orderstatus)
  CROSS JOIN n
)
SELECT CAST(COUNT(*) AS INT) AS n_cells,
       CAST(MIN((n_rows_dim - 1) * (n_cols_dim - 1)) AS INT) AS dof,
       CAST(SUM(((d * d) // m) * 1000000
                + (((d * d) % m) * 1000000) // m) AS BIGINT) AS chi2_micro
FROM cell
"""


# ---------------------------------------------------------------------------
# Pareto / ABC classification — the inventory-analytics standard:
# rank customers by lifetime revenue, class A while the cumulative
# share ≤ 80%, B ≤ 95%, C above. Cumulative shares stay exact
# (integer cents cumsum vs total·threshold products — no division at
# all), ranks fully tie-broken by custkey. The global sort runs over
# the CUSTOMER AGGREGATE, the same bounded-window justification as
# RFM; at 100 TB the sketch-cutoff variant applies (DDSketch edges).
# ---------------------------------------------------------------------------


def _customers_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("rev_cents")
    )
    tot = per_cust.agg(F.sum("rev_cents").alias("tot"))
    # Exact running revenue without a single-partition sort: the
    # range-partitioned prefix decomposition (functions/ranks.py).
    ranked = (
        global_row_number(
            per_cust.crossJoin(F.broadcast(tot)),  # 1-row fold
            [F.desc("rev_cents"), F.asc("o_custkey")],
            rank_col="__rn",
            cumsum={"cum_cents": "rev_cents"},
        )
        .drop("__rn")
        .withColumn(
            "abc_class",
            F.when(F.expr("100 * cum_cents <= 80 * tot"), F.lit("A"))
            .when(F.expr("100 * cum_cents <= 95 * tot"), F.lit("B"))
            .otherwise(F.lit("C")),
        )
    )
    return ranked.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("rev_cents").cast("long").alias("class_rev_cents"),
        F.min("rev_cents").cast("long").alias("min_rev_cents"),
    )


_ABC_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
), tot AS (SELECT SUM(rev_cents) AS tot FROM per_cust),
ranked AS (
  SELECT p.rev_cents, t.tot,
         SUM(p.rev_cents) OVER (ORDER BY p.rev_cents DESC, p.o_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum_cents
  FROM per_cust p CROSS JOIN tot t
)
SELECT CASE WHEN 100 * cum_cents <= 80 * tot THEN 'A'
            WHEN 100 * cum_cents <= 95 * tot THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(rev_cents) AS BIGINT) AS class_rev_cents,
       CAST(MIN(rev_cents) AS BIGINT) AS min_rev_cents
FROM ranked GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Gini coefficient (Gini 1912, the rank-sum formulation of Sen 1973)
# of customer revenue per market segment — the
# inequality readout completing the concentration family (HHI = market
# concentration, ABC = Pareto classes, Gini = distributional
# inequality). Exact integers throughout: with revenues x_1 ≤ … ≤ x_n
# (ascending, custkey tie-break) the population Gini is
#   G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)
# reported as a floored micro-unit via the same 128-bit div/mod
# decomposition as the chi-square audit (numerator ≤ n²·max_x exceeds
# int64 around n ≈ 10⁶ per segment; DECIMAL(38,0)/HUGEINT carries it
# to n ≈ 10⁹ and both engines fail loudly beyond).
#
# Scale shape: per-customer hash-agg → segment join → the per-segment
# rank is an exact range-partitioned rank (functions/ranks.py, grouped
# by segment): each segment's customers are range-split across MANY
# tasks, so no task ever sorts a whole segment (5 segments would
# otherwise mean 1/5 of all customers through one task at 100×).
# ---------------------------------------------------------------------------


def _customers_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per = (
        orders.groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("rev_cents"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    ranked = global_row_number(
        per, [F.asc("rev_cents"), F.asc("c_custkey")],
        by=["c_mktsegment"], rank_col="i",
    )
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("rev_cents").cast("long").alias("rev_cents"),
        F.sum(F.expr(
            "CAST(i AS DECIMAL(38,0)) * CAST(rev_cents AS DECIMAL(38,0))"
        )).alias("swx"),
    )
    return (
        agg.select(
            "c_mktsegment", "n_customers", "rev_cents",
            F.expr(
                "2 * swx - (CAST(n_customers AS DECIMAL(38,0)) + 1)"
                " * CAST(rev_cents AS DECIMAL(38,0))"
            ).alias("num"),
            F.expr(
                "CAST(n_customers AS DECIMAL(38,0))"
                " * CAST(rev_cents AS DECIMAL(38,0))"
            ).alias("den"),
        )
        .select(
            "c_mktsegment", "n_customers", "rev_cents",
            F.expr("(num div den) * 1000000"
                   " + ((num % den) * 1000000) div den")
            .cast("long").alias("gini_micro"),
        )
    )


_GINI_SQL = """
WITH per AS (
  SELECT c_mktsegment, o_custkey,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment, rev_cents,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY rev_cents ASC, o_custkey ASC) AS i
  FROM per
), agg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
         SUM(CAST(i AS HUGEINT) * rev_cents) AS swx
  FROM ranked GROUP BY 1
), frac AS (
  SELECT c_mktsegment, n_customers, rev_cents,
         2 * swx - (CAST(n_customers AS HUGEINT) + 1) * rev_cents AS num,
         CAST(n_customers AS HUGEINT) * rev_cents AS den
  FROM agg
)
SELECT c_mktsegment, n_customers, rev_cents,
       CAST((num // den) * 1000000
            + ((num % den) * 1000000) // den AS BIGINT) AS gini_micro
FROM frac
"""


# ---------------------------------------------------------------------------
# Robust outliers via median absolute deviation (Hampel 1974; the
# 3·MAD rule of Leys et al. 2013) — the outlier rule
# that survives the heavy tails the 2-sigma rule (events_hourly_anomalies)
# is blind to. Rank-exact discrete medians (the value at row_number
# ceil(n/2) under a fully tie-broken order — percentile_cont/ntile are
# NOT cross-engine-stable, value-at-rank is), deviations in exact
# cents, flag when dev > 3·MAD.
#
# Scale shape: two window passes partitioned by event_type + two tiny
# broadcast joins back on the type key; no global sort.
# ---------------------------------------------------------------------------


def _events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", cents("value").alias("v")
    )
    w_v = Window.partitionBy("event_type").orderBy("v", "event_id")
    n_w = Window.partitionBy("event_type")
    med = (
        ev.withColumn("rn", F.row_number().over(w_v))
        .withColumn("n", F.count(F.lit(1)).over(n_w))
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("v").alias("median_cents"))
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("v") - F.col("median_cents"))
    )
    w_d = Window.partitionBy("event_type").orderBy("dev", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(w_d))
        .withColumn("n", F.count(F.lit(1)).over(n_w))
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("dev").alias("mad_cents"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("median_cents").cast("long").alias("median_cents"),
            F.min("mad_cents").cast("long").alias("mad_cents"),
            F.sum((F.col("dev") > 3 * F.col("mad_cents")).cast("long"))
            .cast("long").alias("n_outliers"),
        )
    )


_MAD_SQL = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), med AS (
  SELECT event_type, v AS median_cents FROM (
    SELECT event_type, v,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY v, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM ev)
  WHERE rn = (n + 1) // 2
), dev AS (
  SELECT ev.event_id, ev.event_type, ev.v, med.median_cents,
         abs(ev.v - med.median_cents) AS dev
  FROM ev JOIN med USING (event_type)
), mad AS (
  SELECT event_type, dev AS mad_cents FROM (
    SELECT event_type, dev,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY dev, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM dev)
  WHERE rn = (n + 1) // 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(median_cents) AS BIGINT) AS median_cents,
       CAST(MIN(mad_cents) AS BIGINT) AS mad_cents,
       CAST(SUM(CASE WHEN dev > 3 * mad_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Seasonal-naive forecast scorecard — the sanity baseline every
# forecasting pipeline reports before any model: predict each hour
# with the same hour yesterday, score against the naive
# predict-last-hour baseline (the MASE denominator, Hyndman &
# Koehler 2006).
# Exact integers: hourly counts, absolute-error sums, floored milli
# ratio. mase_milli < 1000 ⟺ daily seasonality is real signal.
#
# Scale shape: one hourly rollup (hash-agg), then TWO keyed self-joins
# on (type, hour−1) and (type, hour−24) — calendar joins, not row-lag
# windows, so missing hours never silently misalign the lags.
# ---------------------------------------------------------------------------


def _events_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cur = hourly.select(
        "event_type", F.col("h").alias("h_cur"), F.col("c").alias("c_cur")
    )
    lag1 = hourly.select(
        F.col("event_type").alias("et_l1"),
        F.col("h").alias("h_l1"), F.col("c").alias("c_l1"),
    )
    lag24 = hourly.select(
        F.col("event_type").alias("et_l24"),
        F.col("h").alias("h_l24"), F.col("c").alias("c_l24"),
    )
    joined = (
        cur.join(
            lag1,
            (F.col("event_type") == F.col("et_l1"))
            & F.expr("h_l1 = h_cur - INTERVAL 1 HOUR"),
        )
        .join(
            lag24,
            (F.col("event_type") == F.col("et_l24"))
            & F.expr("h_l24 = h_cur - INTERVAL 24 HOUR"),
        )
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours_scored"),
            F.sum(F.abs(F.col("c_cur") - F.col("c_l24")))
            .cast("long").alias("sae_seasonal"),
            F.sum(F.abs(F.col("c_cur") - F.col("c_l1")))
            .cast("long").alias("sae_naive"),
        )
        .select(
            "event_type", "n_hours_scored", "sae_seasonal", "sae_naive",
            F.expr("if(sae_naive = 0, NULL,"
                   " (1000 * sae_seasonal) div sae_naive)")
            .cast("long").alias("mase_milli"),
        )
    )


_SEASONAL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), joined AS (
  SELECT cur.event_type, cur.c AS c_cur, l1.c AS c_l1, l24.c AS c_l24
  FROM hourly cur
  JOIN hourly l1 ON l1.event_type = cur.event_type
                AND l1.h = cur.h - INTERVAL 1 HOUR
  JOIN hourly l24 ON l24.event_type = cur.event_type
                 AND l24.h = cur.h - INTERVAL 24 HOUR
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours_scored,
         CAST(SUM(abs(c_cur - c_l24)) AS BIGINT) AS sae_seasonal,
         CAST(SUM(abs(c_cur - c_l1)) AS BIGINT) AS sae_naive
  FROM joined GROUP BY 1
)
SELECT event_type, n_hours_scored, sae_seasonal, sae_naive,
       CAST(CASE WHEN sae_naive = 0 THEN NULL
                 ELSE (1000 * sae_seasonal) // sae_naive
            END AS BIGINT) AS mase_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# Order backlog timeline — the interval prefix-sum every operations
# dashboard runs: +1 the month an order opens, −1 the month its last
# lineitem ships (the fixture lineitem carries l_shipdate only),
# cumulative sum = end-of-month open backlog.
# The running sum's window covers MONTHS (~84 for TPC-H), not orders —
# the bounded-window justification again; the per-order close date is
# one hash-agg over lineitem.
# ---------------------------------------------------------------------------


def _orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    opened = orders.select(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.lit(1).alias("delta"),
    )
    closed = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("closed_on"))
        .select(
            F.date_trunc("month", "closed_on").alias("m"),
            F.lit(-1).alias("delta"),
        )
    )
    monthly = opened.unionByName(closed).groupBy("m").agg(
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0))
        .cast("long").alias("n_opened"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
        .cast("long").alias("n_closed"),
    )
    w = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return monthly.select(
        F.col("m").cast("date").alias("month"),
        "n_opened", "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed")).over(w)
        .cast("long").alias("backlog_eom"),
    )


_BACKLOG_SQL = """
WITH opened AS (
  SELECT date_trunc('month', o_orderdate) AS m, 1 AS delta FROM orders
), closed AS (
  SELECT date_trunc('month', MAX(l_shipdate)) AS m, -1 AS delta
  FROM lineitem GROUP BY l_orderkey
), monthly AS (
  SELECT m,
         CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_opened,
         CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_closed
  FROM (SELECT * FROM opened UNION ALL SELECT * FROM closed)
  GROUP BY 1
)
SELECT CAST(m AS DATE) AS month, n_opened, n_closed,
       CAST(SUM(n_opened - n_closed)
            OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS backlog_eom
FROM monthly
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt surface — the wide→long reshape (DataFrame.unpivot,
# Spark 3.4+; SQL UNPIVOT) exercised over part's numeric metrics, with
# a per-(brand, metric) rollup on the long form. The melt itself is a
# zero-shuffle Expand; only the rollup exchanges.
# ---------------------------------------------------------------------------


def _part_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select(
        "p_brand",
        cents("p_retailprice").alias("retailprice_cents"),
        F.col("p_size").cast("long").alias("size_units"),
    )
    long_form = part.unpivot(
        ids=["p_brand"],
        values=["retailprice_cents", "size_units"],
        variableColumnName="metric",
        valueColumnName="v",
    )
    return long_form.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("v").cast("long").alias("total"),
        F.min("v").cast("long").alias("min_v"),
        F.max("v").cast("long").alias("max_v"),
    )


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 100) AS BIGINT) AS retailprice_cents,
         CAST(p_size AS BIGINT) AS size_units
  FROM part
), long_form AS (
  UNPIVOT wide ON retailprice_cents, size_units
  INTO NAME metric VALUE v
)
SELECT p_brand, metric,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(v) AS BIGINT) AS total,
       CAST(MIN(v) AS BIGINT) AS min_v,
       CAST(MAX(v) AS BIGINT) AS max_v
FROM long_form
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier; Börzsönyi et al. 2001) — parts no other
# part dominates on (lower price, larger size). The classic O(n²)
# dominance test collapses to two exact running maxima on the sorted
# price axis: a part is dominated iff a STRICTLY cheaper part has size
# ≥ its own or an equal-priced part has size strictly greater. Integer
# cents make the strict RANGE bound exact.
#
# Scale shape: prefix-max DECOMPOSITION, never a global sort. The price
# axis is range-bucketed (bucket count bounded by the PRICE DOMAIN, not
# the row count — it does not grow at 100× data); per-bucket max(size)
# is one hash-agg; the running max over strictly-lower buckets is a
# broadcast inequality self-join of that tiny bucket table (O(B²)
# comparisons with B fixed ≈ domain/width — a documented bounded fold,
# like the repo's 1-row crossJoin folds); each part row then needs only
# a BUCKET-PARTITIONED window for its intra-bucket strictly-cheaper max
# and equal-price max (both RANGE frames over one partitionBy(bkt)
# sort, so Catalyst evaluates them in a single Window exchange). No
# unpartitioned window, no single-partition sort anywhere in the plan
# (pinned by tests/test_plans.py::test_skyline_has_no_global_sort).
# ---------------------------------------------------------------------------

#: Price-axis bucket width (cents) for the skyline prefix-max
#: decomposition. TPC-H part prices span ~[90000, 210000) cents, so
#: 100-cent buckets give ~1.2k buckets — small enough to broadcast,
#: wide enough that per-bucket windows stay tiny.
SKYLINE_BUCKET_CENTS = 100


def skyline_2d(part: DataFrame) -> DataFrame:
    """Skyline of (minimize ``price_cents``, maximize ``size``) over a
    frame with columns ``p_partkey, price_cents, size``."""
    part = part.withColumn(
        "bkt", F.expr(f"price_cents div {SKYLINE_BUCKET_CENTS}")
    )
    # Standard lazy barrier: the tiny bucket aggregate feeds both sides
    # of the self-join below — without it each side re-scans part.
    bmax = part.groupBy("bkt").agg(F.max("size").alias("bmax")) \
        .localCheckpoint(eager=False)
    prev = (
        bmax.join(
            F.broadcast(
                bmax.select(F.col("bkt").alias("pbkt"),
                            F.col("bmax").alias("pmax"))
            ),
            F.col("pbkt") < F.col("bkt"),
            "left",
        )
        .groupBy("bkt")
        .agg(F.max("pmax").alias("m_prev"))
    )
    w_in = Window.partitionBy("bkt").orderBy("price_cents")
    flagged = part.join(F.broadcast(prev), "bkt").select(
        "p_partkey", "price_cents", "size",
        # strictly-cheaper max = max over lower buckets (broadcast)
        # vs. strictly-lower prices inside this bucket (RANGE to -1);
        # greatest() ignores a NULL side, NULL only if both are.
        F.greatest(
            F.col("m_prev"),
            F.max("size").over(
                w_in.rangeBetween(Window.unboundedPreceding, -1)
            ),
        ).alias("m_cheaper"),
        # equal prices never span buckets, so the same partitioned
        # sort serves the per-price max via a [0, 0] RANGE frame.
        F.max("size").over(w_in.rangeBetween(0, 0)).alias("m_equal"),
    )
    return (
        flagged.filter(
            ~(F.coalesce(F.col("m_cheaper") >= F.col("size"), F.lit(False))
              | (F.col("m_equal") > F.col("size")))
        )
        .select("p_partkey", "price_cents", "size")
    )


def _part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skyline_2d(
        load(spark, sf_dir, "part").select(
            "p_partkey",
            cents("p_retailprice").alias("price_cents"),
            F.col("p_size").cast("int").alias("size"),
        )
    )


_SKYLINE_SQL = """
WITH part_c AS (
  SELECT p_partkey,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS INT) AS size
  FROM part
), flagged AS (
  SELECT p_partkey, price_cents, size,
         MAX(size) OVER (ORDER BY price_cents
                         RANGE BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS m_cheaper,
         MAX(size) OVER (PARTITION BY price_cents) AS m_equal
  FROM part_c
)
SELECT p_partkey, price_cents, size
FROM flagged
WHERE NOT (COALESCE(m_cheaper >= size, FALSE) OR m_equal > size)
"""


# ---------------------------------------------------------------------------
# Exact value deciles — the LTV-decile table every growth dashboard
# carries, binned by floor arithmetic on row_number (``ntile`` is NOT
# cross-engine-stable for ties/remainders — see contract.py), so
# decile = ((rank − 1) · 10) div n is bit-identical anywhere. The rank
# over the USER AGGREGATE is an exact range-partitioned rank
# (functions/ranks.py) and the total count a broadcast 1-row fold —
# no single-partition sort, no whole-table window.
# ---------------------------------------------------------------------------


def _events_user_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(cents("value")).alias("ltv_cents")
    )
    n = per_user.agg(F.count(F.lit(1)).alias("n"))
    binned = (
        global_row_number(
            per_user, [F.desc("ltv_cents"), F.asc("user_id")],
            rank_col="rnk",
        )
        .crossJoin(F.broadcast(n))  # 1-row fold
        .select(
            "ltv_cents",
            F.expr("cast(((rnk - 1) * 10) div n as int)").alias("decile"),
        )
    )
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("ltv_cents").cast("long").alias("decile_cents"),
        F.max("ltv_cents").cast("long").alias("max_cents"),
        F.min("ltv_cents").cast("long").alias("min_cents"),
    )


_USER_DECILES_SQL = """
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS ltv_cents
  FROM events GROUP BY 1
), binned AS (
  SELECT ltv_cents,
         CAST(((ROW_NUMBER() OVER (ORDER BY ltv_cents DESC, user_id ASC)
                - 1) * 10)
              // (COUNT(*) OVER ()) AS INT) AS decile
  FROM per_user
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(ltv_cents) AS BIGINT) AS decile_cents,
       CAST(MAX(ltv_cents) AS BIGINT) AS max_cents,
       CAST(MIN(ltv_cents) AS BIGINT) AS min_cents
FROM binned GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS — the third member of the multi-level
# aggregation family (CUBE = status_priority_cube, ROLLUP =
# rollup_order_counts): a hand-picked set list with per-column
# GROUPING() flags, the form a reporting layer emits when it wants
# specific subtotal combinations and not the full lattice. One pass,
# Expand shape — |sets| × the input streams through a single hash-agg.
# ---------------------------------------------------------------------------


def _lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_returnflag"),
            F.grouping("l_linestatus").cast("int").alias("g_linestatus"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(cents("l_extendedprice")).cast("long").alias("rev_cents"),
        )
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_returnflag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# ---------------------------------------------------------------------------
# Exact percentile ranks — percent_rank / cume_dist re-derived as
# floored integer milli ratios from rank and count (the native
# functions return doubles whose ×1000-floor could straddle an ulp
# cross-engine; (rank−1, n−1, cume) are integers, so the floors are
# exact). Windows partitioned by market segment over the customer
# aggregate — the bounded-window discipline.
# ---------------------------------------------------------------------------


def _customers_percentile_ranks(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per = (
        orders.groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("rev_cents"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("rev_cents"), F.asc("c_custkey")
    )
    w_cume = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("rev_cents")
    ).rangeBetween(Window.unboundedPreceding, Window.currentRow)
    n_w = Window.partitionBy("c_mktsegment")
    return (
        per.select(
            "c_custkey", "c_mktsegment", "rev_cents",
            F.row_number().over(w).cast("int").alias("rnk"),
            F.count(F.lit(1)).over(w_cume).alias("cume"),
            F.count(F.lit(1)).over(n_w).alias("n"),
        )
        .select(
            "c_custkey", "c_mktsegment", "rev_cents", "rnk",
            F.expr("cast(if(n = 1, 0,"
                   " (1000 * (rnk - 1)) div (n - 1)) as int)")
            .alias("pr_milli"),
            F.expr("cast((1000 * cume) div n as int)").alias("cd_milli"),
        )
    )


_PERCENTILE_RANKS_SQL = """
WITH per AS (
  SELECT c_custkey, c_mktsegment,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT c_custkey, c_mktsegment, rev_cents,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY rev_cents, c_custkey) AS rnk,
         COUNT(*) OVER (PARTITION BY c_mktsegment
                        ORDER BY rev_cents
                        RANGE UNBOUNDED PRECEDING) AS cume,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM per
)
SELECT c_custkey, c_mktsegment, rev_cents, CAST(rnk AS INT) AS rnk,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE (1000 * (rnk - 1)) // (n - 1) END AS INT) AS pr_milli,
       CAST((1000 * cume) // n AS INT) AS cd_milli
FROM ranked
"""


# ---------------------------------------------------------------------------
# Gaps & islands — consecutive-month order streaks per customer (the
# classic streak pattern): distinct active months → the month_index −
# row_number island key → per-customer streak stats. All windows
# partitioned by customer; month_index is pure integer calendar math.
# ---------------------------------------------------------------------------


def _customers_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    months = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .alias("mi"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mi")
    islands = months.withColumn(
        "grp", F.col("mi") - F.row_number().over(w)
    )
    streaks = islands.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("o_custkey").agg(
        F.sum("len").cast("int").alias("n_active_months"),
        F.count(F.lit(1)).cast("int").alias("n_streaks"),
        F.max("len").cast("int").alias("longest_streak"),
    )


_STREAKS_SQL = """
WITH months AS (
  SELECT DISTINCT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS mi
  FROM orders
), islands AS (
  SELECT o_custkey, mi,
         mi - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY mi) AS grp
  FROM months
), streaks AS (
  SELECT o_custkey, grp, COUNT(*) AS len
  FROM islands GROUP BY 1, 2
)
SELECT o_custkey,
       CAST(SUM(len) AS INT) AS n_active_months,
       CAST(COUNT(*) AS INT) AS n_streaks,
       CAST(MAX(len) AS INT) AS longest_streak
FROM streaks GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Exact global order statistics over the FACT table — the workload
# ``global_row_number`` (functions/ranks.py) exists for. A naive exact
# median/quartile is row_number() over an UNPARTITIONED window: every
# lineitem row through one sort task. Here the total order is
# range-partitioned, ranks are local-row-number + broadcast offsets,
# and the three quartile targets (value at rank ceil(n·k/4), the
# rank-exact discrete convention used across the catalog —
# percentile_cont is not cross-engine-stable) are a 3-row broadcast
# join back. No task ever sees more than one range slice.
# ---------------------------------------------------------------------------


def _lineitem_exact_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        cents("l_extendedprice").alias("price_cents"),
        "l_orderkey", "l_linenumber",
    )
    ranked = global_row_number(
        li, ["price_cents", "l_orderkey", "l_linenumber"], rank_col="rnk"
    )
    n = li.groupBy().agg(F.count(F.lit(1)).alias("n"))
    targets = (
        spark.range(1, 4)
        .select(F.col("id").cast("int").alias("quartile"))
        .crossJoin(F.broadcast(n))  # documented 1-row BNLJ fold
        .select(
            "quartile",
            F.expr("cast((n * quartile + 3) div 4 as int)").alias("target"),
        )
    )
    return (
        ranked.join(F.broadcast(targets), F.col("rnk") == F.col("target"))
        .select(
            "quartile",
            F.col("rnk").cast("int").alias("rnk"),
            F.col("price_cents").cast("long").alias("price_cents"),
        )
    )


_QUARTILES_SQL = """
WITH li AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
         l_orderkey, l_linenumber
  FROM lineitem
), ranked AS (
  SELECT price_cents,
         ROW_NUMBER() OVER (ORDER BY price_cents, l_orderkey,
                            l_linenumber) AS rnk
  FROM li
), n AS (SELECT COUNT(*) AS n FROM li),
targets AS (
  SELECT t.quartile, (n.n * t.quartile + 3) // 4 AS target
  FROM n, (VALUES (1), (2), (3)) AS t(quartile)
)
SELECT CAST(t.quartile AS INT) AS quartile,
       CAST(r.rnk AS INT) AS rnk,
       r.price_cents
FROM ranked r JOIN targets t ON r.rnk = t.target
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift statistic between the event-value
# distributions of two halves of the stream (even/odd event_id — the
# deterministic stand-in for "yesterday vs today") — the standard
# check that a feature's distribution hasn't shifted between training
# snapshots. D = max_x |F̂₁(x) − F̂₂(x)| computed EXACTLY on the cents
# grid: per-value counts, running totals via the range-partitioned
# cumsum (``global_row_number`` — the value axis grows with data, so
# an unpartitioned window would single-task it), then one max. The
# max of |cum₁·n₂ − cum₂·n₁| shares a single denominator n₁·n₂, so
# division happens once, after the max, in the 128-bit div/mod
# decomposition (chi2/gini pattern).
# ---------------------------------------------------------------------------


def _events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        cents("value").alias("v"),
        (F.col("event_id") % 2 == 0).cast("long").alias("is_l"),
    )
    byv = ev.groupBy("v").agg(
        F.sum("is_l").alias("c_l"),
        F.sum(F.lit(1) - F.col("is_l")).alias("c_r"),
    ).localCheckpoint(eager=False)  # totals + cumsum branches share it
    cum = global_row_number(
        byv, ["v"], rank_col="_i", cumsum={"cum_l": "c_l", "cum_r": "c_r"}
    )
    tot = byv.groupBy().agg(
        F.sum("c_l").cast("long").alias("n_left"),
        F.sum("c_r").cast("long").alias("n_right"),
    )
    dmax = (
        cum.crossJoin(F.broadcast(tot))  # documented 1-row BNLJ fold
        .select(
            "n_left", "n_right",
            F.expr(
                "abs(CAST(cum_l AS DECIMAL(38,0)) * n_right"
                " - CAST(cum_r AS DECIMAL(38,0)) * n_left)"
            ).alias("d"),
        )
        .groupBy("n_left", "n_right")
        .agg(F.max("d").alias("num"))
    )
    return (
        dmax.withColumn(
            "den",
            F.expr("CAST(n_left AS DECIMAL(38,0))"
                   " * CAST(n_right AS DECIMAL(38,0))"),
        )
        .select(
            "n_left", "n_right",
            F.expr("(num div den) * 1000000"
                   " + ((num % den) * 1000000) div den")
            .cast("long").alias("ks_micro"),
        )
    )


_KS_DRIFT_SQL = """
WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS is_l
  FROM events
), byv AS (
  SELECT v, CAST(SUM(is_l) AS BIGINT) AS c_l,
         CAST(SUM(1 - is_l) AS BIGINT) AS c_r
  FROM ev GROUP BY 1
), cum AS (
  SELECT SUM(c_l) OVER w AS cum_l, SUM(c_r) OVER w AS cum_r
  FROM byv
  WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT CAST(SUM(c_l) AS BIGINT) AS n_left,
         CAST(SUM(c_r) AS BIGINT) AS n_right
  FROM byv
), dm AS (
  SELECT n_left, n_right,
         MAX(abs(CAST(cum_l AS HUGEINT) * n_right
                 - CAST(cum_r AS HUGEINT) * n_left)) AS num
  FROM cum, tot GROUP BY 1, 2
)
SELECT n_left, n_right,
       CAST((num // den) * 1000000
            + ((num % den) * 1000000) // den AS BIGINT) AS ks_micro
FROM (SELECT n_left, n_right, num,
             CAST(n_left AS HUGEINT) * n_right AS den FROM dm)
"""


# ---------------------------------------------------------------------------
# Cohort lifetime-value matrix: customers grouped by first-order month,
# revenue accumulated by month offset — the classic growth-analytics
# triangle (and the LTV curve a data-mixture buyer reads). Exact cents
# throughout; the cumulative window is partitioned by cohort over the
# per-(cohort, offset) AGGREGATE, so its width is bounded by the
# calendar span squared, not by customers.
#
# Scale shape: one orders scan → per-customer min (hash-agg) → custkey
# shuffle join back (co-partitioned at scale) → (cohort, offset)
# hash-agg → calendar-bounded window.
# ---------------------------------------------------------------------------


def _customers_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .alias("midx"),
        cents("o_totalprice").alias("rev"),
    )
    first = o.groupBy("o_custkey").agg(F.min("midx").alias("cidx"))
    cells = (
        o.join(first, "o_custkey")
        .groupBy("cidx", (F.col("midx") - F.col("cidx")).alias("month_offset"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("rev").cast("long").alias("rev_cents"),
        )
    )
    w = (
        Window.partitionBy("cidx").orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn(
            "cum_rev_cents", F.sum("rev_cents").over(w).cast("long")
        )
        .select(
            F.expr("concat(cast(cidx div 12 as string), '-',"
                   " lpad(cast(cidx % 12 + 1 as string), 2, '0'))")
            .alias("cohort_month"),
            F.col("month_offset").cast("int").alias("month_offset"),
            "n_orders", "rev_cents", "cum_rev_cents",
        )
    )


_COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS midx,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rev
  FROM orders
), fst AS (
  SELECT o_custkey, MIN(midx) AS cidx FROM o GROUP BY 1
), cells AS (
  SELECT cidx, midx - cidx AS month_offset,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(rev) AS BIGINT) AS rev_cents
  FROM o JOIN fst USING (o_custkey)
  GROUP BY 1, 2
)
SELECT concat(CAST(cidx // 12 AS VARCHAR), '-',
              lpad(CAST(cidx % 12 + 1 AS VARCHAR), 2, '0')) AS cohort_month,
       CAST(month_offset AS INT) AS month_offset,
       n_orders, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY cidx ORDER BY month_offset
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_rev_cents
FROM cells
"""


# ---------------------------------------------------------------------------
# Purchase-cadence histogram: days between a customer's consecutive
# orders, bucketed by week — inter-arrival analysis (the
# time-between-events complement of customers_order_streaks' monthly
# islands). The lag window is partitioned by customer (parallel at any
# scale); the output is bounded by the calendar span in weeks.
# ---------------------------------------------------------------------------


def _customers_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        o.withColumn("prev_d", F.lag("d").over(w))
        .filter(F.col("prev_d").isNotNull())
        .select(F.datediff("d", "prev_d").alias("gap_days"))
    )
    return (
        gaps.groupBy(F.expr("cast(gap_days div 7 as int)").alias("gap_weeks"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap_days").cast("long").alias("sum_gap_days"),
        )
    )


_ORDER_GAPS_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d
  FROM orders
), gaps AS (
  SELECT datediff('day', lag(d) OVER (PARTITION BY o_custkey
                                      ORDER BY d, o_orderkey), d) AS gap_days
  FROM o
)
SELECT CAST(gap_days // 7 AS INT) AS gap_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_days) AS BIGINT) AS sum_gap_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Bipartite degree census of the supplier↔part graph implied by the
# fact table — the shape report that decides join strategy (skew,
# broadcastability) before running anything expensive on a graph. Two
# hash-agg levels per side over ONE shared distinct-edge frame (lazy
# checkpoint — two branches would otherwise re-run the distinct's
# shuffle); output is bounded by the max degree.
# ---------------------------------------------------------------------------


def _supplier_part_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = (
        load(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )

    def hist(key: str, side: str) -> DataFrame:
        return (
            sp.groupBy(key)
            .agg(F.count(F.lit(1)).alias("degree"))
            .groupBy("degree")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .select(
                F.lit(side).alias("side"),
                F.col("degree").cast("int").alias("degree"),
                "n_nodes",
            )
        )

    return hist("l_suppkey", "supplier").unionByName(hist("l_partkey", "part"))


_DEGREE_SQL = """
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
s AS (SELECT l_suppkey, COUNT(*) AS degree FROM sp GROUP BY 1),
p AS (SELECT l_partkey, COUNT(*) AS degree FROM sp GROUP BY 1)
SELECT 'supplier' AS side, CAST(degree AS INT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM s GROUP BY 2
UNION ALL
SELECT 'part' AS side, CAST(degree AS INT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM p GROUP BY 2
"""


# ---------------------------------------------------------------------------
# Discount→quantity response slope per return flag: the OLS regression
# aggregate n·Σxy−Σx·Σy over n·Σx²−(Σx)² in EXACT integers (x =
# discount percentage points, y = quantity cents), following
# events_hourly_trend — but here the numerator can be negative, so the
# quotient is sign-split (truncation toward zero is then identical to
# DuckDB's floor on the non-negative magnitude) and decomposed through
# the 128-bit div/mod pattern. One hash-agg over the fact table; the
# slope arithmetic runs on the 3-row aggregate.
# ---------------------------------------------------------------------------


def _lineitem_discount_elasticity(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("cast(round(l_discount * 100) as bigint)").alias("x"),
        cents("l_quantity").alias("y"),
    )
    # Moments accumulate in DECIMAL(38,0): Σxy over ~2×10¹¹ rows per
    # flag leaves int64 at 100 TB (Spark would wrap silently, DuckDB's
    # HUGEINT side would keep going — the Mann-Whitney divergence
    # class). The num/den fold below was already 128-bit.
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    return (
        agg.select(
            "l_returnflag", "n",
            F.expr("CAST(n AS DECIMAL(38,0)) * sxy"
                   " - CAST(sx AS DECIMAL(38,0)) * sy").alias("num"),
            F.expr("nullif(CAST(n AS DECIMAL(38,0)) * sxx"
                   " - CAST(sx AS DECIMAL(38,0)) * sx, 0)").alias("den"),
        )
        .select(
            "l_returnflag", "n",
            F.expr(
                "cast((CASE WHEN num < 0 THEN -1 ELSE 1 END)"
                " * ((abs(num) div den) * 1000000"
                "    + ((abs(num) % den) * 1000000) div den) as bigint)"
            ).alias("slope_micro"),
        )
    )


_ELASTICITY_SQL = """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_discount * 100) AS BIGINT) AS x,
         CAST(round(l_quantity * 100) AS BIGINT) AS y
  FROM lineitem
), agg AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM li GROUP BY 1
), frac AS (
  SELECT l_returnflag, n,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         nullif(CAST(n AS HUGEINT) * sxx
                - CAST(sx AS HUGEINT) * sx, 0) AS den
  FROM agg
)
SELECT l_returnflag, n,
       CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
            * ((abs(num) // den) * 1000000
               + ((abs(num) % den) * 1000000) // den) AS BIGINT)
       AS slope_micro
FROM frac
"""


# ---------------------------------------------------------------------------
# Month-of-year seasonality index: each calendar month's revenue share
# against a uniform month (index 1 000 000 = exactly average) — the
# seasonal profile behind events_seasonal_naive, on the orders table.
# One hash-agg to 12 rows; the index division is the 128-bit div/mod
# decomposition against the single grand total.
# ---------------------------------------------------------------------------


def _orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        load(spark, sf_dir, "orders")
        .groupBy(F.month("o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents("o_totalprice")).cast("long").alias("rev_cents"),
        )
        .localCheckpoint(eager=False)  # total + per-month branches share
    )
    tot = per.groupBy().agg(
        F.expr("CAST(sum(rev_cents) AS DECIMAL(38,0))").alias("total")
    )
    return (
        per.crossJoin(F.broadcast(tot))  # documented 1-row BNLJ fold
        .select(
            F.col("month").cast("int").alias("month"),
            "n_orders", "rev_cents",
            F.expr(
                "cast(((CAST(rev_cents AS DECIMAL(38,0)) * 12) div total)"
                " * 1000000"
                " + (((CAST(rev_cents AS DECIMAL(38,0)) * 12) % total)"
                "    * 1000000) div total as bigint)"
            ).alias("season_index_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Per-type peak hour-of-day via max_by/arg_max — the argmax aggregate
# surface (one hash-agg, no window, no join-back: the classic
# "row_number = 1" plan needs a sort per group; max_by carries the
# argument through the existing aggregation). Neither engine defines
# tie order, so the tie-break is encoded INTO the ordering key:
# n·100 + (99 − hour) prefers the larger count, then the EARLIER hour
# — deterministic in both engines with a plain BIGINT key (DuckDB's
# arg_max accepts no struct keys).
# ---------------------------------------------------------------------------


def _events_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.expr(f"(ts_us div {_US_PER_HOUR}) % 24").alias("hour"),
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        hourly.groupBy("event_type")
        .agg(
            F.expr("max_by(hour, n * 100 + (99 - hour))")
            .cast("int").alias("peak_hour"),
            F.max("n").cast("long").alias("peak_events"),
            F.sum("n").cast("long").alias("total_events"),
        )
        .withColumn(
            "peak_share_milli",
            F.expr("cast((1000 * peak_events) div total_events as int)"),
        )
    )


_PEAK_HOUR_SQL = f"""
WITH hourly AS (
  SELECT event_type, (epoch_us(ts) // {_US_PER_HOUR}) % 24 AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(arg_max(hour, n * 100 + (99 - hour)) AS INT) AS peak_hour,
       CAST(MAX(n) AS BIGINT) AS peak_events,
       CAST(SUM(n) AS BIGINT) AS total_events,
       CAST((1000 * MAX(n)) // SUM(n) AS INT) AS peak_share_milli
FROM hourly GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Exact-integer Pearson correlation of account balance vs realized
# revenue per market segment: both moments' numerators in DECIMAL(38,0),
# then ONE float division per segment — floor() on the identical
# double quotient in both engines (the possibly-negative-numerator
# convention from docs_importance_resample; sqrt/multiply/divide are
# the same IEEE ops on the same operands). One shuffle join + one
# hash-agg; the correlation arithmetic runs on the 5-row aggregate.
# ---------------------------------------------------------------------------


def _customers_balance_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", cents("c_acctbal").alias("x")
    )
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("y"))
    )
    per = cust.join(rev, F.col("c_custkey") == F.col("o_custkey"))
    agg = per.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )
    return agg.select(
        "c_mktsegment", "n",
        F.expr(
            "cast(floor(cast(CAST(n AS DECIMAL(38,0)) * sxy"
            "                - CAST(sx AS DECIMAL(38,0)) * sy as double)"
            " / nullif(sqrt(cast(CAST(n AS DECIMAL(38,0)) * sxx"
            "                    - CAST(sx AS DECIMAL(38,0)) * sx"
            "                    as double))"
            "          * sqrt(cast(CAST(n AS DECIMAL(38,0)) * syy"
            "                      - CAST(sy AS DECIMAL(38,0)) * sy"
            "                      as double)), 0.0d)"
            " * 1000000.0d) as bigint)"
        ).alias("corr_micro"),
    )


_BALANCE_CORR_SQL = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), per AS (
  SELECT c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS x, y
  FROM customer JOIN rev ON c_custkey = o_custkey
), agg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM per GROUP BY 1
)
SELECT c_mktsegment, n,
       CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / nullif(sqrt(CAST(CAST(n AS HUGEINT) * sxx
                                     - CAST(sx AS HUGEINT) * sx
                                     AS DOUBLE))
                           * sqrt(CAST(CAST(n AS HUGEINT) * syy
                                       - CAST(sy AS HUGEINT) * sy
                                       AS DOUBLE)), 0.0)
                  * 1000000.0) AS BIGINT) AS corr_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# Arrival burstiness per event type: the Fano factor of hourly counts,
# Var/Mean = (n·Q − S²) / (n·S) over the hourly-count series — 10⁶ ≈
# Poisson, higher = bursty arrivals (the capacity-planning readout).
# Two hash-aggs end in a per-type 128-bit div/mod division; the
# numerator n·Q−S² is a variance numerator, so non-negative.
# ---------------------------------------------------------------------------


def _events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        load_events(spark, sf_dir)
        .groupBy("event_type",
                 F.expr(f"ts_us div {_US_PER_HOUR}").alias("h"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    agg = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("x").cast("long").alias("n_events"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("q"),
    )
    return (
        agg.select(
            "event_type", "n_hours", "n_events",
            F.expr("CAST(n_hours AS DECIMAL(38,0)) * q"
                   " - CAST(n_events AS DECIMAL(38,0)) * n_events")
            .alias("num"),
            F.expr("CAST(n_hours AS DECIMAL(38,0))"
                   " * CAST(n_events AS DECIMAL(38,0))").alias("den"),
        )
        .select(
            "event_type", "n_hours", "n_events",
            F.expr("(num div den) * 1000000"
                   " + ((num % den) * 1000000) div den")
            .cast("long").alias("fano_micro"),
        )
    )


_BURSTINESS_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(x) AS BIGINT) AS n_events,
         SUM(CAST(x AS HUGEINT) * x) AS q
  FROM hourly GROUP BY 1
), frac AS (
  SELECT event_type, n_hours, n_events,
         CAST(n_hours AS HUGEINT) * q
           - CAST(n_events AS HUGEINT) * n_events AS num,
         CAST(n_hours AS HUGEINT) * n_events AS den
  FROM agg
)
SELECT event_type, n_hours, n_events,
       CAST((num // den) * 1000000
            + ((num % den) * 1000000) // den AS BIGINT) AS fano_micro
FROM frac
"""


# ---------------------------------------------------------------------------
# Per-hour KS drift vs the corpus-wide value distribution — the batch
# scorecard of the streaming drift monitor (streaming/drift.py shares
# the exact-integer core in functions/stats.py, so monitor and
# backfill can never disagree). Each hour's empirical CDF is compared
# to the global reference on the merged cents grid; hours whose KS
# spikes are the windows a feature-drift alert would fire on.
#
# Scale shape: two hash-aggs build the histograms; the merged axis is
# a union + re-aggregate (no full-outer join); cumulative counts run
# under hour-partitioned windows; one 128-bit division per hour.
# ---------------------------------------------------------------------------


def _events_hourly_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_validator_github_spark.functions.stats import ks_vs_reference

    ev = load_events(spark, sf_dir).select(
        (F.expr(f"ts_us div {_US_PER_HOUR}") * F.lit(3600))
        .alias("hour_epoch"),
        cents("value").alias("v"),
    ).localCheckpoint(eager=False)  # hourly + reference hists share it
    counts = ev.groupBy("hour_epoch", "v").agg(
        F.count(F.lit(1)).alias("n")
    )
    ref = ev.groupBy("v").agg(F.count(F.lit(1)).alias("n_ref"))
    # counts_within_ref: the reference is the global histogram of the
    # SAME events, so every hourly value exists in it — the sparse
    # change-point evaluation replaces the hours × domain dense grid
    # (r13: 720 × 17.8k ≈ 13M grid rows at sf0.1 from 100k events;
    # same exact integers, see functions/stats.py).
    return ks_vs_reference(counts, ref, ["hour_epoch"],
                           counts_within_ref=True)


_HOURLY_KS_SQL = f"""
WITH ev AS (
  SELECT (epoch_us(ts) // {_US_PER_HOUR}) * 3600 AS hour_epoch,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), counts AS (
  SELECT hour_epoch, v, CAST(COUNT(*) AS BIGINT) AS c_l FROM ev
  GROUP BY 1, 2
), ref AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c_r FROM ev GROUP BY 1
), merged AS (
  SELECT hour_epoch, v, SUM(c_l) AS c_l, SUM(c_r) AS c_r FROM (
    SELECT hour_epoch, v, c_l, 0 AS c_r FROM counts
    UNION ALL
    SELECT h.hour_epoch, r.v, 0 AS c_l, r.c_r
    FROM (SELECT DISTINCT hour_epoch FROM counts) h CROSS JOIN ref r
  ) GROUP BY 1, 2
), cum AS (
  SELECT hour_epoch,
         SUM(c_l) OVER w AS cum_l, SUM(c_r) OVER w AS cum_r,
         SUM(c_l) OVER g AS n_l, SUM(c_r) OVER g AS n_r
  FROM merged
  WINDOW w AS (PARTITION BY hour_epoch ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         g AS (PARTITION BY hour_epoch)
), dm AS (
  SELECT hour_epoch,
         CAST(n_l AS BIGINT) AS n_window,
         CAST(n_r AS BIGINT) AS n_ref,
         MAX(abs(CAST(cum_l AS HUGEINT) * n_r
                 - CAST(cum_r AS HUGEINT) * n_l)) AS num
  FROM cum GROUP BY 1, 2, 3
)
SELECT hour_epoch, n_window, n_ref,
       CAST((num // den) * 1000000
            + ((num % den) * 1000000) // den AS BIGINT) AS ks_micro
FROM (SELECT hour_epoch, n_window, n_ref, num,
             CAST(n_window AS HUGEINT) * n_ref AS den FROM dm)
"""


_SEASONALITY_SQL = """
WITH per AS (
  SELECT month(o_orderdate) AS month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
), tot AS (SELECT CAST(SUM(rev_cents) AS HUGEINT) AS total FROM per)
SELECT CAST(month AS INT) AS month, n_orders, rev_cents,
       CAST(((CAST(rev_cents AS HUGEINT) * 12) // total) * 1000000
            + (((CAST(rev_cents AS HUGEINT) * 12) % total) * 1000000)
              // total AS BIGINT) AS season_index_micro
FROM per, tot
"""


# ---------------------------------------------------------------------------
# Fulfillment latency (order date → first shipment) as exact per-priority
# percentiles. The percentile is computed from the (priority, days)
# HISTOGRAM, never a rank window over raw orders: one co-keyed join
# (lineitem pre-aggregated to its order grain), one hash-agg to a
# ~5×130-row grid, then windows over that bounded grid only. The
# percentile rule is division-free — the smallest latency whose
# cumulative count satisfies cum·100 ≥ n·k — so both engines compare
# exact integers and ties are impossible.
# ---------------------------------------------------------------------------


def _orders_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min("l_shipdate").alias("first_ship"))
    )
    lat = (
        load(spark, sf_dir, "orders")
        .join(first_ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate"))
            .cast("int").alias("lat_days"),
        )
    )
    hist = lat.groupBy("o_orderpriority", "lat_days").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = (
        Window.partitionBy("o_orderpriority").orderBy("lat_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = Window.partitionBy("o_orderpriority")
    cum = hist.select(
        "o_orderpriority", "lat_days",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(g).alias("n"),
    )

    def _pct(k: int) -> Column:
        return F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * k, F.col("lat_days"))
        ).cast("int")

    return cum.groupBy("o_orderpriority").agg(
        F.max("cum").cast("long").alias("n_orders"),
        _pct(50).alias("p50_days"),
        _pct(90).alias("p90_days"),
        _pct(99).alias("p99_days"),
        F.max("lat_days").cast("int").alias("max_days"),
    )


_FULFILLMENT_SQL = """
WITH first_ship AS (
  SELECT l_orderkey, MIN(l_shipdate) AS first_ship FROM lineitem GROUP BY 1
), lat AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(first_ship AS DATE)) AS INT) AS lat_days
  FROM orders JOIN first_ship ON o_orderkey = l_orderkey
), hist AS (
  SELECT o_orderpriority, lat_days, CAST(COUNT(*) AS BIGINT) AS c
  FROM lat GROUP BY 1, 2
), cum AS (
  SELECT o_orderpriority, lat_days,
         SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY lat_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER (PARTITION BY o_orderpriority) AS n
  FROM hist
)
SELECT o_orderpriority,
       CAST(MAX(cum) AS BIGINT) AS n_orders,
       CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN lat_days END) AS INT)
         AS p50_days,
       CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN lat_days END) AS INT)
         AS p90_days,
       CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN lat_days END) AS INT)
         AS p99_days,
       CAST(MAX(lat_days) AS INT) AS max_days
FROM cum GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Autocorrelation of the hourly arrival series per event type at lags
# 1h and 24h — the seasonality probe behind the seasonal-naive model's
# lag choices. The hourly rollup is the only fact-table pass (shared
# via a lazy localCheckpoint); each lag is a broadcast self-join of
# that bounded series shifted by the lag, and the Pearson correlation
# is the exact-integer moment pattern (DECIMAL(38,0) numerators, one
# floored double division per (type, lag)). Pairs exist only where
# BOTH hours are present — gaps contribute nothing rather than fake
# zeros, matching how the gap-filled grid treats missing hours as
# explicit.
# ---------------------------------------------------------------------------


def _events_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        load_events(spark, sf_dir)
        .groupBy("event_type", F.expr(f"ts_us div {_US_PER_HOUR}").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .localCheckpoint(eager=False)
    )
    pairs = None
    for lag in (1, 24):
        shifted = hourly.select(
            F.col("event_type").alias("et2"),
            (F.col("h") + F.lit(lag)).alias("h2"),
            F.col("x").alias("y"),
        )
        p = hourly.join(
            F.broadcast(shifted),
            (F.col("event_type") == F.col("et2")) & (F.col("h") == F.col("h2")),
        ).select("event_type", F.lit(lag).alias("lag"), "x", "y")
        pairs = p if pairs is None else pairs.unionByName(p)
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )
    return agg.select(
        "event_type", "lag", "n_pairs",
        F.expr(
            "cast(floor(cast(CAST(n_pairs AS DECIMAL(38,0)) * sxy"
            "                - CAST(sx AS DECIMAL(38,0)) * sy as double)"
            " / nullif(sqrt(cast(CAST(n_pairs AS DECIMAL(38,0)) * sxx"
            "                    - CAST(sx AS DECIMAL(38,0)) * sx"
            "                    as double))"
            "          * sqrt(cast(CAST(n_pairs AS DECIMAL(38,0)) * syy"
            "                      - CAST(sy AS DECIMAL(38,0)) * sy"
            "                      as double)), 0.0d)"
            " * 1000000.0d) as bigint)"
        ).alias("acf_micro"),
    )


_HOURLY_AUTOCORR_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, 1 AS lag, a.x AS x, b.x AS y
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.h = b.h + 1
  UNION ALL
  SELECT a.event_type, 24 AS lag, a.x AS x, b.x AS y
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.h = b.h + 24
), agg AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS INT) AS lag, n_pairs,
       CAST(floor(CAST(CAST(n_pairs AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / nullif(sqrt(CAST(CAST(n_pairs AS HUGEINT) * sxx
                                     - CAST(sx AS HUGEINT) * sx
                                     AS DOUBLE))
                           * sqrt(CAST(CAST(n_pairs AS HUGEINT) * syy
                                       - CAST(sy AS HUGEINT) * sy
                                       AS DOUBLE)), 0.0)
                  * 1000000.0) AS BIGINT) AS acf_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# One-way ANOVA of extended price across return flags, computed per
# line status — "does the return flag explain price variance?" as a
# single fact-table hash-agg. Both sums of squares are exact-integer
# micro terms: ssb = Σ_g ⌊10⁶·S_g²/n_g⌋ − ⌊10⁶·S²/N⌋ (128-bit div on
# non-negative values, identical in both engines), ssw = 10⁶·Q − the
# same Σ_g term, and the F statistic is one div/mod 128-bit quotient
# of (ssb·(N−k), ssw·(k−1)). No window, no second scan — the group
# frame is k rows per status.
# ---------------------------------------------------------------------------


def _lineitem_returnflag_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_returnflag", cents("l_extendedprice").alias("x")
    )
    grp = li.groupBy("l_linestatus", "l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("s_g"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("q_g"),
    )
    # ⌊10⁶·S_g²/n_g⌋ via the div/mod decomposition (Spark's decimal
    # `div` yields BIGINT, and the undecomposed quotient overflows it):
    # floor(a·10⁶/n) = floor(a/n)·10⁶ + floor((a mod n)·10⁶/n), exact.
    _between = (
        "CAST((CAST(s_g AS DECIMAL(38,0)) * s_g) div n_g"
        "      AS DECIMAL(38,0)) * 1000000"
        " + ((CAST(s_g AS DECIMAL(38,0)) * s_g) % n_g) * 1000000 div n_g"
    )
    _total = (
        "CAST((CAST(s AS DECIMAL(38,0)) * s) div n_rows"
        "      AS DECIMAL(38,0)) * 1000000"
        " + ((CAST(s AS DECIMAL(38,0)) * s) % n_rows) * 1000000 div n_rows"
    )
    agg = grp.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n_rows"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(F.expr(_between)).cast("decimal(38,0)").alias("sum_between"),
    )
    return agg.select(
        "l_linestatus", "n_rows", "k_groups",
        F.expr(
            f"greatest(sum_between - ({_total}),"
            " CAST(0 AS DECIMAL(38,0)))"
        ).cast("decimal(38,0)").alias("ssb_micro"),
        F.expr("q * 1000000 - sum_between")
        .cast("decimal(38,0)").alias("ssw_micro"),
    ).select(
        # Final schema is decimal-free (contract.py): the >64-bit exact
        # sums are emitted as STRING — digit-for-digit identical across
        # Spark DECIMAL(38,0) and DuckDB HUGEINT, unlike the decimal
        # wire representations the driver's hasher canonicalizes
        # differently.
        "l_linestatus", "n_rows", "k_groups",
        F.col("ssb_micro").cast("string").alias("ssb_micro"),
        F.col("ssw_micro").cast("string").alias("ssw_micro"),
        F.expr(
            "CASE WHEN ssw_micro = 0 OR k_groups < 2 THEN NULL ELSE"
            " cast((ssb_micro * (n_rows - k_groups) * 1000000)"
            "        div (ssw_micro * (k_groups - 1)) as bigint)"
            " END"
        ).alias("f_micro"),
    )


_ANOVA_SQL = """
WITH grp AS (
  SELECT l_linestatus, l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS s_g,
         SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS q_g
  FROM lineitem GROUP BY 1, 2
), agg AS (
  SELECT l_linestatus,
         CAST(COUNT(*) AS BIGINT) AS k_groups,
         CAST(SUM(n_g) AS BIGINT) AS n_rows,
         CAST(SUM(s_g) AS BIGINT) AS s,
         SUM(q_g) AS q,
         SUM((CAST(s_g AS HUGEINT) * s_g * 1000000) // n_g) AS sum_between
  FROM grp GROUP BY 1
), terms AS (
  SELECT l_linestatus, n_rows, k_groups,
         greatest(sum_between
                  - (CAST(s AS HUGEINT) * s * 1000000) // n_rows,
                  CAST(0 AS HUGEINT)) AS ssb_micro,
         q * 1000000 - sum_between AS ssw_micro
  FROM agg
)
SELECT l_linestatus, n_rows, k_groups,
       CAST(ssb_micro AS VARCHAR) AS ssb_micro,
       CAST(ssw_micro AS VARCHAR) AS ssw_micro,
       CASE WHEN ssw_micro = 0 OR k_groups < 2 THEN NULL ELSE
         CAST((ssb_micro * (n_rows - k_groups) * 1000000)
              // (ssw_micro * (k_groups - 1)) AS BIGINT)
       END AS f_micro
FROM terms
"""


# ---------------------------------------------------------------------------
# Discrete survival analysis: the customer-churn hazard table. A
# customer "churns" when their last order sits more than GAP months
# before the observation end; their observed span is months from first
# to last order (event) or to the observation end (censored — they
# count in the at-risk denominator of every month they survived, but
# never as a churn event, the Kaplan-Meier discipline). Hazard at
# month m = churners with span m ÷ customers at risk ≥ m, floored to
# micro. Shape: one orders scan → customer-grain agg → 1-row broadcast
# observation end → (span, churned) histogram; the reverse-cumulative
# at-risk window runs over the CALENDAR-bounded month table (~80 rows
# at any data scale — constant, not data-grown).
# ---------------------------------------------------------------------------

_CHURN_GAP_MONTHS = 6


def _customers_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "year(to_date(o_orderdate)) * 12 + month(to_date(o_orderdate))"
        ).cast("int").alias("m"),
    )
    cust = o.groupBy("o_custkey").agg(
        F.min("m").alias("t0"), F.max("m").alias("t1")
    )
    end = o.agg(F.max("m").alias("obs_end"))
    lab = cust.crossJoin(F.broadcast(end)).select(
        (F.col("obs_end") - F.col("t1") > _CHURN_GAP_MONTHS)
        .cast("int").alias("churned"),
        F.when(
            F.col("obs_end") - F.col("t1") > _CHURN_GAP_MONTHS,
            F.col("t1") - F.col("t0"),
        ).otherwise(F.col("obs_end") - F.col("t0"))
        .cast("int").alias("span"),
    )
    hist = lab.groupBy("span").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("churned").cast("long").alias("n_churned"),
    )
    w = (
        Window.orderBy(F.desc("span"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return hist.select(
        F.col("span").alias("month"),
        F.sum("n_total").over(w).cast("long").alias("n_at_risk"),
        "n_churned",
    ).select(
        "month", "n_at_risk", "n_churned",
        F.expr("(1000000 * n_churned) div n_at_risk").alias("hazard_micro"),
    )


_CHURN_HAZARD_SQL = f"""
WITH o AS (
  SELECT o_custkey,
         CAST(year(CAST(o_orderdate AS DATE)) * 12
              + month(CAST(o_orderdate AS DATE)) AS INT) AS m
  FROM orders
), cust AS (
  SELECT o_custkey, MIN(m) AS t0, MAX(m) AS t1 FROM o GROUP BY 1
), e AS (SELECT MAX(m) AS obs_end FROM o),
lab AS (
  SELECT CAST(e.obs_end - t1 > {_CHURN_GAP_MONTHS} AS INT) AS churned,
         CAST(CASE WHEN e.obs_end - t1 > {_CHURN_GAP_MONTHS}
                   THEN t1 - t0 ELSE e.obs_end - t0 END AS INT) AS span
  FROM cust CROSS JOIN e
), hist AS (
  SELECT span, CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(churned) AS BIGINT) AS n_churned
  FROM lab GROUP BY 1
)
SELECT span AS month,
       CAST(SUM(n_total) OVER (ORDER BY span DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_at_risk,
       n_churned,
       CAST((1000000 * n_churned) // SUM(n_total) OVER (ORDER BY span DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS hazard_micro
FROM hist
"""


# ---------------------------------------------------------------------------
# Two-window Poisson rate-shift test per event type: did the arrival
# rate change between the first and second half of the observation
# span? The conditional test (Przyborowski & Wilenski 1940): given
# n1+n2 events over equal-length windows, n1 ~ Binomial(n, 1/2) under
# H0, z = (n1 − n2)/√(n1+n2). Exact counts + one identical-shape
# double — the streaming-drift monitor's batch sibling for RATES
# (KS covers value distributions). One scan, one broadcast 1-row
# midpoint, one type-keyed hash-agg.
# ---------------------------------------------------------------------------


def _events_rate_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("event_type", "ts_us")
    # Integer floor division for the midpoint: cast((min+max)/2 as
    # long) TRUNCATES in Spark but the double→BIGINT cast ROUNDS in
    # DuckDB, so an odd min+max would shift the boundary by 1 µs
    # cross-engine; div/`//` agree on the non-negative epochs.
    mid = ev.agg(
        F.expr("(min(ts_us) + max(ts_us)) div 2").cast("long")
        .alias("mid_us")
    )
    agg = ev.crossJoin(F.broadcast(mid)).groupBy("event_type").agg(
        F.sum((F.col("ts_us") < F.col("mid_us")).cast("long"))
        .cast("long").alias("n1"),
        F.sum((F.col("ts_us") >= F.col("mid_us")).cast("long"))
        .cast("long").alias("n2"),
    )
    return agg.select(
        "event_type", "n1", "n2",
        F.expr("CASE WHEN n1 + n2 > 0 THEN cast(round("
               "1000 * (n1 - n2) / sqrt(cast(n1 + n2 as double))"
               ") as bigint) END").alias("z_milli"),
        F.expr("CASE WHEN n2 > 0 THEN (1000 * n1) div n2 END")
        .cast("long").alias("rate_ratio_milli"),
    )


_RATE_SHIFT_SQL = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS ts_us FROM events
), mid AS (
  SELECT CAST((MIN(ts_us) + MAX(ts_us)) // 2 AS BIGINT) AS mid_us FROM ev
), agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN ts_us < mid_us THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(SUM(CASE WHEN ts_us >= mid_us THEN 1 ELSE 0 END) AS BIGINT)
           AS n2
  FROM ev CROSS JOIN mid GROUP BY 1
)
SELECT event_type, n1, n2,
       CASE WHEN n1 + n2 > 0 THEN CAST(round(
         1000 * (n1 - n2) / sqrt(CAST(n1 + n2 AS DOUBLE))
       ) AS BIGINT) END AS z_milli,
       CASE WHEN n2 > 0 THEN CAST((1000 * n1) // n2 AS BIGINT) END
         AS rate_ratio_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# Mann–Whitney U (Wilcoxon rank-sum) between two customer segments on
# order value — the nonparametric two-sample location test (KS tests
# the whole distribution, ANOVA assumes normality; rank-sum is the
# robust middle). Exact integers throughout the rank algebra: ranks
# come from the CENTS-VALUE HISTOGRAM (never a row-grain sort) with
# the tied-block average rank DOUBLED so it stays integer (2·avgrank =
# 2·cum_before + t + 1), the running count via the range-partitioned
# cumsum (functions/ranks.py — no single-partition window), and the
# tie-correction Σ(t³−t) in DECIMAL(38,0)/HUGEINT. Only the final
# z-score is one identical-shape double expression.
# ---------------------------------------------------------------------------

_MW_SEG_A = "AUTOMOBILE"
_MW_SEG_B = "FURNITURE"


def _orders_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_validator_github_spark.functions.ranks import (
        global_row_number,
    )

    j = (
        load(spark, sf_dir, "orders")
        .join(F.broadcast(load(spark, sf_dir, "customer")),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_mktsegment").isin(_MW_SEG_A, _MW_SEG_B))
        .select(
            cents("o_totalprice").alias("v"),
            (F.col("c_mktsegment") == _MW_SEG_A).cast("long").alias("a"),
        )
    )
    hist = j.groupBy("v").agg(
        F.sum("a").cast("long").alias("n1_v"),
        F.sum(F.lit(1) - F.col("a")).cast("long").alias("n2_v"),
    ).withColumn("t", F.col("n1_v") + F.col("n2_v"))
    ranked = global_row_number(
        hist, order_cols=["v"], rank_col="__rn", cumsum={"cum_t": "t"}
    )
    agg = ranked.agg(
        F.sum("n1_v").cast("long").alias("n1"),
        F.sum("n2_v").cast("long").alias("n2"),
        # R1 doubled: Σ n1_v · (2·(cum_t − t) + t + 1). This is O(N²)
        # in the filtered row count, so accumulate in DECIMAL(38,0) —
        # a BIGINT sum overflows past ~3×10⁹ rows while DuckDB's
        # HUGEINT side keeps going, a silent cross-engine divergence.
        F.sum(F.expr(
            "CAST(n1_v AS DECIMAL(38,0)) * (2 * (cum_t - t) + t + 1)"
        )).alias("r1_x2"),
        F.sum(F.expr(
            "CAST(t AS DECIMAL(38,0)) * t * t - t"
        )).alias("tie_cubes"),
    )
    # Final schema is decimal-free (contract.py): the >64-bit exact
    # sums go out as STRING digits, identical across Spark decimal and
    # DuckDB HUGEINT. The z numerator is computed exactly in decimal
    # first, then cast to double ONCE (both engines round-to-nearest
    # on that single conversion). Zero-variance guard: if every value
    # ties (one histogram row) the tie correction drives σ to 0 and
    # the z expression would be 0/0 — return NULL, like the runs test.
    _var_term = (
        "(n1 + n2 + 1) - cast(tie_cubes as double) / "
        "(1.0 * (n1 + n2) * (n1 + n2 - 1))"
    )
    return agg.select(
        "n1", "n2",
        F.expr(
            "CAST(r1_x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS STRING)"
        ).alias("u1_x2"),
        F.col("tie_cubes").cast("string").alias("tie_cubes"),
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 3 "
            f"OR {_var_term} <= 0 THEN NULL ELSE "
            "cast(round(1000 * "
            "cast(r1_x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) "
            "     - CAST(n1 AS DECIMAL(38,0)) * n2 as double) / "
            f"(2 * sqrt((1.0 * n1 * n2 / 12) * ({_var_term})))"
            ") as bigint) END"
        ).alias("z_milli"),
    )


_MANN_WHITNEY_SQL = f"""
WITH j AS (
  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN c.c_mktsegment = '{_MW_SEG_A}' THEN 1 ELSE 0 END AS a
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{_MW_SEG_A}', '{_MW_SEG_B}')
), hist AS (
  SELECT v, CAST(SUM(a) AS BIGINT) AS n1_v,
         CAST(SUM(1 - a) AS BIGINT) AS n2_v,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM j GROUP BY 1
), ranked AS (
  SELECT *, SUM(t) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_t
  FROM hist
), agg AS (
  SELECT CAST(SUM(n1_v) AS BIGINT) AS n1,
         CAST(SUM(n2_v) AS BIGINT) AS n2,
         SUM(CAST(n1_v AS HUGEINT) * (2 * (cum_t - t) + t + 1)) AS r1_x2,
         SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_cubes
  FROM ranked
)
SELECT n1, n2,
       CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS VARCHAR) AS u1_x2,
       CAST(tie_cubes AS VARCHAR) AS tie_cubes,
       CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 3
            OR (n1 + n2 + 1) - CAST(tie_cubes AS DOUBLE) /
               (1.0 * (n1 + n2) * (n1 + n2 - 1)) <= 0 THEN NULL ELSE
       CAST(round(1000 *
         CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1)
              - CAST(n1 AS HUGEINT) * n2 AS DOUBLE) /
         (2 * sqrt((1.0 * n1 * n2 / 12) *
          ((n1 + n2 + 1) - CAST(tie_cubes AS DOUBLE) /
           (1.0 * (n1 + n2) * (n1 + n2 - 1)))))
       ) AS BIGINT) END AS z_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test on the daily order-count series: is the
# above/below-median sign sequence random, or does demand trend/cycle?
# Exact integers end-to-end (median = value-at-rank, runs via lag over
# the CALENDAR-bounded day table — ~2400 rows at any data scale), then
# one identical-shape double expression for the z-score. Days exactly
# at the median are excluded from the sign sequence (the standard
# discrete-data treatment). Public method: Wald & Wolfowitz 1940.
# ---------------------------------------------------------------------------


def _orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ranked = daily.crossJoin(F.broadcast(n_days)).withColumn(
        "rn", F.row_number().over(Window.orderBy("cnt", "d"))
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(n_days + 1) div 2")
    ).select(F.col("cnt").alias("med"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("cnt") != F.col("med"))
        .select("d", (F.col("cnt") > F.col("med")).cast("int").alias("s"))
    )
    seq = signs.withColumn(
        "chg",
        (F.col("s") != F.coalesce(
            F.lag("s").over(Window.orderBy("d")), F.col("s")
        )).cast("long"),
    )
    agg = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_seq"),
        F.coalesce(F.sum("s"), F.lit(0)).cast("long").alias("n1"),
        F.coalesce(F.sum(F.lit(1) - F.col("s")), F.lit(0)).cast("long")
        .alias("n2"),
        (F.coalesce(F.sum("chg"), F.lit(0))
         + (F.count(F.lit(1)) > 0).cast("long")).cast("long")
        .alias("n_runs"),
    )
    # z is undefined for a one-sided or near-empty sequence (σ = 0) —
    # NULL in both engines instead of an ANSI divide-by-zero.
    return agg.select(
        "n_seq", "n1", "n2", "n_runs",
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 3 THEN NULL ELSE "
            "cast(round(1000 * "
            "(n_runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2))) / "
            "sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) / "
            "((cast(n1 + n2 as double) * (n1 + n2)) * (n1 + n2 - 1)))"
            ") as bigint) END"
        ).alias("z_milli"),
    )


_RUNS_TEST_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt, d) AS rn FROM daily
), med AS (
  SELECT r.cnt AS med FROM ranked r CROSS JOIN n
  WHERE r.rn = (n.n_days + 1) // 2
), signs AS (
  SELECT d, CAST(cnt > med AS INT) AS s
  FROM daily CROSS JOIN med WHERE cnt <> med
), seq AS (
  SELECT s, CAST(s <> COALESCE(lag(s) OVER (ORDER BY d), s) AS BIGINT)
           AS chg
  FROM signs
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_seq,
         CAST(COALESCE(SUM(s), 0) AS BIGINT) AS n1,
         CAST(COALESCE(SUM(1 - s), 0) AS BIGINT) AS n2,
         CAST(COALESCE(SUM(chg), 0)
              + CASE WHEN COUNT(*) > 0 THEN 1 ELSE 0 END AS BIGINT)
           AS n_runs
  FROM seq
)
SELECT n_seq, n1, n2, n_runs,
       CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 3 THEN NULL ELSE
       CAST(round(1000 *
         (n_runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2))) /
         sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) /
              ((CAST(n1 + n2 AS DOUBLE) * (n1 + n2)) * (n1 + n2 - 1)))
       ) AS BIGINT) END AS z_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# Market-basket association between customer segment and order
# priority: support / confidence / lift per (segment → priority) rule.
# Counts are exact; lift is ONE identical-shape double expression
# (integer products would overflow BIGINT at 100 TB row counts, so
# both engines compute the same floored double instead). Shape: one
# broadcast dim join + three hash-aggs of the same fact scan, all
# key-bounded (≤ segments × priorities rows).
# ---------------------------------------------------------------------------


def _segment_priority_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = (
        load(spark, sf_dir, "orders")
        .join(F.broadcast(load(spark, sf_dir, "customer")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("seg"),
                F.col("o_orderpriority").alias("pri"))
    )
    both = j.groupBy("seg", "pri").agg(
        F.count(F.lit(1)).cast("long").alias("n_both"))
    nseg = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_seg"))
    npri = j.groupBy("pri").agg(
        F.count(F.lit(1)).cast("long").alias("n_pri"))
    tot = j.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    return (
        both.join(F.broadcast(nseg), "seg")
        .join(F.broadcast(npri), "pri")
        .crossJoin(F.broadcast(tot))
        .select(
            "seg", "pri", "n_both", "n_seg", "n_pri", "nn",
            F.expr("(1000000 * n_both) div nn").alias("support_micro"),
            F.expr("(1000000 * n_both) div n_seg").alias("conf_micro"),
            F.expr(
                "cast(floor((1000000.0 * n_both * nn) / "
                "(cast(n_seg as double) * n_pri)) as bigint)"
            ).alias("lift_micro"),
        )
    )


_SEGMENT_LIFT_SQL = """
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), b AS (
  SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS n_both
  FROM j GROUP BY 1, 2
), s AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_seg FROM j GROUP BY 1
), p AS (
  SELECT pri, CAST(COUNT(*) AS BIGINT) AS n_pri FROM j GROUP BY 1
), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM j)
SELECT b.seg, b.pri, b.n_both, s.n_seg, p.n_pri, t.nn,
       CAST((1000000 * b.n_both) // t.nn AS BIGINT) AS support_micro,
       CAST((1000000 * b.n_both) // s.n_seg AS BIGINT) AS conf_micro,
       CAST(floor((1000000.0 * b.n_both * t.nn) /
                  (CAST(s.n_seg AS DOUBLE) * p.n_pri)) AS BIGINT)
         AS lift_micro
FROM b JOIN s USING (seg) JOIN p USING (pri) CROSS JOIN t
"""


RELATIONAL_EXTRA_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("events_rate_shift", _events_rate_shift, _RATE_SHIFT_SQL,
              "Two-window Poisson rate-shift test per event type "
              "(conditional binomial z): the rate sibling of the KS "
              "value-drift monitor — one scan, broadcast midpoint, "
              "type-keyed hash-agg."),
        Query("orders_mann_whitney", _orders_mann_whitney,
              _MANN_WHITNEY_SQL,
              "Mann–Whitney rank-sum between two customer segments on "
              "order value: tie-averaged ranks doubled to stay exact "
              "integers, histogram-grain cumsum through the range-"
              "partitioned ranks helper (no row-grain sort), "
              "DECIMAL(38,0) tie correction, one double z."),
        Query("orders_runs_test", _orders_runs_test, _RUNS_TEST_SQL,
              "Wald–Wolfowitz runs test on daily order counts: exact "
              "value-at-rank median, lag-counted runs over the "
              "calendar-bounded day table, one identical-shape double "
              "z-score — the demand-randomness check."),
        Query("customers_segment_priority_lift", _segment_priority_lift,
              _SEGMENT_LIFT_SQL,
              "Association rules segment → priority: exact support/"
              "confidence counts + floored-double lift, three "
              "key-bounded hash-aggs over one broadcast-dim join."),
        Query("orders_zorder_cells", _zorder_cells, _zorder_sql(),
              "Morton-key cell census over orders: the exact-integer "
              "bit interleave behind the Z-order layout writer, "
              "cross-engine pinned."),
        Query("events_retention", _events_retention, _RETENTION_SQL,
              "Weekly cohort-retention triangle: distinct active users "
              "per (first-event-week cohort, week offset)."),
        Query("events_transitions", _events_transitions, _TRANSITIONS_SQL,
              "Event-type transition matrix: consecutive-pair counts per "
              "user stream + exact milli-probabilities."),
        Query("events_hourly_trend", _events_trend, _TREND_SQL,
              "Per-type OLS slope over the hourly series in exact "
              "integers (rebased x, n·Σxy−Σx·Σy over n·Σx²−(Σx)²); "
              "milli-quotient via floor on the identical double."),
        Query("events_winsorized_stats", _events_winsorized, _WINSOR_SQL,
              "Rank-exact winsorized statistics per event type: p05/p95 "
              "cents cutoffs via value-at-ceil-rank, clamp counts and "
              "exact winsorized mean — one exchange, cutoffs broadcast "
              "back."),
        Query("events_hourly_gapfill", _events_gapfill, _GAPFILL_SQL,
              "Time-series regularization: dense per-type hourly grid "
              "with explicit gaps and forward-filled last value — "
              "post-rollup work bounded by calendar span, not events."),
        Query("events_sliding_windows", _events_sliding_windows,
              _SLIDING_SQL,
              "Native 2h/1h sliding windows with the manual ×2 fan-out "
              "as the oracle — proves the operator's window-assignment "
              "arithmetic."),
        Query("events_session_windows", _events_session_windows,
              _SESSION_WINDOW_SQL,
              "Native F.session_window sessionization with the "
              "lag/cumsum islands formulation as the oracle — hash "
              "equality is an equivalence proof between the two."),
        Query("events_lag_features", _events_lag_features,
              _LAG_FEATURES_SQL,
              "Lag/rolling ML features over the dense gap-filled grid: "
              "lag-1h/lag-24h and a 3-row rolling sum whose row frames "
              "ARE calendar semantics because every hour is present."),
        Query("events_hourly_anomalies", _events_anomalies, _ANOMALIES_SQL,
              "Hourly volume anomalies per event type: the 2-sigma rule "
              "multiplied out to exact integers ((N*n - S)^2 > "
              "4*(N*Q - S^2)) — bit-identical cross-engine, no float "
              "stats."),
        Query("orders_table_profile", _table_profile_q,
              _table_profile_sql(),
              "Per-column data profile of orders (nulls, exact "
              "distincts, typed min/max) — the validator primitive "
              "under schema/quality drift; one pass, Expand shape for "
              "exact multi-distinct."),
        Query("events_ewma", _events_ewma, _EWMA_SQL,
              "Truncated (depth-8, decay 1/2) EWMA over the gap-filled "
              "hourly grid in exact integers — power-of-two weights, "
              "one shared window spec, no exchange beyond the grid's."),
        Query("nation_trade_pagerank", _trade_pagerank, _PAGERANK_SQL,
              "Two unrolled PageRank iterations over the nation trade "
              "graph: one-pass edge build, then broadcast-join "
              "iterations on <= N^2 rows — integer-exact damping."),
        Query("orders_merge_upsert", _orders_merge_upsert, _MERGE_SQL,
              "MERGE-INTO semantics (matched update/delete, unmatched "
              "insert) applied via ONE full-outer hash join + map-side "
              "CASE routing — the batch CDC-apply primitive."),
        Query("basket_part_pairs", _basket_part_pairs, _BASKET_SQL,
              "Market-basket pair census with exact-milli lift: "
              "in-codegen upper-triangle array comprehension per order "
              "vs the relational self-join oracle — a cross-"
              "formulation equivalence proof."),
        Query("basket_pair_triangles", _basket_triangles, _TRIANGLES_SQL,
              "Per-node triangle counts on the co-purchase graph: "
              "id-oriented wedge join closed against the checkpointed "
              "edge list — each triangle found exactly once."),
        Query("customers_rfm_segments", _customers_rfm, _RFM_SQL,
              "RFM quintile segmentation over the customer aggregate — "
              "explicit floor-arithmetic quintiles from tie-broken "
              "row_number (ntile conventions differ across engines)."),
        Query("brand_supplier_hhi", _brand_hhi, _HHI_SQL,
              "Herfindahl market-concentration index per brand in "
              "integer basis points: one fact pass, shares floored to "
              "bp before squaring."),
        Query("part_name_fuzzy_matches", _part_fuzzy_matches, _FUZZY_SQL,
              "Record linkage: bigram-blocked levenshtein≤2 fuzzy join "
              "over distinct part names — provably lossless blocking "
              "(len≥6), brute-force oracle certifies no false "
              "negatives."),
        Query("orders_benford_digits", _benford_digits, _benford_sql(),
              "Benford first-digit audit over exact cents: one fact "
              "pass → 9-row hash-agg; expected log10 shares inlined as "
              "Python-evaluated integer-milli literals (libm-safe)."),
        Query("lineitem_skew_report", _skew_report, _skew_sql(),
              "Join-key skew audit: per fact key, rows / distincts / "
              "top-1 share in ppm via max(struct) argmax — two "
              "hash-aggs, no window over the fact table."),
        Query("orders_chi2_independence", _chi2_priority_status, _CHI2_SQL,
              "Chi-square independence audit (priority × status): "
              "exact-integer per-cell micro terms, floor-then-sum; one "
              "fact pass, margins broadcast back."),
        Query("customers_abc_classes", _customers_abc, _ABC_SQL,
              "Pareto/ABC revenue classification: exact cents cumsum "
              "vs total·threshold products (division-free), over the "
              "customer aggregate."),
        Query("customers_k_anonymity", _k_anonymity, _K_ANON_SQL,
              "k-anonymity audit over the (nation, segment) "
              "quasi-identifiers: group-size histogram with the "
              "at-risk population below k=5 — one hash-agg plus a "
              "group-count-sized rollup."),
        Query("warehouse_universe_sample", _universe_sample,
              _UNIVERSE_SAMPLE_SQL,
              "Consistent-universe downsample: ~10% of customers by "
              "key hash, their orders/lineitems via semi-joins — a "
              "referentially-closed miniature warehouse; per-table "
              "before/after counts + sampled revenue."),
        Query("events_cusum_changepoint", _events_cusum, _CUSUM_SQL,
              "CUSUM change-point per hourly series: n-scaled integer "
              "cumulative deviations, |CUSUM| argmax via max(struct) — "
              "one rollup, one bounded window pass, no second scan."),
        Query("events_attribution", _events_attribution, _ATTRIBUTION_SQL,
              "Last-touch attribution: purchases joined to the most "
              "recent same-user click within 1h via the carry-forward "
              "window (one user_id shuffle, linear pass — never the "
              "per-purchase inequality join)."),
        Query("star_schema_fk_audit", _fk_audit, _fk_audit_sql(),
              "Referential-integrity audit over every FK edge of the "
              "star schema: orphan counts + ppm share via LEFT ANTI "
              "joins against key-only parent projections — the "
              "constraint check a lakehouse doesn't enforce."),
        Query("events_variant_props", _variant_props, _VARIANT_SQL,
              "Schema-on-read over the events JSON props via Spark 4's "
              "VARIANT (parse_json → typed variant_get; missing paths "
              "NULL, not errors) — map-only extraction, one hash-agg."),
        Query("nation_trade_reachability", _trade_reachability, _REACH_SQL,
              "Transitive closure via native WITH RECURSIVE (Spark 4): "
              "min-hop distances on the ≥$9.5M trade graph, depth ≤ 4; "
              "recursion iterates on the edge-sized frontier, the fact "
              "table is scanned once."),
        Query("customers_revenue_gini", _customers_gini, _GINI_SQL,
              "Gini inequality of customer revenue per market segment "
              "in exact micro-units: segment-partitioned rank window "
              "over the customer aggregate, 128-bit numerator."),
        Query("events_mad_outliers", _events_mad_outliers, _MAD_SQL,
              "Robust outliers per event type via rank-exact median + "
              "MAD (value-at-row-number, never percentile_cont); flag "
              "when |x−med| > 3·MAD, all integer cents."),
        Query("events_seasonal_naive", _events_seasonal_naive,
              _SEASONAL_SQL,
              "Seasonal-naive forecast scorecard: hourly rollup + two "
              "calendar self-joins (h−1, h−24), exact MASE-style milli "
              "ratio of absolute-error sums."),
        Query("orders_backlog_timeline", _orders_backlog, _BACKLOG_SQL,
              "Open-order backlog by month: ±1 interval events from "
              "order open / last-ship close, cumulative sum over "
              "the bounded month axis."),
        Query("part_metrics_unpivot", _part_unpivot, _UNPIVOT_SQL,
              "Wide→long reshape through DataFrame.unpivot / SQL "
              "UNPIVOT (zero-shuffle Expand) with a per-(brand, "
              "metric) rollup on the long form."),
        Query("lineitem_grouping_sets", _lineitem_grouping_sets,
              _GROUPING_SETS_SQL,
              "Explicit GROUPING SETS with per-column GROUPING() "
              "flags (DataFrame.groupingSets, Spark 4) — hand-picked "
              "subtotal combinations in one Expand pass."),
        Query("customers_percentile_ranks", _customers_percentile_ranks,
              _PERCENTILE_RANKS_SQL,
              "percent_rank/cume_dist as exact floored milli ratios "
              "from integer rank+count windows, segment-partitioned."),
        Query("customers_order_streaks", _customers_order_streaks,
              _STREAKS_SQL,
              "Gaps & islands: consecutive-month order streaks per "
              "customer via the month_index − row_number island key."),
        Query("events_user_deciles", _events_user_deciles,
              _USER_DECILES_SQL,
              "Exact LTV deciles via floor arithmetic on row_number "
              "(ntile is not cross-engine-stable); window over the "
              "user aggregate."),
        Query("part_price_size_skyline", _part_skyline, _SKYLINE_SQL,
              "2-D skyline / Pareto frontier on (lower price, larger "
              "size): dominance via two exact window maxima on the "
              "sorted price axis — no n² pair test."),
        Query("lineitem_exact_quartiles", _lineitem_exact_quartiles,
              _QUARTILES_SQL,
              "Exact global quartiles of the fact table via "
              "range-partitioned ranks (functions/ranks.py) — value at "
              "rank ceil(n·k/4), no single-task sort."),
        Query("events_ks_drift", _events_ks_drift, _KS_DRIFT_SQL,
              "Two-sample Kolmogorov–Smirnov drift statistic between "
              "stream halves, exact on the cents grid: "
              "range-partitioned cumulative counts, one shared-"
              "denominator 128-bit division after the max."),
        Query("customers_cohort_ltv", _customers_cohort_ltv,
              _COHORT_LTV_SQL,
              "Cohort LTV triangle: first-order-month cohorts × month "
              "offset with cumulative revenue — window over the "
              "calendar-bounded aggregate only."),
        Query("customers_order_gaps", _customers_order_gaps,
              _ORDER_GAPS_SQL,
              "Purchase-cadence histogram: per-customer inter-order "
              "gaps via a customer-partitioned lag window, bucketed "
              "to weeks."),
        Query("supplier_part_degrees", _supplier_part_degrees,
              _DEGREE_SQL,
              "Bipartite degree census of the supplier↔part graph: "
              "two-level hash-aggs over one shared distinct-edge "
              "frame — the skew report read before join planning."),
        Query("lineitem_discount_elasticity", _lineitem_discount_elasticity,
              _ELASTICITY_SQL,
              "OLS discount→quantity slope per return flag in exact "
              "integers, sign-split 128-bit div/mod quotient — "
              "regression as a single hash-agg."),
        Query("orders_seasonality_index", _orders_seasonality,
              _SEASONALITY_SQL,
              "Month-of-year revenue seasonality index vs a uniform "
              "month (micro-units), 12-row aggregate + one 128-bit "
              "division per row."),
        Query("events_hourly_ks_drift", _events_hourly_ks_drift,
              _HOURLY_KS_SQL,
              "Per-hour KS drift vs the corpus-wide value "
              "distribution — the batch scorecard of the streaming "
              "drift monitor, sharing functions/stats.py's "
              "exact-integer KS core."),
        Query("events_peak_hour", _events_peak_hour, _PEAK_HOUR_SQL,
              "Per-type peak hour-of-day via max_by/arg_max with the "
              "tie-break encoded into the BIGINT ordering key — the "
              "argmax aggregate, no per-group sort."),
        Query("customers_balance_corr", _customers_balance_corr,
              _BALANCE_CORR_SQL,
              "Exact-integer Pearson correlation (balance vs revenue) "
              "per segment: DECIMAL(38,0) moment numerators, one "
              "floored double division per segment."),
        Query("events_burstiness", _events_burstiness, _BURSTINESS_SQL,
              "Fano factor of hourly arrivals per event type "
              "(Var/Mean, 1e6 ≈ Poisson): two hash-aggs + a 128-bit "
              "div/mod per type."),
        Query("orders_fulfillment_latency", _orders_fulfillment_latency,
              _FULFILLMENT_SQL,
              "Order→first-shipment latency percentiles per priority "
              "from the (priority, days) histogram — windows over the "
              "bounded grid only, never a rank over raw orders."),
        Query("events_hourly_autocorr", _events_hourly_autocorr,
              _HOURLY_AUTOCORR_SQL,
              "Hourly-arrival autocorrelation at lags 1h/24h per event "
              "type: one fact-table rollup, broadcast shifted "
              "self-joins, exact-integer Pearson moments."),
        Query("lineitem_returnflag_anova", _lineitem_returnflag_anova,
              _ANOVA_SQL,
              "One-way ANOVA of price across return flags per line "
              "status: exact-integer between/within sums of squares "
              "from a single hash-agg, 128-bit F quotient."),
        Query("customers_churn_hazard", _customers_churn_hazard,
              _CHURN_HAZARD_SQL,
              "Discrete churn-hazard table (Kaplan-Meier discipline): "
              "censored customers stay in the at-risk denominator, "
              "reverse-cumulative window over the calendar-bounded "
              "month histogram only."),
    ]
}
