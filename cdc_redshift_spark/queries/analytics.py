"""Relational analytics queries over the star schema with SQL oracles.

These widen the engine's operator surface beyond the reference's CDC
core (the reference delegates all relational work to Redshift —
SURVEY §2.5/§2.6): aggregations, multi-way joins (broadcast +
shuffle), windows, top-k, rollup, pivot, set ops, semi/anti joins.

Determinism rules for oracle parity:
- every float aggregate is rounded identically on both sides;
- every top-k has a total-order tiebreak;
- timestamps compared as dates or epoch values (UTC both sides).

Scale notes: dims (region/nation/supplier/part/customer) are
broadcast-joined (`F.broadcast`); fact-fact joins shuffle on the join
key and rely on AQE for skew; aggregates use partial map-side combine
by construction (groupBy on built-in aggregate functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_redshift_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → groupBy → 8 aggregates.

    Single shuffle on (returnflag, linestatus); partial aggregation
    map-side. Filter + column pruning push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                      AS sum_qty,
       round(sum(l_extendedprice), 2)                                 AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)              AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6)                                      AS avg_qty,
       round(avg(l_extendedprice), 6)                                 AS avg_price,
       round(avg(l_discount), 6)                                      AS avg_disc,
       count(*)                                                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join (1 broadcast + 1 shuffle) → agg → top-10.

    customer is a dim → broadcast; orders⋈lineitem shuffles on
    orderkey. Top-k uses TakeOrderedAndProject (no global sort).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


ORACLE_Q3 = """
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-way join; all dims broadcast, facts shuffle once."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


ORACLE_Q5 = """
SELECT n_name, r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
ORDER BY revenue DESC, n_name
"""


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (k=3) by window rank — the reference's W1 pattern
    generalized from k=1 (glue_pg_redshift_cdc.py:134-136)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "rk", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


ORACLE_TOP_CUST = """
SELECT n_name, rk, c_custkey, round(c_acctbal, 2) AS acctbal
FROM (
  SELECT n_name, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rk <= 3
"""


def q_orders_running_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame composite (round-6 registry fold of
    running_order_totals + moving_revenue_30d, identical function
    coverage): per customer order, the cumulative ROWS-frame running
    total and row_number sequence PLUS the trailing-30-day RANGE-frame
    revenue — a true value-range frame whose equal-timestamp peers are
    frame-mates, so ties stay deterministic without a tiebreak.  Three
    window specs over ONE partitioning: Spark evaluates them with a
    single shuffle on o_custkey (plan-pinned in
    tests/test_plan_quality.py)."""
    orders = load_table(spark, sf_dir, "orders")
    us_30d = 30 * 86400 * 1_000_000
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-us_30d, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_rows), 2).alias("running_total"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("rev_30d"),
        F.count(F.lit(1)).over(w_range).alias("n_30d"),
    )


ORACLE_RUNNING_WINDOWS = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER wr, 2) AS running_total,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq,
       round(sum(o_totalprice) OVER wv, 2) AS rev_30d,
       count(*) OVER wv AS n_30d
FROM orders
WINDOW wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wv AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
              RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
"""


def q_order_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot + boolean-aggregate composite (round-6 registry fold of
    order_priority_pivot + order_flags_summary, identical function
    coverage): per priority, the status pivot counts (df.pivot with an
    explicit value list) joined with the conditional/boolean aggregate
    family — count_if, bool_and, bool_or."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )
    big = F.col("o_totalprice") > 100000
    flags = orders.groupBy("o_orderpriority").agg(
        F.count_if(big).alias("n_big"),
        F.bool_and(big).alias("all_big"),
        F.bool_or(big).alias("any_big"),
    )
    return piv.join(flags, "o_orderpriority").orderBy("o_orderpriority")


ORACLE_PRIORITY_PROFILE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
       count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       bool_and(o_totalprice > 100000) AS all_big,
       bool_or(o_totalprice > 100000) AS any_big
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_customer_activity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join + set-operation composite (round-6 registry fold
    of semi_anti_join + set_ops, identical function coverage): every
    customer labeled by left_semi/left_anti against big orders (the
    reference's delete-matching join J1, glue_docdb_redshift_cdc.py:183,
    as native joins) and by intersect/exceptAll 1995-vs-1996 activity
    (NULL for customers in neither year)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    with_big = cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("has_big").alias("segment"))
    without = cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", F.lit("no_big").alias("segment"))
    segments = with_big.unionByName(without)

    y = F.year(F.col("o_orderdate"))
    c95 = orders.filter(y == 1995).select("o_custkey").distinct()
    c96 = orders.filter(y == 1996).select("o_custkey").distinct()
    both = c95.intersect(c96).select(
        "o_custkey", F.lit("both").alias("activity")
    )
    only95 = c95.exceptAll(c96).select(
        "o_custkey", F.lit("only_1995").alias("activity")
    )
    activity = both.unionByName(only95)

    return segments.join(
        activity, segments.c_custkey == activity.o_custkey, "left"
    ).select("c_custkey", "segment", "activity")


ORACLE_ACTIVITY_SEGMENTS = """
WITH seg AS (
  SELECT c_custkey, 'has_big' AS segment FROM customer
  WHERE EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 300000)
  UNION ALL
  SELECT c_custkey, 'no_big' FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 300000)
), c95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
   c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
   act AS (
  SELECT o_custkey, 'both' AS activity
  FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
  UNION ALL
  SELECT o_custkey, 'only_1995'
  FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
)
SELECT s.c_custkey, s.segment, a.activity
FROM seg s LEFT JOIN act a ON s.c_custkey = a.o_custkey
"""


def q_events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type aggregate composite (round-6 registry fold of
    events_funnel + events_extreme_by + events_value_quantiles,
    identical function coverage): counts, distinct users, value sums
    and extremes, min_by/max_by extreme-event ids (the primitive the
    LWW merge is built on, tie-broken through the composite ordering
    struct so both engines pick identically), and exact interpolated
    percentiles (Spark `percentile` and DuckDB `quantile_cont` share
    the linear-interpolation definition)."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.9D))")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.max_by(
                "event_id", F.struct(F.col("value"), F.col("event_id"))
            ).alias("max_value_event"),
            F.min_by(
                "event_id", F.struct(F.col("value"), F.col("event_id"))
            ).alias("min_value_event"),
            pct.alias("p"),
        )
        .select(
            "event_type",
            "n_events",
            "n_users",
            "total_value",
            "min_value",
            "max_value",
            "max_value_event",
            "min_value_event",
            F.round(F.element_at("p", 1), 6).alias("p25"),
            F.round(F.element_at("p", 2), 6).alias("p50"),
            F.round(F.element_at("p", 3), 6).alias("p75"),
            F.round(F.element_at("p", 4), 6).alias("p90"),
        )
        .orderBy("event_type")
    )


ORACLE_TYPE_STATS = """
WITH r AS (
  SELECT event_type, event_id, value, user_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id DESC) AS rmax,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rmin
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS total_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value,
       max(CASE WHEN rmax = 1 THEN event_id END) AS max_value_event,
       max(CASE WHEN rmin = 1 THEN event_id END) AS min_value_event,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.9), 6)  AS p90
FROM r GROUP BY event_type ORDER BY event_type
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative sum (30-minute gap rule).

    Pure window composition — no state store needed for the batch
    variant; the streaming variant is
    :func:`cdc_redshift_spark.streaming.stateful.streaming_sessionize`
    (``F.session_window`` + watermark, append mode).
    """
    ev = load_table(spark, sf_dir, "events")
    gap_ns = 30 * 60 * 1_000_000_000  # 30 min in nanos
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts_ns").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | ((F.col("ts_ns") - F.col("prev_ts")) > gap_ns),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("user_id", "session_id")
    )


ORACLE_SESSIONIZE = """
WITH t AS (
  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
         lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_ts
  FROM events
), s AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts_ns - prev_ts > 1800000000000::BIGINT THEN 1 ELSE 0 END AS new_sess
  FROM t
), g AS (
  SELECT user_id, event_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM s
)
SELECT user_id, session_id, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def q4_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS decorrelated to a left-semi join — count
    1996-H2 orders with at least one returned line item, per priority.

    (The testdata lineitem has no commit/receipt dates, so the EXISTS
    predicate uses l_returnflag = 'R'.)  The semi-join shuffles on
    orderkey; the date filter pushes into the orders scan.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + scalar aggregate — the pushdown
    showcase (all four predicates and both referenced columns reach the
    parquet scan; tests/test_plan_quality.py pins PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: broadcast dim join + conditional aggregation —
    share of September-1996 revenue from PROMO parts."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            100 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_pct"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )


ORACLE_Q14 = """
SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


def q_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE multi-dimensional aggregate — all 4 grouping combinations
    of (returnflag, linestatus) in one Expand pass.  Round-6 registry
    fold: absorbs rollup_sales (ROLLUP's grouping sets are a strict
    subset of CUBE's, and both measures — sum_qty and sum_price — now
    ride the same pass; the asymmetric GROUPING SETS SQL surface stays
    separate in grouping_sets_sales)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction over the events props column (the
    reference's P4 `get_json_object` pattern applied analytically):
    distribution of the embedded integer by event_type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            F.count_distinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


ORACLE_PROPS = """
SELECT event_type, count(*) AS n,
       min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
            AS BIGINT) AS sum_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER))
         AS n_distinct_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders through the explicit skew-salted join
    (operators/joins.py): the fact side spreads each orderkey across 8
    salt buckets, orders replicate 8×.  The oracle is the PLAIN join —
    proving salting changes physical distribution only, never results.
    """
    from cdc_redshift_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, on=["l_orderkey"], factor=8,
                    discriminator="l_linenumber")
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_SALTED = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-ordered funnel (view → click → purchase): a user converts a
    stage only if their FIRST event of that stage happens strictly
    after the first event of the previous stage — sequential pattern
    analytics the plain per-type counts (`events_type_stats`) cannot see.
    One shuffle: per-user conditional min-aggregates, then a global
    roll-up."""
    ev = load_table(spark, sf_dir, "events")
    first = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts_ns"))
    )
    per_user = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & F.col("t_click").isNotNull() & (
        F.col("t_click") > F.col("t_view")
    )
    purchased = clicked & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_click")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("long")).alias("n_viewed"),
        F.sum(clicked.cast("long")).alias("n_view_click"),
        F.sum(purchased.cast("long")).alias("n_full_funnel"),
    )


ORACLE_FUNNEL_ORDERED = """
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_viewed,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                      AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_click,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                      AND t_click > t_view AND t_purchase IS NOT NULL
                      AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_funnel
FROM u
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bidirectional trade volume between two nations by
    ship year — 4 joins (2 broadcast dims), one fact-fact shuffle."""
    n1, n2 = "NATION_18", "NATION_19"
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # pre-filter each dim to the two nations of interest BEFORE the
    # fact joins: the cross-side pair disjunction below can only be
    # evaluated after the last join (Catalyst can't CNF-split it), but
    # single-side isin filters prune the broadcasts ~12x and let the
    # fact joins drop non-participating rows at the earliest point
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).filter(F.col("cust_nation").isin(n1, n2)).select("c_custkey", "cust_nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).filter(F.col("supp_nation").isin(n1, n2)).select("s_suppkey", "supp_nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == n1) & (F.col("cust_nation") == n2)
    ) | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


ORACLE_Q7 = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
   OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18')
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, ship_year
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue from returned items
    in one quarter — join + agg + TakeOrderedAndProject.

    Revenue aggregates EXACT integer cents (each item's amount rounded
    to cents first — a single product of the same doubles on both
    engines — then summed as BIGINT): float sums of hundreds of items
    are summation-order-sensitive, and a one-cent divergence at the
    2-dp boundary was observed at sf0.01 with the naive round(sum).
    Integer sums are order-independent, so ranking and values are
    engine-exact."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(cents).alias("rev_cents"))
        .select(
            "c_custkey",
            "c_name",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            "rev_cents",
        )
        .orderBy(F.desc("rev_cents"), F.asc("c_custkey"))
        .limit(20)
        .drop("rev_cents")
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
         / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name
ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
           DESC, c_custkey ASC
LIMIT 20
"""


def q_orders_cheapest_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface — Catalyst
    decorrelates it into an aggregate + join; exercises spark.sql on
    registered views rather than the DataFrame API."""
    from cdc_redshift_spark.sources.tables import load_table as _lt

    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
        FROM orders_v o
        WHERE o_totalprice = (SELECT min(i.o_totalprice)
                              FROM orders_v i
                              WHERE i.o_custkey = o.o_custkey)
        """
    )


ORACLE_CHEAPEST = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
FROM orders o
WHERE o_totalprice = (SELECT min(i.o_totalprice)
                      FROM orders i
                      WHERE i.o_custkey = o.o_custkey)
"""


def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload via Spark 4's native VARIANT type — the
    engine-side analogue of Redshift SUPER (SURVEY §1.1): props parsed
    once with try_parse_json (NULL on malformed input, matching the
    oracle's extraction semantics), typed try_variant_get, then
    a decile histogram of the embedded integer."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    # floor division on BOTH engines (Spark `div` truncates toward zero,
    # DuckDB `//` floors — they diverge on negative k, see PARITY.md)
    return (
        ev.select(k.alias("k"))
        .groupBy(F.floor(F.col("k") / 10).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("bucket")
    )


ORACLE_PROPS_VARIANT = """
WITH t AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events
)
SELECT k // 10 AS bucket, count(*) AS n, min(k) AS min_k, max(k) AS max_k
FROM t GROUP BY 1 ORDER BY bucket
"""


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profile of the orders table
    (operators/profile.py): per column, rows / nulls / exact distinct."""
    from cdc_redshift_spark.operators.profile import profile

    orders = load_table(spark, sf_dir, "orders")
    return profile(orders)


ORACLE_PROFILE = """
SELECT col AS column, (SELECT count(*) FROM orders) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(n_distinct AS BIGINT) AS n_distinct
FROM (
  SELECT 'o_orderkey' AS col,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_nulls,
         count(DISTINCT o_orderkey) AS n_distinct FROM orders
  UNION ALL
  SELECT 'o_custkey',
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
         count(DISTINCT o_custkey) FROM orders
  UNION ALL
  SELECT 'o_orderstatus',
         sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
         count(DISTINCT o_orderstatus) FROM orders
  UNION ALL
  SELECT 'o_totalprice',
         sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
         count(DISTINCT o_totalprice) FROM orders
  UNION ALL
  SELECT 'o_orderdate',
         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),
         count(DISTINCT o_orderdate) FROM orders
  UNION ALL
  SELECT 'o_orderpriority',
         sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
         count(DISTINCT o_orderpriority) FROM orders
)
"""


def q_lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via df.unpivot (MELT): the four price-model
    measures as (metric, value) rows, then per-metric stats."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="v",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("v"), 4).alias("min_v"),
            F.round(F.max("v"), 4).alias("max_v"),
            F.round(F.avg("v"), 4).alias("avg_v"),
        )
        .orderBy("metric")
    )


ORACLE_UNPIVOT = """
WITH long AS (
  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT metric, count(*) AS n,
       round(min(v), 4) AS min_v, round(max(v), 4) AS max_v,
       round(avg(v), 4) AS avg_v
FROM long GROUP BY metric ORDER BY metric
"""


def q_text_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of the tokenized corpus → global top-20 words
    (count desc, word asc tiebreak) — the explode/aggregate shape of
    every vocabulary build."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


ORACLE_TOP_WORDS = r"""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      FROM documents)
GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
"""


def q_emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions JVM-side over the embedding column
    (aggregate / array_min / array_max — no Python): per label, norm
    and element-range statistics."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(d, F.lit(0.0), lambda s, x: s + x * x))
    return (
        emb.select(
            "label",
            norm.alias("nrm"),
            F.array_min(d).alias("mn"),
            F.array_max(d).alias("mx"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("mn"), 6).alias("min_elem"),
            F.round(F.max("mx"), 6).alias("max_elem"),
        )
        .orderBy("label")
    )


ORACLE_EMB_NORM = """
WITH v AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
                                      x -> x::DOUBLE * x::DOUBLE))) AS nrm,
         list_min(list_transform(embedding, x -> x::DOUBLE)) AS mn,
         list_max(list_transform(embedding, x -> x::DOUBLE)) AS mx
  FROM embeddings
)
SELECT label, count(*) AS n_vectors,
       round(avg(nrm), 6) AS avg_norm,
       round(min(mn), 6) AS min_elem,
       round(max(mx), 6) AS max_elem
FROM v GROUP BY label ORDER BY label
"""


def q_emb_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift: per label, the cosine between the MEAN
    VECTORS of the early and late half of the id range — the
    modality counterpart of `dq_drift_psi` (a representation shift a
    value-space histogram can't see: the centroid moves while every
    marginal stays put).  The split is the exact integer vec_id
    midpoint, same discipline as the PSI epoch split.

    Scale shape: posexplode fans each vector into dim rows, but the
    (label, half, pos) partial aggregation combines map-side, so the
    shuffle carries |labels|·2·dim rows regardless of input size;
    the pivot and the cosine reduce |labels|·dim → |labels| rows.
    No window, no join against the wide input.

    Cross-engine float discipline: per-dimension means are double
    aggregations over identical inputs (same class as
    emb_norm_stats's avg_norm, driver-green r6); the cosine compounds
    ~1e-15 reassociation differences, 9 orders below the 6-dp
    rounding.  A label empty on either half yields NULL cosine in
    both engines (null propagation, no special case)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bounds = emb.agg(
        F.min("vec_id").alias("__mn"), F.max("vec_id").alias("__mx")
    )
    split = emb.crossJoin(F.broadcast(bounds)).select(
        "label",
        "embedding",
        F.expr("vec_id <= (__mn + __mx) div 2").alias("__is_ref"),
    )
    per_dim = (
        split.select(
            "label",
            "__is_ref",
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("pos", "x"),
        )
        .groupBy("label", "pos")
        .agg(
            F.avg(F.when(F.col("__is_ref"), F.col("x"))).alias("m_ref"),
            F.avg(F.when(~F.col("__is_ref"), F.col("x"))).alias("m_cur"),
        )
    )
    counts = split.groupBy("label").agg(
        F.sum(F.when(F.col("__is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(~F.col("__is_ref"), 1).otherwise(0)).alias("n_cur"),
    )
    # shared back half (operators/quality.emb_drift_score): the
    # streaming face (cdc_stream_emb_drift) scores its maintained
    # state through the IDENTICAL expressions
    from cdc_redshift_spark.operators.quality import emb_drift_score

    return emb_drift_score(per_dim, counts).orderBy("label")


def _oracle_emb_drift() -> str:
    # one source of truth for the fixture dimension (TESTDATA.md)
    from cdc_redshift_spark.queries.similarity import DIM

    return ORACLE_EMB_DRIFT_TMPL.format(dim=DIM)


ORACLE_EMB_DRIFT_TMPL = """
WITH bounds AS (
  SELECT min(vec_id) AS mn, max(vec_id) AS mx FROM embeddings
), split AS (
  SELECT label, embedding, vec_id <= (mn + mx) // 2 AS is_ref
  FROM embeddings, bounds
), per_dim AS (
  SELECT label, g.pos,
         avg(CASE WHEN is_ref THEN embedding[g.pos]::DOUBLE END) AS m_ref,
         avg(CASE WHEN NOT is_ref THEN embedding[g.pos]::DOUBLE END) AS m_cur
  FROM split
  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS pos) g
  GROUP BY 1, 2
), counts AS (
  SELECT label,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur
  FROM split GROUP BY label
), cos AS (
  SELECT label,
         round(sum(m_ref * m_cur)
               / (sqrt(sum(m_ref * m_ref)) * sqrt(sum(m_cur * m_cur))),
               6) AS mean_cosine
  FROM per_dim GROUP BY label
)
SELECT CAST(counts.label AS BIGINT) AS label,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       mean_cosine
FROM counts JOIN cos ON counts.label = cos.label
ORDER BY label
"""


def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total line quantity clears a
    threshold (aggregate → HAVING-style filter → join back) — the
    large-volume-customer shape.  Quantities are integer-valued
    doubles, so sums are exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


ORACLE_Q18 = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       round(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


def q_grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (the asymmetric
    grouping ROLLUP/CUBE can't express), plus grouping_id to label the
    aggregation level."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping_id() AS gid,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        ORDER BY gid, l_returnflag, l_linestatus
        """
    )


ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CASE WHEN l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL THEN 0
            WHEN l_returnflag IS NOT NULL THEN 1
            ELSE 2 END AS gid,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                        (l_returnflag, l_linestatus))
ORDER BY gid, l_returnflag, l_linestatus
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first active day
    (cohort), counted on each later active day as a day offset — the
    self-derived cohort join every product-analytics stack runs.  Two
    shuffles (per-user min, then cohort×offset count-distinct)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


ORACLE_RETENTION = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT cohort_day, (day - cohort_day) AS day_offset,
       count(DISTINCT d.user_id) AS n_users
FROM days d JOIN cohort c ON d.user_id = c.user_id
GROUP BY 1, 2 ORDER BY cohort_day, day_offset
"""


def q_orders_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue: window (lag) OVER an aggregate — revenue
    in exact integer cents so the growth delta is engine-exact."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    yearly = orders.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.sum(cents).alias("rev_cents"), F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy("yr")
    return yearly.select(
        "yr",
        (F.col("rev_cents") / 100.0).alias("revenue"),
        "n_orders",
        ((F.col("rev_cents") - F.lag("rev_cents").over(w)) / 100.0).alias(
            "yoy_delta"
        ),
    ).orderBy("yr")


ORACLE_YOY = """
WITH y AS (
  SELECT year(o_orderdate) AS yr,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_cents,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT yr, rev_cents / 100.0 AS revenue, n_orders,
       (rev_cents - lag(rev_cents) OVER (ORDER BY yr)) / 100.0 AS yoy_delta
FROM y ORDER BY yr
"""


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>): order rows with an injected
    nullable status (NULLIF of 'O') joined to a status dim where NULL
    is a REAL key — plain equality would drop every NULL row, the
    null-safe operator matches them.  The oracle uses
    IS NOT DISTINCT FROM, SQL's spelling of the same operator."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif("o_orderstatus", F.lit("O")).alias("st")
    )
    dim = spark.createDataFrame(
        [("F", "finished"), ("P", "pending"), (None, "open")],
        "st string, st_name string",
    )
    return (
        orders.join(F.broadcast(dim), orders.st.eqNullSafe(dim.st), "left")
        .groupBy("st_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("st_name")
    )


ORACLE_NULL_SAFE = """
WITH o AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st FROM orders
), dim(st, st_name) AS (
  VALUES ('F', 'finished'), ('P', 'pending'), (NULL, 'open')
)
SELECT d.st_name, count(*) AS n_orders
FROM o LEFT JOIN dim d ON o.st IS NOT DISTINCT FROM d.st
GROUP BY d.st_name ORDER BY d.st_name
"""


def q_supplier_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic rank family beyond row_number: percent_rank, dense_rank
    and ntile quartiles of supplier balances within each nation."""
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).alias("quartile"),
    )


ORACLE_SUPPLIER_RANKS = """
SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS acctbal,
       dense_rank() OVER w AS drank,
       round(percent_rank() OVER w, 6) AS prank,
       ntile(4) OVER w AS quartile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey
             ORDER BY s_acctbal DESC, s_suppkey ASC)
"""


def q_events_weekday_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap — calendar-function coverage
    with exact integer cells.  (Spark's dayofweek is 1-based Sunday=1;
    the oracle shifts DuckDB's 0-based dow to match.)"""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hod")
    )


ORACLE_HEATMAP = """
SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
       count(*) AS n, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2 ORDER BY dow, hod
"""


def q_customer_name_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function composite (round-6 registry fold of
    name_edit_distance + name_key_consistency, identical function
    coverage): per levenshtein(name, digit-translated name) distance —
    the fuzzy-matching primitive behind entity resolution — row counts
    plus the regexp_extract key-consistency rule (the numeric suffix
    embedded in each name must equal the key; violations surface as
    n_key_mismatch > 0 on either engine)."""
    cust = load_table(spark, sf_dir, "customer")
    variant = F.translate("c_name", "0123456789", "OIZEASGTBP")
    extracted = F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint")
    return (
        cust.select(
            F.levenshtein("c_name", variant).alias("dist"),
            extracted.alias("x"),
            F.col("c_custkey"),
        )
        .groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("x") == F.col("c_custkey")).alias("n_key_match"),
            F.count_if(
                F.col("x").isNull() | (F.col("x") != F.col("c_custkey"))
            ).alias("n_key_mismatch"),
        )
        .orderBy("dist")
    )


ORACLE_NAME_PROFILE = r"""
WITH t AS (
  SELECT levenshtein(c_name,
                     translate(c_name, '0123456789', 'OIZEASGTBP')) AS dist,
         TRY_CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS x,
         c_custkey
  FROM customer
)
SELECT dist, count(*) AS n,
       count(*) FILTER (WHERE x = c_custkey) AS n_key_match,
       count(*) FILTER (WHERE x IS NULL OR x <> c_custkey) AS n_key_mismatch
FROM t GROUP BY dist ORDER BY dist
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide reshape via ``groupBy().pivot()`` (the inverse of
    `lineitem_unpivot`): per-user event counts as one row per user
    with a column per event type.  The pivot values
    are EXPLICIT literals — with them, Spark plans ONE aggregate pass
    (conditional aggregation) instead of a distinct-scan plus a
    second pass, which is the difference between one and two
    full-table reads at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot emits the type names as columns; null = user never did it
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return out.select(*cols).orderBy("user_id")


ORACLE_PIVOT = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_orders_bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join (operators/joins.bloom_prefilter):
    lineitem revenue restricted to URGENT 1996-H2 orders, where the
    fact side is first shrunk by a broadcast Bloom BITMAP evaluated
    inside its scan (k codegen probes per row, zero shuffle, zero
    join) and only the survivors reach the exact semi join — the
    runtime-filter pattern for a dimension whose key SET outgrows a
    broadcast hash relation (~2.25 B/key as bits vs 8+ B/key as a
    relation).  No false negatives by construction; false positives
    die in the exact join — which is exactly what the plain semi-join
    oracle certifies.  Money rides as exact integer cents."""
    from cdc_redshift_spark.operators.joins import bloom_prefilter

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    pre = bloom_prefilter(
        li.withColumnRenamed("l_orderkey", "k"), orders.select(
            F.col("o_orderkey").alias("k")
        ), "k",
    )
    # no .distinct() on the build side: left_semi is insensitive to
    # right-side duplicates, and the dedup would add an exchange
    hits = pre.join(
        orders.select(F.col("o_orderkey").alias("k")), "k", "left_semi"
    )
    return hits.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("cents_revenue"),
    ).orderBy("l_returnflag")


ORACLE_BLOOM_SEMI = """
WITH o AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS cents_revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM o)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (Recency / Frequency / Monetary) customer segmentation —
    the classic lifecycle-marketing report: per user, days since last
    event (vs the corpus max ts, so the query is deterministic),
    event count, and total value in exact cents; each metric
    quartile-scored against exact interpolated quartile CUT POINTS
    and concatenated into the familiar "RFM" segment code.

    Scale (the round-7 `weak` fix): the previous shape ran three
    unpartitioned ``ntile(4)`` windows — three GLOBAL single-partition
    sorts over the per-user frame, the classic scale-killer at a
    billion users.  Now the cut points come from ONE aggregation pass
    (three ``percentile`` arrays — the ``equi_depth_bounds`` plan,
    operators/layout.py:411, kept in-query so no driver collect), are
    broadcast as a 1-row frame, and bins are assigned by pure codegen
    comparisons.  Zero windows, zero global sorts; the only exchange
    left is the per-user groupBy.

    Deterministic tie rule (mirrored verbatim in the oracle): for the
    ascending metric (recency) ``bin = 1 + #(bounds <= value)`` — a
    value equal to a cut point lands ABOVE it (the
    ``equi_depth_histogram`` rule); for descending metrics
    (freq, cents, where quartile 1 = best) ``bin = 1 +
    #(bounds >= value)`` — a value equal to a cut point lands in the
    LOWER-scored bin.  Ties therefore share a bin (quantile-cut
    semantics) instead of being split arbitrarily across bins the way
    ``ntile`` splits them; bounds are bit-identical cross-engine
    (Spark exact ``percentile`` ≡ DuckDB ``quantile_cont``, both
    linear interpolation over sorted doubles — certified round 7)."""
    ev = load_table(spark, sf_dir, "events")
    # localCheckpoint: the per-user frame feeds THREE consumers (the
    # global-max scalar, the quartile-bounds aggregate, the scored
    # output) — without materialization each one re-expands the
    # lineage and re-scans the heavy events table (4 scans measured).
    # The checkpointed frame is the SMALL side (users << events), the
    # same discipline as dedup_q's thrice-read edge list.
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts_ns").alias("last_ns"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .localCheckpoint(eager=True)
    )
    maxns = per_user.agg(F.max("last_ns").alias("m"))
    base = per_user.crossJoin(F.broadcast(maxns)).select(
        "user_id",
        F.expr("(m - last_ns) div 86400000000000").alias("recency_days"),
        "freq",
        "cents",
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    bounds = base.agg(
        F.percentile(F.col("recency_days"), qs).alias("rb"),
        F.percentile(F.col("freq"), qs).alias("fb"),
        F.percentile(F.col("cents"), qs).alias("mb"),
    )

    def asc_bin(bcol: str, vcol: str):
        return F.size(
            F.filter(F.col(bcol), lambda b: b <= F.col(vcol))
        ) + F.lit(1)

    def desc_bin(bcol: str, vcol: str):
        return F.size(
            F.filter(F.col(bcol), lambda b: b >= F.col(vcol))
        ) + F.lit(1)

    return (
        base.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            "recency_days",
            "freq",
            "cents",
            F.concat(
                asc_bin("rb", "recency_days").cast("string"),
                desc_bin("fb", "freq").cast("string"),
                desc_bin("mb", "cents").cast("string"),
            ).alias("rfm"),
        )
        .orderBy("user_id")
    )


ORACLE_RFM = """
WITH pu AS (
  SELECT user_id, max(epoch_ns(ts)) AS last_ns,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY user_id
), mx AS (SELECT max(last_ns) AS m FROM pu),
base AS (
  SELECT user_id, (m - last_ns) // 86400000000000 AS recency_days,
         freq, cents
  FROM pu, mx
), bounds AS (
  SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rb,
         quantile_cont(freq,         [0.25, 0.5, 0.75]) AS fb,
         quantile_cont(cents,        [0.25, 0.5, 0.75]) AS mb
  FROM base
)
SELECT user_id, recency_days, freq, cents,
       CAST(1 + len(list_filter(rb, b -> b <= recency_days)) AS VARCHAR)
       || CAST(1 + len(list_filter(fb, b -> b >= freq)) AS VARCHAR)
       || CAST(1 + len(list_filter(mb, b -> b >= cents)) AS VARCHAR)
         AS rfm
FROM base, bounds
ORDER BY user_id
"""


QUERIES = {
    "events_pivot_types": q_events_pivot_types,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "top_customers_per_nation": q_top_customers_per_nation,
    "orders_running_windows": q_orders_running_windows,
    "order_priority_profile": q_order_priority_profile,
    "customer_activity_segments": q_customer_activity_segments,
    "events_type_stats": q_events_type_stats,
    "events_sessionize": q_events_sessionize,
    "q4_returned_orders": q4_returned_orders,
    "q6_revenue_change": q6_revenue_change,
    "q14_promo_revenue": q14_promo_revenue,
    "cube_sales": q_cube_sales,
    "events_props_extract": q_events_props_extract,
    "salted_join_orders": q_salted_join_orders,
    "orders_bloom_semi_revenue": q_orders_bloom_semi_revenue,
    "events_rfm_segments": q_events_rfm_segments,
    "events_funnel_ordered": q_events_funnel_ordered,
    "q7_nation_volume": q7_nation_volume,
    "q10_returned_revenue": q10_returned_revenue,
    "orders_cheapest_per_cust": q_orders_cheapest_per_cust,
    "events_props_variant": q_events_props_variant,
    "profile_orders": q_profile_orders,
    "lineitem_unpivot": q_lineitem_unpivot,
    "text_top_words": q_text_top_words,
    "emb_norm_stats": q_emb_norm_stats,
    "emb_drift_report": q_emb_drift_report,
    "q18_big_orders": q18_big_orders,
    "grouping_sets_sales": q_grouping_sets_sales,
    "events_retention": q_events_retention,
    "orders_yoy": q_orders_yoy,
    "null_safe_join": q_null_safe_join,
    "supplier_balance_ranks": q_supplier_balance_ranks,
    "events_weekday_heatmap": q_events_weekday_heatmap,
    "customer_name_profile": q_customer_name_profile,
}

ORACLES = {
    "q1_pricing_summary": ORACLE_Q1,
    "q3_shipping_priority": ORACLE_Q3,
    "q5_local_supplier_volume": ORACLE_Q5,
    "top_customers_per_nation": ORACLE_TOP_CUST,
    "orders_running_windows": ORACLE_RUNNING_WINDOWS,
    "order_priority_profile": ORACLE_PRIORITY_PROFILE,
    "customer_activity_segments": ORACLE_ACTIVITY_SEGMENTS,
    "events_type_stats": ORACLE_TYPE_STATS,
    "events_sessionize": ORACLE_SESSIONIZE,
    "q4_returned_orders": ORACLE_Q4,
    "q6_revenue_change": ORACLE_Q6,
    "q14_promo_revenue": ORACLE_Q14,
    "cube_sales": ORACLE_CUBE,
    "events_props_extract": ORACLE_PROPS,
    "salted_join_orders": ORACLE_SALTED,
    "orders_bloom_semi_revenue": ORACLE_BLOOM_SEMI,
    "events_rfm_segments": ORACLE_RFM,
    "events_funnel_ordered": ORACLE_FUNNEL_ORDERED,
    "q7_nation_volume": ORACLE_Q7,
    "q10_returned_revenue": ORACLE_Q10,
    "orders_cheapest_per_cust": ORACLE_CHEAPEST,
    "events_props_variant": ORACLE_PROPS_VARIANT,
    "profile_orders": ORACLE_PROFILE,
    "lineitem_unpivot": ORACLE_UNPIVOT,
    "events_pivot_types": ORACLE_PIVOT,
    "text_top_words": ORACLE_TOP_WORDS,
    "emb_norm_stats": ORACLE_EMB_NORM,
    "emb_drift_report": _oracle_emb_drift(),
    "q18_big_orders": ORACLE_Q18,
    "grouping_sets_sales": ORACLE_GROUPING_SETS,
    "events_retention": ORACLE_RETENTION,
    "orders_yoy": ORACLE_YOY,
    "null_safe_join": ORACLE_NULL_SAFE,
    "supplier_balance_ranks": ORACLE_SUPPLIER_RANKS,
    "events_weekday_heatmap": ORACLE_HEATMAP,
    "customer_name_profile": ORACLE_NAME_PROFILE,
}
