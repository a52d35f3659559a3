"""TPC-H-shaped analytics breadth, adapted to the test star schema.

The reference delegates all analytics to Redshift SQL (SURVEY §0), so
"a user could switch" requires the classic warehouse query shapes to
run natively.  analytics.py carries Q1/3/4/5/6/7/10/14/18-style
queries; this module adds the REMAINING distinct plan shapes from the
TPC-H suite, adapted where the synthetic schema lacks a column or the
partsupp table (each docstring names the adaptation):

- correlated per-group min + equality join-back (Q2)
- two-level nation/region share with conditional aggregation (Q8)
- multi-dim profit rollup over a substring-filtered dim (Q9)
- delay bucketing with conditional counts (Q12)
- left-outer count distribution histogram (Q13)
- aggregate → global max → equality (Q15, exact integer-cents)
- group rollup vs global-fraction threshold (Q11)
- distinct-count group rollup with exclusion filters (Q16)
- correlated avg threshold scan (Q17, exact avg over integer qty)
- disjunctive multi-column predicate pushdown (Q19)
- nested semi-join reduction (Q20)
- multi-exists per-order supplier analysis (Q21, one aggregation
  instead of the textbook double self-join — Spark-first)
- anti join + scalar-subquery threshold (Q22)

Determinism rules: money sums that feed COMPARISONS (max-equality,
thresholds) are computed in exact integer cents×100 units
(``round(price*100)::long * (100 - round(disc*100)::long)``) so both
engines select identical rows; display-only sums follow the q1
double+round discipline.  LIMIT queries carry a unique total sort key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_redshift_spark.sources.tables import load_table


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp_ntz")


def _cents(col: str) -> Column:
    """Exact integer cents from a 2-decimal-intent double column."""
    return F.round(F.col(col) * 100).cast("long")


def _rev_c4() -> Column:
    """Revenue in exact cents×100 units: ep_cents * (100 - disc_pct)."""
    return _cents("l_extendedprice") * (
        F.lit(100) - _cents("l_discount")
    )


#: DuckDB equivalents of the exact-cents forms.
D_REV_C4 = (
    "CAST(round(l_extendedprice*100) AS BIGINT)"
    " * (100 - CAST(round(l_discount*100) AS BIGINT))"
)


def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each size-15 part, the EUROPE supplier(s) with the
    minimum account balance among suppliers that actually shipped it
    (lineitem pairs stand in for the missing partsupp).  Correlated
    per-group min via window + equality filter; dims broadcast.
    """
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    cand = (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_mb", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_mb"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(100)
    )


ORACLE_Q2 = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name
  FROM pairs j
  JOIN part p ON j.l_partkey = p.p_partkey AND p.p_size = 15
  JOIN supplier s ON j.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name FROM (
  SELECT *, min(s_acctbal) OVER (PARTITION BY p_partkey) AS mb FROM cand
) WHERE s_acctbal = mb
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_7 suppliers' share of ASIA customers' revenue
    per order year — double dimension chain (customer→nation→region AND
    supplier→nation) with conditional aggregation.  Share numerator and
    denominator are exact integer cents×100, so the division is
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    c_nat = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    s_nat = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    rows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(c_nat, cust.c_nationkey == F.col("cn_key"))
        .join(region, F.col("cn_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(s_nat, supp.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_c4().alias("rev_c4"),
            F.col("sn_name"),
        )
    )
    return (
        rows.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("sn_name") == "NATION_7", F.col("rev_c4")).otherwise(
                    F.lit(0)
                )
            ).alias("_num"),
            F.sum("rev_c4").alias("_den"),
        )
        .select(
            "o_year",
            F.round(F.col("_num") / F.col("_den"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


ORACLE_Q8 = f"""
SELECT o_year,
       round(CAST(sum(CASE WHEN sn_name = 'NATION_7' THEN rev_c4 ELSE 0 END) AS DOUBLE)
             / sum(rev_c4), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year, {D_REV_C4} AS rev_c4,
         sn.n_name AS sn_name
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
   AND o_orderdate >= TIMESTAMP '1996-01-01'
   AND o_orderdate < TIMESTAMP '1998-01-01'
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
GROUP BY o_year
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier nation per year over parts whose
    name contains 'red' — substring dim filter, 4-way join, two-dim
    rollup.  Cost stands in for the missing ps_supplycost as half the
    part's retail price per unit; profit stays in exact cents×100
    through the aggregation and is only cast out at the edge."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit_c4 = _rev_c4() - (
        _cents("p_retailprice") * F.col("l_quantity").cast("long") * F.lit(50)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit_c4.alias("p_c4"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("p_c4") / 10000.0, 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE_Q9 = f"""
SELECT nation, o_year, round(sum(p_c4) / 10000.0, 2) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         {D_REV_C4}
           - CAST(round(p_retailprice*100) AS BIGINT)
             * CAST(l_quantity AS BIGINT) * 50 AS p_c4
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part inventory value among one nation's suppliers,
    keeping parts above a FRACTION of the global total — group
    aggregate + global-threshold HAVING (scalar subquery).  Value =
    shipped quantity × retail price (lineitem stands in for partsupp);
    the threshold compare runs in exact integer cents
    (``value*1000 > total``), so both engines keep identical parts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    value_c = F.sum(
        F.col("l_quantity").cast("long") * _cents("p_retailprice")
    ).alias("value_c")
    per_part = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_partkey")
        .agg(value_c)
    )
    total = per_part.agg(F.sum("value_c").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("_total"))
        .select(
            "p_partkey",
            F.round(F.col("value_c") / 100.0, 2).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


ORACLE_Q11 = """
WITH per_part AS (
  SELECT p_partkey,
         sum(CAST(l_quantity AS BIGINT)
             * CAST(round(p_retailprice*100) AS BIGINT)) AS value_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
  GROUP BY p_partkey
)
SELECT p_partkey, round(value_c / 100.0, 2) AS value
FROM per_part
WHERE value_c * 1000 > (SELECT sum(value_c) FROM per_part)
ORDER BY value DESC, p_partkey
"""


def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape adapted: the schema has no l_shipmode/l_receiptdate,
    so lines bucket by shipping DELAY (days from order to ship date)
    instead of ship mode — same conditional-count-by-priority plan:
    one join, one shuffle on the bucket."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "1_fast")
        .when(delay <= 90, "2_medium")
        .otherwise("3_slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(bucket.alias("delay_bucket"), high.alias("_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.col("_high").cast("long")).alias("high_line_count"),
            F.sum((~F.col("_high")).cast("long")).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


ORACLE_Q12 = """
SELECT delay_bucket,
       CAST(sum(CASE WHEN high THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN high THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN '1_fast'
              WHEN datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN '2_medium'
              ELSE '3_slow' END AS delay_bucket,
         o_orderpriority IN ('1-URGENT', '2-HIGH') AS high
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
)
GROUP BY delay_bucket
ORDER BY delay_bucket
"""


def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customer × order-count distribution — LEFT OUTER join
    (customers with zero qualifying orders must appear), per-customer
    count, then a histogram over the counts.  Two aggregations, the
    second over an already-tiny frame."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue per supplier over a quarter, then the
    supplier(s) achieving the GLOBAL max — aggregate → max → equality.
    Revenue is exact integer cents×100 so the max-equality selects
    identical rows on both engines (the textbook float version can
    diverge in the last ulp and pick different winners)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_c4()).alias("rev_c4"))
    w = Window.partitionBy()
    top = rev.withColumn("_mx", F.max("rev_c4").over(w)).filter(
        F.col("rev_c4") == F.col("_mx")
    )
    return (
        top.join(supp, top.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_c4") / 10000.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, sum({D_REV_C4}) AS rev_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(rev_c4 / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_c4 = (SELECT max(rev_c4) FROM rev)
ORDER BY s_suppkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: how many distinct suppliers ship each (brand, type,
    size) combination, excluding one brand and restricting sizes —
    distinct-count rollup with IN/<> filters (lineitem pairs stand in
    for the missing partsupp)."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) j
JOIN part ON j.l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_size IN (1, 14, 23, 45)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost to small-quantity orders — per-part
    average-quantity threshold (correlated aggregate, here a window
    over the part key) feeding a row filter.  Quantities are integral
    doubles so the 0.2×avg threshold is bit-identical; the final sum
    is exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            F.round(
                F.sum(_cents("l_extendedprice")) / 100.0 / 7.0, 2
            ).alias("avg_yearly")
        )
    )


ORACLE_Q17 = """
SELECT round(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 / 7.0, 2)
       AS avg_yearly
FROM (
  SELECT l_extendedprice, l_quantity,
         avg(l_quantity) OVER (PARTITION BY p_partkey) AS avg_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
   AND p_brand = 'Brand#3' AND p_type = 'SMALL'
)
WHERE l_quantity < 0.2 * avg_qty
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under a 3-way DISJUNCTION of (brand, size
    range, quantity range) triples — the predicate-pushdown stress
    shape (Catalyst must push the OR into the join and scans rather
    than materialize the cross space)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(_rev_c4()) / 10000.0, 2).alias("revenue")
    )


ORACLE_Q19 = f"""
SELECT round(sum({D_REV_C4}) / 10000.0, 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who shipped more than 300 units of
    red-named parts during 1996 — nested reduction (part filter →
    per-supplier quantity agg → threshold) semi-joined back to the
    supplier dim.  Quantities are integral, so the threshold is exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supp = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 300)
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


ORACLE_Q20 = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 300
)
ORDER BY s_name
"""


def q21_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late shipper in
    multi-supplier finished orders.  The textbook form is a double
    correlated EXISTS/NOT EXISTS self-join on lineitem; Spark-first it
    collapses into ONE per-order aggregation (distinct suppliers,
    distinct late suppliers, the late supplier key) — one shuffle on
    orderkey instead of three lineitem scans."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("_late"))
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("ns"),
            F.count_distinct(
                F.when(F.col("_late"), F.col("l_suppkey"))
            ).alias("nl"),
            F.max(F.when(F.col("_late"), F.col("l_suppkey"))).alias("lk"),
        )
        .filter((F.col("ns") > 1) & (F.col("nl") == 1))
    )
    return (
        per_order.groupBy("lk")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("lk") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


ORACLE_Q21 = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS ns,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl,
         max(CASE WHEN late THEN l_suppkey END) AS lk
  FROM (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
  )
  GROUP BY l_orderkey
  HAVING ns > 1 AND nl = 1
)
JOIN supplier ON lk = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per country-code stats for above-average-balance
    customers with NO orders — scalar-subquery threshold + anti join.
    The schema has no c_phone, so the code is c_custkey % 5, and
    "inactive" means no orders since 2000-01-01 (an unrestricted anti
    join is empty at this SF).  The
    threshold average is computed over exact DECIMAL(18,2) sums cast to
    double, so the boundary rows agree across engines."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "_bal", F.col("c_acctbal").cast("decimal(18,2)")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01")
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0)
    thr = pos.agg(
        (F.sum("_bal").cast("double") / F.count(F.lit(1))).alias("_thr")
    )
    rich = pos.crossJoin(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("_thr")
    )
    inactive = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        inactive.groupBy((F.col("c_custkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("_bal").cast("double"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


ORACLE_Q22 = """
SELECT c_custkey % 5 AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*)
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES = {
    "q2_min_acctbal_supplier": q2_min_acctbal_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_ship_delay": q12_ship_delay,
    "q13_order_count_dist": q13_order_count_dist,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_excess_shipments": q20_excess_shipments,
    "q21_late_supplier": q21_late_supplier,
    "q22_inactive_customers": q22_inactive_customers,
}

ORACLES = {
    "q2_min_acctbal_supplier": ORACLE_Q2,
    "q8_market_share": ORACLE_Q8,
    "q9_product_profit": ORACLE_Q9,
    "q11_important_stock": ORACLE_Q11,
    "q12_ship_delay": ORACLE_Q12,
    "q13_order_count_dist": ORACLE_Q13,
    "q15_top_supplier": ORACLE_Q15,
    "q16_supplier_part_counts": ORACLE_Q16,
    "q17_small_qty_revenue": ORACLE_Q17,
    "q19_disjunctive_revenue": ORACLE_Q19,
    "q20_excess_shipments": ORACLE_Q20,
    "q21_late_supplier": ORACLE_Q21,
    "q22_inactive_customers": ORACLE_Q22,
}
