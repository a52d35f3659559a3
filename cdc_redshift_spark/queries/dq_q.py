"""Data-quality gate queries: the constraint suite a pipeline runs
before promoting a batch (operators/quality.py).

Determinism rules: every metric is a ratio of exact integer counts
carried as doubles (0/1 sums are exact below 2^53, and x/y division of
identical doubles is IEEE-identical across engines); booleans hash as
ints on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.quality import (
    heavy_hitters,
    robust_outliers,
    winsorize,
    Check,
    accepted_values,
    check_suite,
    completeness,
    compliance,
    referential_integrity,
    uniqueness,
)
from cdc_redshift_spark.sources.tables import load_table


def q_dq_orders_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion gate over the orders/lineitem star: key completeness
    and uniqueness, accepted status values, price/quantity bounds
    compliance, and referential integrity into customer and orders —
    three scans total (one per table) + two key-projected RI joins,
    regardless of data size."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    order_checks = check_suite(
        orders,
        [
            Check("orders_key_complete", completeness("o_orderkey"), 1.0, 1.0),
            Check("orders_key_unique", uniqueness("o_orderkey"), 1.0, 1.0),
            Check(
                "orders_status_accepted",
                accepted_values("o_orderstatus", ["F", "O", "P"]),
                1.0,
                1.0,
            ),
            Check(
                "orders_price_positive",
                compliance(F.col("o_totalprice") > 0),
                1.0,
                1.0,
            ),
        ],
    )
    line_checks = check_suite(
        lineitem,
        [
            Check(
                "lineitem_pk_unique",
                uniqueness("l_orderkey", "l_linenumber"),
                1.0,
                1.0,
            ),
            Check(
                "lineitem_qty_in_range",
                compliance(F.col("l_quantity").between(1, 50)),
                1.0,
                1.0,
            ),
            Check(
                "lineitem_discount_in_range",
                compliance(F.col("l_discount").between(0.0, 0.1)),
                0.95,
                1.0,
            ),
        ],
    )
    ri1 = referential_integrity(
        orders, "o_custkey", customer, "c_custkey", name="ri_orders_customer"
    )
    ri2 = referential_integrity(
        lineitem, "l_orderkey", orders, "o_orderkey", name="ri_lineitem_orders"
    )
    return (
        order_checks.unionByName(line_checks)
        .unionByName(ri1)
        .unionByName(ri2)
        .select(
            "check_name", F.round("metric", 6).alias("metric"), "passed"
        )
        .orderBy("check_name")
    )


ORACLE_DQ_ORDERS = """
WITH o AS (
  SELECT
    avg(CASE WHEN o_orderkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS key_complete,
    count(DISTINCT o_orderkey) / count(*) AS key_unique,
    avg(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1.0 ELSE 0.0 END) AS status_ok,
    avg(CASE WHEN o_totalprice > 0 THEN 1.0 ELSE 0.0 END) AS price_pos
  FROM orders
),
l AS (
  SELECT
    count(DISTINCT (l_orderkey, l_linenumber)) / count(*) AS pk_unique,
    avg(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1.0 ELSE 0.0 END) AS qty_ok,
    avg(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1.0 ELSE 0.0 END) AS disc_ok
  FROM lineitem
),
r1 AS (
  SELECT avg(CASE WHEN c.c_custkey IS NULL THEN 1.0 ELSE 0.0 END) AS orphan
  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o_custkey = c.c_custkey
  WHERE o_custkey IS NOT NULL
),
r2 AS (
  SELECT avg(CASE WHEN k.o_orderkey IS NULL THEN 1.0 ELSE 0.0 END) AS orphan
  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) k
    ON l_orderkey = k.o_orderkey
  WHERE l_orderkey IS NOT NULL
)
SELECT check_name, round(metric, 6) AS metric, passed FROM (
  SELECT 'orders_key_complete' AS check_name, key_complete AS metric,
         key_complete = 1.0 AS passed FROM o
  UNION ALL
  SELECT 'orders_key_unique', key_unique, key_unique = 1.0 FROM o
  UNION ALL
  SELECT 'orders_status_accepted', status_ok, status_ok = 1.0 FROM o
  UNION ALL
  SELECT 'orders_price_positive', price_pos, price_pos = 1.0 FROM o
  UNION ALL
  SELECT 'lineitem_pk_unique', pk_unique, pk_unique = 1.0 FROM l
  UNION ALL
  SELECT 'lineitem_qty_in_range', qty_ok, qty_ok = 1.0 FROM l
  UNION ALL
  SELECT 'lineitem_discount_in_range', disc_ok,
         disc_ok >= 0.95 AND disc_ok <= 1.0 FROM l
  UNION ALL
  SELECT 'ri_orders_customer', orphan, orphan <= 0.0 FROM r1
  UNION ALL
  SELECT 'ri_lineitem_orders', orphan, orphan <= 0.0 FROM r2
)
ORDER BY check_name
"""


def q_dq_events_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key planning diagnostic: the 10 heaviest
    (event_type, user_id) keys in events with share and skew factor —
    the report you run before picking a join/partition key (a skew_x
    ≫ 1 key is the salting trigger, operators/joins.py)."""
    from cdc_redshift_spark.operators.quality import key_skew_report

    ev = load_table(spark, sf_dir, "events")
    rep = key_skew_report(ev, ["event_type", "user_id"], top=10)
    return rep.select(
        "event_type",
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.round("share", 9).alias("share"),
        F.round("skew_x", 6).alias("skew_x"),
    )


ORACLE_DQ_SKEW = """
WITH counts AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, user_id
),
stats AS (
  SELECT CAST(sum(n) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS nkeys
  FROM counts
)
SELECT event_type, user_id, n,
       round(n / total, 9) AS share,
       round(n / total * nkeys, 6) AS skew_x
FROM counts, stats
ORDER BY n DESC, event_type, user_id
LIMIT 10
"""


def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters in two bounded passes
    (operators/quality.heavy_hitters): per-partition Misra-Gries
    candidate screen over Arrow (shuffle-free, zero false negatives
    by the k >= 1/min_frac pigeonhole guarantee), then exact counts
    for candidates only.  The oracle is the plain
    GROUP BY ... HAVING over the whole table, so a green row proves
    the screen lost no qualifying key AND admitted no wrong count —
    at 100 TB the groupBy shuffle carries only candidate-key rows
    instead of every row.  Integer threshold math on both engines."""
    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", min_frac=0.005)


ORACLE_HEAVY_HITTERS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY user_id
HAVING count(*) * 200 >= (SELECT count(*) FROM events)
ORDER BY cnt DESC, user_id ASC
"""


def q_dq_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust outlier audit over event values
    (operators/quality.robust_outliers): Hampel's median/MAD rule —
    the mean/stddev z-score masks exactly the rows it exists to find,
    median/MAD has a 50% breakdown point.  ONE hash shuffle on
    user_id; the median and MAD windows share the partitioning, so no
    second exchange.  The oracle mirrors the interpolated percentile
    (DuckDB ``quantile_cont``), both guards (min group size, mad > 0),
    and the unrounded flag comparison; med/mad round to 6 dp for the
    hash discipline."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return robust_outliers(ev, "user_id", "value").orderBy("event_id")


ORACLE_VALUE_OUTLIERS = """
WITH m AS (
  SELECT event_id, user_id, event_type, value,
         quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS med,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), d AS (
  SELECT *, quantile_cont(abs(value - med), 0.5)
              OVER (PARTITION BY user_id) AS mad
  FROM m
)
SELECT event_id, user_id, event_type, value,
       round(med, 6) AS med, round(mad, 6) AS mad,
       CAST(n AS BIGINT) AS group_rows
FROM d
WHERE n >= 8 AND mad > 0.0 AND abs(value - med) > 3.5 * 1.4826 * mad
ORDER BY event_id
"""


def q_dq_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user winsorization of event values
    (operators/quality.winsorize): clamp into the exact interpolated
    [1%, 99%] percentile band per key — the repair complement of
    `dq_value_outliers` (clip the tails instead of flagging them).
    Both bounds evaluate over ONE whole-partition window on user_id
    (single exchange).  The clamp compares UNROUNDED bounds; outputs
    round at 6 dp per the hash discipline."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    return winsorize(ev, "user_id", "value", p=0.01).orderBy("event_id")


ORACLE_VALUE_WINSORIZED = """
WITH b AS (
  SELECT event_id, user_id, value,
         quantile_cont(value, 0.01) OVER (PARTITION BY user_id) AS qlo,
         quantile_cont(value, 0.99) OVER (PARTITION BY user_id) AS qhi
  FROM events
)
SELECT event_id, user_id, value,
       round(qlo, 6) AS lo, round(qhi, 6) AS hi,
       CASE WHEN value IS NULL THEN NULL
            ELSE round(least(greatest(value, qlo), qhi), 6) END AS value_w
FROM b
ORDER BY event_id
"""


def q_dq_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 per event type — the SLA report shape every
    metrics pipeline ships.  ONE aggregation pass (exact interpolated
    `percentile` with an array of ps — no window, no sort); the
    DDSketch variant (`sketch_price_quantiles`) is the
    unbounded-cardinality complement, this is the exact one the
    certified percentile≡quantile_cont parity makes mirrorable."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile(
        F.col("value"), F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.element_at(pct, 1), 6).alias("p50"),
            F.round(F.element_at(pct, 2), 6).alias("p95"),
            F.round(F.element_at(pct, 3), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


ORACLE_LATENCY_PCT = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Population Stability Index between the early and
    late half of the events stream (operators/quality.psi_drift) — the
    drift monitor a feature/training pipeline runs before promoting a
    data window.  The split is exact integer epoch-nanos midpoint; the
    reference half fixes 10 equal-width value bins per type; both
    halves histogram into the shared grid with Laplace smoothing so
    empty cells contribute finitely.  Two broadcast-sized stat frames
    + ONE (type, bin) hash aggregation — the wide input never shuffles
    on anything finer; no window, no sort.  The oracle mirrors the
    grid enumeration (all 10 bins per type, absent cells at count 0),
    the smoothing constants, the 6-dp rounding, the NaN exclusion,
    and the forced-drift surfacing of types first seen in the
    current half (ADVICE r11: a monitor must not silently drop a
    brand-new event type)."""
    from cdc_redshift_spark.operators.quality import psi_drift

    ev = load_table(spark, sf_dir, "events")
    return psi_drift(ev, "event_type", "value", "ts_ns").orderBy(
        "event_type"
    )


ORACLE_DRIFT_PSI = """
WITH ev AS (
  SELECT event_type AS k, value AS v, epoch_ns(ts) AS e
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), bounds AS (
  SELECT min(e) AS mn, max(e) AS mx FROM ev
), halves AS (
  SELECT k, v, e <= (mn + mx) // 2 AS is_ref FROM ev, bounds
), ref AS (
  -- reference-half bin edges where the key has reference rows; the
  -- degenerate lo = hi = 0 grid (everything in bin 0) for keys first
  -- seen in the current half, which must surface, not vanish
  SELECT k,
         coalesce(min(CASE WHEN is_ref THEN v END), 0.0) AS lo,
         coalesce(max(CASE WHEN is_ref THEN v END), 0.0) AS hi
  FROM halves GROUP BY k
), cells AS (
  SELECT h.k,
         CASE WHEN hi = lo THEN 0
              ELSE CAST(least(greatest(
                     floor((v - lo) / ((hi - lo) / 10.0)), 0), 9) AS BIGINT)
         END AS b,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_ref,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS c_cur
  FROM halves h JOIN ref ON h.k = ref.k
  GROUP BY 1, 2
), grid AS (
  SELECT ref.k, g.range AS b FROM ref, range(10) AS g
), filled AS (
  SELECT grid.k, grid.b,
         coalesce(c_ref, 0) AS c_ref, coalesce(c_cur, 0) AS c_cur
  FROM grid LEFT JOIN cells ON grid.k = cells.k AND grid.b = cells.b
), tot AS (
  SELECT k, sum(c_ref) AS n_ref, sum(c_cur) AS n_cur FROM filled GROUP BY k
), scored AS (
  SELECT filled.k, n_ref, n_cur,
         ((c_cur + 0.5) / (n_cur + 5.0) - (c_ref + 0.5) / (n_ref + 5.0))
           * ln(((c_cur + 0.5) / (n_cur + 5.0))
                / ((c_ref + 0.5) / (n_ref + 5.0))) AS term
  FROM filled JOIN tot ON filled.k = tot.k
)
SELECT k AS event_type,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       round(sum(term), 6) AS psi,
       round(sum(term), 6) > 0.2 OR CAST(n_ref AS BIGINT) = 0 AS drift
FROM scored
GROUP BY 1, 2, 3
ORDER BY event_type
"""


QUERIES = {
    "events_heavy_hitters": q_events_heavy_hitters,
    "dq_drift_psi": q_dq_drift_psi,
    "dq_orders_suite": q_dq_orders_suite,
    "dq_events_skew": q_dq_events_skew,
    "dq_value_outliers": q_dq_value_outliers,
    "dq_value_winsorized": q_dq_value_winsorized,
    "dq_latency_percentiles": q_dq_latency_percentiles,
}
ORACLES = {
    "events_heavy_hitters": ORACLE_HEAVY_HITTERS,
    "dq_drift_psi": ORACLE_DRIFT_PSI,
    "dq_orders_suite": ORACLE_DQ_ORDERS,
    "dq_events_skew": ORACLE_DQ_SKEW,
    "dq_value_outliers": ORACLE_VALUE_OUTLIERS,
    "dq_value_winsorized": ORACLE_VALUE_WINSORIZED,
    "dq_latency_percentiles": ORACLE_LATENCY_PCT,
}
