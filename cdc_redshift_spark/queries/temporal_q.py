"""Temporal queries: as-of attribution, interval (range) join,
hypertable-style continuous-aggregate rollup — all over ``events``.

Determinism rules: every time comparison runs on exact integer epochs
(``ts_ns div 1000`` micros — see sources/tables.py for the two-format
normalization), as-of right-side ties are broken by max event_id on
both engines, and float aggregates are rounded identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.temporal import (
    asof_join,
    interval_join,
    session_transitions,
)
from cdc_redshift_spark.sources.tables import load_table

US_2H = 2 * 3600 * 1_000_000
US_1H = 3600 * 1_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with an exact epoch-micros column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("e_us", F.expr("ts_ns div 1000"))


def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the same user's most recent click at-or-before
    it (classic last-touch attribution) via the distributed as-of join.

    One shuffle on user_id; no join node (union + window carry-forward
    — operators/temporal.py).  The reference has no temporal joins;
    this is a north-star extension.
    """
    ev = _events_us(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "e_us", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("e_us").alias("c_us"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="e_us",
        right_ts="c_us",
        payload=["click_id", "click_value"],
        tiebreak="click_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "e_us",
        "value",
        F.col("c_us_m"),
        F.col("click_id_m"),
        F.col("click_value_m"),
        (F.col("e_us") - F.col("c_us_m")).alias("gap_us"),
    )


ORACLE_ASOF = """
WITH p AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS e_us, value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, c_us, click_id, click_value FROM (
    SELECT user_id, epoch_ns(ts) // 1000 AS c_us,
           event_id AS click_id, value AS click_value,
           -- partition at MICROsecond precision (the join's time unit):
           -- on nano-precision testdata two clicks can share a micro
           -- while differing in nanos, and the tie must resolve to max
           -- click_id exactly as the Spark side's tiebreak does
           row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
)
SELECT p.event_id, p.user_id, p.e_us, p.value,
       c.c_us AS c_us_m, c.click_id AS click_id_m,
       c.click_value AS click_value_m,
       p.e_us - c.c_us AS gap_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.e_us >= c.c_us
"""


def q_events_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity inside the 2 h following each big purchase: an unkeyed
    range join (any user's events counted) via time-cell bucketing —
    shuffle equi-join on 1 h cells + exact refine, never a
    broadcast-nested-loop (operators/temporal.py).
    """
    ev = _events_us(spark, sf_dir)
    anchors = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150)
    ).select(
        F.col("event_id").alias("anchor_id"),
        F.col("e_us").alias("s_us"),
        (F.col("e_us") + F.lit(US_2H)).alias("t_us"),
    )
    facts = ev.select("event_id", "user_id", "value", F.col("e_us").alias("f_us"))
    joined = interval_join(
        facts, anchors, fact_ts="f_us", start="s_us", end="t_us", cell=US_1H
    )
    return (
        joined.groupBy("anchor_id", "s_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("anchor_id")
    )


ORACLE_BURST = f"""
WITH a AS (
  SELECT event_id AS anchor_id,
         epoch_ns(ts) // 1000 AS s_us,
         epoch_ns(ts) // 1000 + {US_2H} AS t_us
  FROM events WHERE event_type = 'purchase' AND value > 150
), f AS (
  SELECT event_id, user_id, value, epoch_ns(ts) // 1000 AS f_us FROM events
)
SELECT anchor_id, s_us, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS sum_value
FROM a JOIN f ON f.f_us BETWEEN a.s_us AND a.t_us
GROUP BY anchor_id, s_us
ORDER BY anchor_id
"""


def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly rollup from raw
    events, then the daily resolution RE-AGGREGATED from the hourly
    rollup (never re-scanning raw facts — the multi-resolution rollup
    pattern).  The oracle computes the daily numbers directly from raw
    events, so the check proves re-aggregation invariance.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
        F.max("value").alias("mx"),
    )
    return (
        hourly.groupBy(
            F.to_date("hour_ts").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_hours"),
            F.round(F.sum("sv"), 4).alias("sum_value"),
            F.round(F.max("mx"), 4).alias("max_value"),
        )
        .orderBy("day", "event_type")
    )


ORACLE_ROLLUP_HOURLY = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       count(*) AS n_events,
       count(DISTINCT date_trunc('hour', ts)) AS n_hours,
       round(sum(value), 4) AS sum_value,
       round(max(value), 4) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


GRID_START_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
GRID_STEP_US = 6 * 3600 * 1_000_000  # 6 h
GRID_POINTS = 120  # 30 days


def q_events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample + forward-fill: every user's `value`
    carried forward onto a regular 6-hour grid over January 2024 —
    gap-filling composed from the as-of join (grid points are the left
    side, the user's events the right; one keyed window shuffle, no
    join node).  NULL before a user's first event."""
    ev = _events_us(spark, sf_dir)
    users = ev.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit(GRID_START_US),
                F.lit(GRID_START_US + (GRID_POINTS - 1) * GRID_STEP_US),
                F.lit(GRID_STEP_US),
            )
        ).alias("g_us"),
    )
    obs = ev.select(
        "user_id",
        F.col("e_us").alias("o_us"),
        F.col("event_id").alias("obs_id"),
        F.col("value").alias("obs_value"),
    )
    out = asof_join(
        grid,
        obs,
        on=["user_id"],
        left_ts="g_us",
        right_ts="o_us",
        payload=["obs_id", "obs_value"],
        tiebreak="obs_id",
    )
    return out.select(
        "user_id", "g_us", "o_us_m", "obs_id_m", "obs_value_m"
    )


ORACLE_RESAMPLE = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
grid AS (
  SELECT user_id, {GRID_START_US} + i * {GRID_STEP_US} AS g_us
  FROM u CROSS JOIN range(0, {GRID_POINTS}) r(i)
),
obs AS (
  SELECT user_id, o_us, obs_id, obs_value FROM (
    SELECT user_id, epoch_ns(ts) // 1000 AS o_us,
           event_id AS obs_id, value AS obs_value,
           row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                              ORDER BY event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT g.user_id, g.g_us, o.o_us AS o_us_m,
       o.obs_id AS obs_id_m, o.obs_value AS obs_value_m
FROM grid g ASOF LEFT JOIN obs o
  ON g.user_id = o.user_id AND g.g_us >= o.o_us
"""


def q_events_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resample: every user's `value` estimated
    on the regular 6-hour grid from the BRACKETING observations
    (prev via backward as-of, next via forward as-of — both the
    zero-join-node union+window machinery), NULL outside the observed
    range — the interpolating complement of `events_resample_ffill`.
    Grid points landing exactly on an observation return it (both
    as-ofs agree on the max-event_id row, pinning the tie rule).
    Division rides an explicit DOUBLE cast so the 6-dp rounding
    hashes identically cross-engine."""
    ev = _events_us(spark, sf_dir)
    users = ev.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit(GRID_START_US),
                F.lit(GRID_START_US + (GRID_POINTS - 1) * GRID_STEP_US),
                F.lit(GRID_STEP_US),
            )
        ).alias("g_us"),
    )
    obs = ev.select(
        "user_id",
        F.col("e_us").alias("o_us"),
        F.col("event_id").alias("obs_id"),
        F.col("value").alias("obs_value"),
    )
    back = asof_join(
        grid,
        obs,
        on=["user_id"],
        left_ts="g_us",
        right_ts="o_us",
        payload=["obs_value"],
        tiebreak="obs_id",
        suffix="_p",
    ).select(
        "user_id",
        "g_us",
        F.col("o_us_p").alias("t_prev"),
        F.col("obs_value_p").alias("v_prev"),
    )
    fwd = asof_join(
        grid,
        obs,
        on=["user_id"],
        left_ts="g_us",
        right_ts="o_us",
        payload=["obs_value"],
        tiebreak="obs_id",
        suffix="_n",
        direction="forward",
    ).select(
        "user_id",
        "g_us",
        F.col("o_us_n").alias("t_next"),
        F.col("obs_value_n").alias("v_next"),
    )
    j = back.join(fwd, ["user_id", "g_us"])
    frac = (F.col("g_us") - F.col("t_prev")).cast("double") / (
        F.col("t_next") - F.col("t_prev")
    ).cast("double")
    return j.select(
        "user_id",
        "g_us",
        "t_prev",
        "t_next",
        F.when(
            F.col("t_prev") == F.col("t_next"), F.round("v_prev", 6)
        )
        .when(
            F.col("t_prev").isNotNull() & F.col("t_next").isNotNull(),
            F.round(
                F.col("v_prev")
                + (F.col("v_next") - F.col("v_prev")) * frac,
                6,
            ),
        )
        .alias("v_interp"),
    )


ORACLE_RESAMPLE_INTERP = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
grid AS (
  SELECT user_id, {GRID_START_US} + i * {GRID_STEP_US} AS g_us
  FROM u CROSS JOIN range(0, {GRID_POINTS}) r(i)
),
obs AS (
  SELECT user_id, o_us, obs_value FROM (
    SELECT user_id, epoch_ns(ts) // 1000 AS o_us, value AS obs_value,
           row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                              ORDER BY event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
back AS (
  SELECT g.user_id, g.g_us, o.o_us AS t_prev, o.obs_value AS v_prev
  FROM grid g ASOF LEFT JOIN obs o
    ON g.user_id = o.user_id AND g.g_us >= o.o_us
),
fwd AS (
  SELECT g.user_id, g.g_us, o.o_us AS t_next, o.obs_value AS v_next
  FROM grid g ASOF LEFT JOIN obs o
    ON g.user_id = o.user_id AND g.g_us <= o.o_us
)
SELECT b.user_id, b.g_us, b.t_prev, f.t_next,
       CASE
         WHEN b.t_prev = f.t_next THEN round(b.v_prev, 6)
         WHEN b.t_prev IS NOT NULL AND f.t_next IS NOT NULL THEN
           round(b.v_prev + (f.v_next - b.v_prev)
                 * (CAST(b.g_us - b.t_prev AS DOUBLE)
                    / CAST(f.t_next - b.t_prev AS DOUBLE)), 6)
       END AS v_interp
FROM back b JOIN fwd f USING (user_id, g_us)
"""


SEQ_MAX_EVENTS = 50


def q_events_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral training sequences: per user, the time-ordered
    event-type token string (first SEQ_MAX_EVENTS events; ties broken
    by event_id on both engines) + counts — the events→text bridge for
    sequence-model training data.

    Plan: ONE groupBy shuffle on user_id; ordering happens inside the
    aggregate (`array_sort` over (e_us, event_id) structs), never as a
    global sort."""
    # sort on exact NANOS (ts_ns), matching the oracle's epoch_ns —
    # micros would tie where nanos differ under the NANOS testdata
    # generation (TESTDATA.md) and the tiebreak would diverge
    ev = load_table(spark, sf_dir, "events")
    sorted_types = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts_ns", "event_id", "event_type"))
        ),
        lambda s: s["event_type"],
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.slice(sorted_types, 1, SEQ_MAX_EVENTS), " "
            ).alias("seq"),
        )
        .select(
            "user_id",
            "n_events",
            F.least(F.col("n_events"), F.lit(SEQ_MAX_EVENTS))
            .cast("long")
            .alias("seq_len"),
            "seq",
        )
    )


ORACLE_USER_SEQ = f"""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(least(count(*), {SEQ_MAX_EVENTS}) AS BIGINT) AS seq_len,
       array_to_string(
         list_slice(
           list(event_type ORDER BY epoch_ns(ts), event_id),
           1, {SEQ_MAX_EVENTS}),
         ' ') AS seq
FROM events
GROUP BY user_id
"""



def q_events_golden_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship (operators/golden.golden_record):
    consolidate each user's event stream into ONE master profile row
    under field-level rules — most-recent non-null event_type, majority
    event_type, longest props, max value, first/last seen, count.  The
    master-data merge step that follows entity resolution; every
    non-mode rule is one max_by in a single aggregate pass (no window,
    no per-key sort).  The oracle replays each rule as an explicit
    row_number pick so the tie-breaks are pinned cross-engine."""
    from cdc_redshift_spark.operators.golden import golden_record

    ev = load_table(spark, sf_dir, "events")
    return golden_record(
        ev,
        key_cols=["user_id"],
        order_cols=["ts_ns", "event_id"],
        rules={
            "last_event_type": ("latest", "event_type"),
            "top_event_type": ("mode", "event_type"),
            "widest_props": ("longest", "props"),
            "max_value": ("max", "value"),
            "first_seen_ns": ("min", "ts_ns"),
            "last_seen_ns": ("max", "ts_ns"),
            "n_events": ("count",),
        },
    ).orderBy("user_id")


ORACLE_GOLDEN_PROFILE = """
WITH ev AS (
  SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, event_type,
         value, props
  FROM events
),
lat AS (
  SELECT user_id, event_type AS last_event_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts_ns DESC, event_id DESC) AS rn
    FROM ev WHERE event_type IS NOT NULL
  ) WHERE rn = 1
),
md AS (
  SELECT user_id, event_type AS top_event_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY count(*) DESC, event_type DESC)
             AS rn
    FROM ev WHERE event_type IS NOT NULL
    GROUP BY user_id, event_type
  ) WHERE rn = 1
),
lng AS (
  SELECT user_id, props AS widest_props FROM (
    SELECT user_id, props,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY len(props) DESC, props DESC)
             AS rn
    FROM ev WHERE props IS NOT NULL
  ) WHERE rn = 1
),
agg AS (
  SELECT user_id, max(value) AS max_value,
         min(ts_ns) AS first_seen_ns, max(ts_ns) AS last_seen_ns,
         CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY user_id
)
SELECT a.user_id, l.last_event_type, m.top_event_type,
       g.widest_props, a.max_value, a.first_seen_ns, a.last_seen_ns,
       a.n_events
FROM agg a
LEFT JOIN lat l USING (user_id)
LEFT JOIN md m USING (user_id)
LEFT JOIN lng g USING (user_id)
ORDER BY a.user_id
"""


def q_events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars — the canonical financial/time-series
    downsample: per (hour, event_type), open/close = the FIRST/LAST
    value in exact event order (nanos + event_id tiebreak), high/low =
    extremes, volume = count.  Ordered picks ride max_by/min_by over
    ordering structs inside ONE time-bucketed aggregate — no window,
    no per-bucket sort, the shape that rolls up a 100 TB tick stream
    in a single shuffle.  The oracle uses DuckDB's ordered first/last
    aggregates over the same total order."""
    ev = load_table(spark, sf_dir, "events")
    o = F.struct("ts_ns", "event_id")
    return (
        ev.groupBy(
            F.unix_millis(F.date_trunc("hour", "ts")).alias("bar_ms"),
            "event_type",
        )
        .agg(
            F.min_by(F.col("value"), o).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by(F.col("value"), o).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("bar_ms", "event_type")
    )


ORACLE_OHLC = """
SELECT epoch_ms(date_trunc('hour', ts)) AS bar_ms, event_type,
       first(value ORDER BY epoch_ns(ts), event_id) AS open,
       max(value) AS high,
       min(value) AS low,
       last(value ORDER BY epoch_ns(ts), event_id) AS close,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY bar_ms, event_type
"""


PATH_TOPK = 25


def q_events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path mining: the most frequent within-session
    event-type transitions (operators/temporal.session_transitions),
    with both raw transition counts and the number of distinct
    sessions containing each path.

    Scale shape: sessionization, next-type and next-session are ALL
    windows over one (user, time, id) ordering — ONE exchange on
    user_id, no collect_list session arrays, no join; the transition
    aggregation groups on at most |types|^2 keys and the top-k is
    TakeOrderedAndProject.  The oracle replays the gap rule and the
    lead pairing in SQL."""
    ev = load_table(spark, sf_dir, "events")
    tr = session_transitions(ev)
    return (
        tr.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.count_distinct(
                F.concat_ws(":", F.col("user_id"), F.col("session_id"))
            ).alias("n_sessions"),
        )
        .orderBy(F.desc("n_transitions"), "path")
        .limit(PATH_TOPK)
    )


ORACLE_SESSION_PATHS = f"""
WITH t AS (
  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns,
         lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ns(ts), event_id) AS prev_ts
  FROM events
), s AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts_ns - prev_ts > 1800000000000::BIGINT
                 THEN 1 ELSE 0 END AS new_sess
  FROM t
), g AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts_ns, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
  FROM s
), p AS (
  SELECT user_id, session_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts_ns, event_id) AS next_type,
         lead(session_id) OVER (PARTITION BY user_id
                                ORDER BY ts_ns, event_id) AS next_sess
  FROM g
)
SELECT event_type || '>' || next_type AS path,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(count(DISTINCT user_id || ':' || session_id) AS BIGINT)
         AS n_sessions
FROM p
WHERE next_type IS NOT NULL AND next_sess = session_id
GROUP BY 1
ORDER BY n_transitions DESC, path
LIMIT {PATH_TOPK}
"""


def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, hour) time-weighted average of the event value
    (operators/temporal.time_weighted_avg): each observation holds
    until the next one of the same user, clipped at the hour boundary
    — the TWAP/time_weight aggregate a plain AVG gets wrong on
    irregular observations.  ONE window exchange (the lead) + one
    bucket aggregation; weights in exact integer microseconds, values
    in exact integer cents, so the only float op is the final division
    (IEEE-identical cross-engine)."""
    from cdc_redshift_spark.operators.temporal import time_weighted_avg

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev).orderBy("user_id", "bucket_us")


ORACLE_TWAP = """
WITH t AS (
  SELECT user_id, event_id, value, epoch_ns(ts) AS ts_ns,
         epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS bs,
         lead(epoch_ns(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts), event_id) AS nxt
  FROM events
), d AS (
  SELECT user_id, bs,
         (least(coalesce(nxt, bs + 3600000000000),
                bs + 3600000000000) - ts_ns) // 1000 AS w,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM t
)
SELECT user_id, CAST(bs // 1000 AS BIGINT) AS bucket_us,
       round(CAST(sum(c * w) AS BIGINT) / CAST(sum(w) AS BIGINT)
             / 100.0, 6) AS twap,
       CAST(count(*) AS BIGINT) AS n_obs
FROM d
GROUP BY user_id, bs
ORDER BY user_id, bucket_us
"""


QUERIES = {
    "events_golden_profile": q_events_golden_profile,
    "events_ohlc_bars": q_events_ohlc_bars,
    "events_asof_attribution": q_events_asof_attribution,
    "events_burst_windows": q_events_burst_windows,
    "events_hourly_rollup": q_events_hourly_rollup,
    "events_resample_ffill": q_events_resample_ffill,
    "events_resample_interp": q_events_resample_interp,
    "events_user_sequences": q_events_user_sequences,
    "events_session_paths": q_events_session_paths,
    "events_twap": q_events_twap,
}

ORACLES = {
    "events_golden_profile": ORACLE_GOLDEN_PROFILE,
    "events_ohlc_bars": ORACLE_OHLC,
    "events_asof_attribution": ORACLE_ASOF,
    "events_burst_windows": ORACLE_BURST,
    "events_hourly_rollup": ORACLE_ROLLUP_HOURLY,
    "events_resample_ffill": ORACLE_RESAMPLE,
    "events_resample_interp": ORACLE_RESAMPLE_INTERP,
    "events_user_sequences": ORACLE_USER_SEQ,
    "events_session_paths": ORACLE_SESSION_PATHS,
    "events_twap": ORACLE_TWAP,
}
