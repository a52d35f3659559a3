"""Temporal join operators: as-of join and interval (range) join.

The reference has no temporal operators — its only time logic is LWW
dedup ordering and the ``ts_date`` partition column (SURVEY §2.7).
These are the time-series extensions a CDC/analytics engine needs,
built Spark-first:

- :func:`asof_join` — the classic distributed as-of join via
  union + window carry-forward: ONE shuffle on the join key, no row
  explosion, no driver state.  Semantics match DuckDB / pandas
  ``ASOF JOIN`` with ``direction='backward'`` (match the newest right
  row with ``right_ts <= left_ts``).
- :func:`interval_join` — range join (``start <= ts <= end``) via
  coarse time-cell bucketing.  Spark plans a raw inequality join as a
  broadcast-nested-loop (O(N·M) compares — dead at scale); bucketing
  turns it into a shuffle equi-join on cell id with bounded
  replication (``interval_len / cell + 1`` copies per interval row),
  AQE-skew-splittable like any equi-join.

Scale notes (100 TB):
- ``asof_join`` shuffles each side once on the key columns; per-key
  state inside the window is O(1) (one carried struct).  Hot keys are
  a window-skew risk (windows cannot be AQE-split) — same exposure as
  every LWW dedup in this engine; salt upstream if one key dominates.
- ``interval_join`` replication is controlled by ``cell``: pick it
  near the typical interval length so each interval lands in ~2
  cells.  Facts never replicate (each fact has exactly one cell), so
  the shuffle is ~|facts| + 2|intervals| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | tuple[str, ...],
    left_ts: str,
    right_ts: str,
    payload: list[str] | tuple[str, ...],
    tolerance: int | None = None,
    tiebreak: str | None = None,
    suffix: str = "_m",
    direction: str = "backward",
    salt_bucket_len: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the newest right row of
    the same key with ``right_ts <= left_ts`` (``direction='backward'``,
    the default) or the EARLIEST right row with ``right_ts >= left_ts``
    (``direction='forward'``; requires numeric ts — implemented by
    running the backward join over negated timestamps).  NULL payload
    when no match exists — left-outer semantics.

    Parameters
    ----------
    on : equi-join key column names (present in both sides).
    left_ts / right_ts : ORDER columns.  Must be mutually comparable;
        use exact integer epochs (e.g. ``ts_ns``) for oracle parity.
    payload : right-side columns carried onto matches; emitted as
        ``{name}{suffix}`` alongside ``{right_ts}{suffix}``.
    tolerance : optional max ``left_ts - right_ts`` (same units as the
        ts columns; requires numeric ts).  Older matches are nulled.
    tiebreak : optional right-side column; among right rows sharing
        (key, right_ts) the row with the MAX tiebreak wins, making the
        join deterministic under right-side ts ties.

    salt_bucket_len : optional time-slice width (same units as the ts
        columns; requires numeric ts).  Splits every key's timeline
        into ``floor(ts / salt_bucket_len)`` buckets and runs the
        window per (key, bucket) — the hot-key mitigation: a key whose
        rows would all land in ONE window task is spread across
        ``time_range / salt_bucket_len`` tasks.  Cross-bucket matches
        are restored by a second, tiny carry pass over per-bucket
        winners (one row per key×bucket).  Results are identical to
        the unsalted join (pytest-pinned).

    Plan shape: tag both sides, union, one window over the key ordered
    by (ts, side, tiebreak) where right rows sort before left rows at
    equal ts (so an exactly-simultaneous right row matches), then
    ``last(payload_struct, ignorenulls)`` carries the newest right row
    forward onto each left row.  One shuffle; no join node at all.

    Salted plan shape (``salt_bucket_len``): phase 1 windows per
    (key, bucket) — same shuffle volume, bounded task size; phase 2
    aggregates the newest right row per (key, bucket) with ``max_by``
    (map-side partial combine, skew-proof), carry-forwards those
    winners across buckets with a window whose partitions hold one row
    per bucket (tiny), and equi-joins the incoming carry back on
    (key, bucket); each left row's match is
    ``coalesce(in-bucket carry, incoming bucket carry)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if direction == "forward":
        out = asof_join(
            left.withColumn(left_ts, -F.col(left_ts)),
            right.withColumn(right_ts, -F.col(right_ts)),
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            payload=payload,
            tolerance=tolerance,
            tiebreak=tiebreak,
            suffix=suffix,
            direction="backward",
            salt_bucket_len=salt_bucket_len,
        )
        # undo the negation on the surfaced timestamps
        return out.withColumn(left_ts, -F.col(left_ts)).withColumn(
            f"{right_ts}{suffix}", -F.col(f"{right_ts}{suffix}")
        )
    keys = list(on)
    pay = list(payload)
    lcols = left.columns

    r_struct = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in pay]
    )
    # keep the tiebreak in its NATIVE type — casting to long would turn
    # a string tiebreak into all-NULLs (silently nondeterministic) and
    # truncate doubles; any orderable type works in the window sort
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    # a NULL right_ts would sort NULLS FIRST and be carried forward as
    # the "latest" match for every left row until a real right row
    # appears — drop such rows (they cannot be ordered, so they cannot
    # match).  Left rows with NULL left_ts also sort first and thus
    # match nothing, which is the right null semantics for free.
    right = right.filter(F.col(right_ts).isNotNull())
    rside = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        r_struct.alias("__r"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in lcols],
    )
    struct_type = rside.schema["__r"].dataType
    tb_type = rside.schema["__tb"].dataType
    lside = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        # NULL sorts first among equal (__t, __side=1) peers; left rows'
        # mutual order is irrelevant (only right rows carry payload)
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(struct_type).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )

    if salt_bucket_len is not None:
        if salt_bucket_len <= 0:
            raise ValueError(
                f"salt_bucket_len must be a positive integer, got {salt_bucket_len}"
            )
        # a left row with NULL ts has a NULL bucket, and the phase-3
        # INNER equi-join on __b would silently DROP it — while the
        # unsalted window keeps it (matching nothing), breaking the
        # documented salted==unsalted contract.  Right rows are
        # already NULL-ts-filtered, so a sentinel bucket far below any
        # real floor(ts/len) affects only those left rows: it sorts
        # FIRST in the carry ordering, receives no incoming carry, and
        # matches nothing — exactly the unsalted semantics.
        bcol = F.coalesce(
            F.floor(F.col("__t") / F.lit(salt_bucket_len)).cast("long"),
            F.lit(-(2**62)).cast("long"),
        )
        u = rside.unionByName(lside).withColumn("__b", bcol)
        # phase 1: the ORIGINAL window, but per (key, bucket) — same
        # shuffle volume, task size bounded by rows-per-bucket
        wb = (
            Window.partitionBy(*keys, "__b")
            .orderBy("__t", "__side", "__tb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("__m0", F.last("__r", ignorenulls=True).over(wb))
        # phase 2a: newest right row per (key, bucket) — max_by matches
        # the window's (__t, __tb) pick and partial-combines map-side,
        # so the hot key reduces before it crosses the shuffle
        bucket_last = (
            rside.withColumn("__b", bcol)
            .groupBy(*keys, "__b")
            .agg(
                F.max_by("__r", F.struct(F.col("__t"), F.col("__tb"))).alias(
                    "__bl"
                )
            )
        )
        # phase 2b: carry winners across buckets — one row per
        # key×bucket, so this per-key window is tiny by construction
        buckets = u.select(*keys, "__b").distinct()
        wkey = (
            Window.partitionBy(*keys)
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            buckets.join(bucket_last, [*keys, "__b"], "left")
            .withColumn("__in", F.last("__bl", ignorenulls=True).over(wkey))
            .select(*keys, "__b", "__in")
        )
        # phase 3: equi-join the incoming carry back (bucket in the key
        # → skew-bounded; AQE may broadcast the tiny carry side)
        u = u.join(carry, [*keys, "__b"]).withColumn(
            "__m", F.coalesce(F.col("__m0"), F.col("__in"))
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__t", "__side", "__tb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = rside.unionByName(lside).withColumn(
            "__m", F.last("__r", ignorenulls=True).over(w)
        )
    out = u.filter(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__m",
            F.when(
                F.col("__t") - F.col("__m.__ts") <= F.lit(tolerance), F.col("__m")
            ),
        )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__m.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in pay],
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start: str,
    end: str,
    cell: int,
) -> DataFrame:
    """Inner range join: every (fact, interval) pair with
    ``start <= fact_ts <= end`` (all three integer columns, same unit).

    Each interval explodes to the coarse cells it covers
    (``start div cell .. end div cell``); each fact maps to its single
    cell; the equi-join on cell id is then refined by the exact range
    predicate.  A qualifying pair meets in exactly one cell (the
    fact's), so no post-join dedup is needed.

    Column names must be disjoint between ``facts`` and ``intervals``
    apart from none — rename before calling if they collide.
    """
    if cell <= 0:
        # 'x div 0' is NULL, sequence(NULL, NULL) is NULL, and
        # explode(NULL) would silently drop every interval row
        raise ValueError(f"cell must be a positive integer, got {cell}")
    # Column-API cell ids (no F.expr string splicing: arbitrary column
    # names — spaces, dots, keywords — must not be parsed as SQL).
    # floor()+cast matches `div` for the non-negative timestamps this
    # operator handles, and floors (rather than truncates) negatives so
    # adjacent cells stay contiguous.
    def _cell(col: str):
        return F.floor(F.col(col) / F.lit(cell)).cast("long")

    iv = intervals.withColumn(
        "__cell", F.explode(F.sequence(_cell(start), _cell(end)))
    )
    ft = facts.withColumn("__cell", _cell(fact_ts))
    return (
        ft.join(iv, "__cell")
        .filter((F.col(fact_ts) >= F.col(start)) & (F.col(fact_ts) <= F.col(end)))
        .drop("__cell")
    )


def session_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_ns: int = 30 * 60 * 1_000_000_000,
) -> DataFrame:
    """Within-session event-type transitions (the rows behind "user
    journey" path mining): sessionize by the ``gap_ns`` inactivity
    rule, then pair each event with the NEXT event of the same
    session.

    Scale shape: sessionization (lag + cumulative sum), the
    session-id of the next row, and the next event type are ALL
    windows over the SAME (user, time, id) ordering — Spark plans ONE
    hash-partition exchange on ``user_col`` and a single sort; no
    ``collect_list`` session arrays (which would need a second
    shuffle on (user, session) and build unbounded per-session state),
    no join.  Downstream aggregation by transition is a k-group
    count, k = |event types|² at most.

    Returns one row per consecutive in-session pair: (user, session_id
    — 1-based per user, path "a>b").
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        df.withColumn("__prev_ts", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev_ts").isNull()
                | ((F.col(ts_col) - F.col("__prev_ts")) > F.lit(gap_ns)),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("__new").over(cum))
    )
    nxt = (
        sess.withColumn("__next_type", F.lead(type_col).over(w))
        .withColumn("__next_sess", F.lead("session_id").over(w))
    )
    return nxt.where(
        F.col("__next_type").isNotNull()
        & (F.col("__next_sess") == F.col("session_id"))
    ).select(
        F.col(user_col),
        "session_id",
        F.concat_ws(">", F.col(type_col), F.col("__next_type")).alias(
            "path"
        ),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_ns: int = 3_600 * 1_000_000_000,
) -> DataFrame:
    """Per-(key, time-bucket) TIME-WEIGHTED average of a step signal —
    the TWAP/time_weight aggregate of market-data and metrics TSDBs,
    where a plain AVG over irregular observations over-weights bursts:
    each observation holds its value until the NEXT observation of the
    same key, clipped at its bucket's end (observations are not
    carried across buckets — the per-bucket step-TWAP convention).

    Exactness: weights are integer MICROSECONDS and values integer
    CENTS (``round(value*100)``), so the weighted sum is exact 64-bit
    integer math on both engines (ns → µs keeps cents×duration×
    events/bucket safely under 2^63) and the only float op is the
    final division — IEEE-identical cross-engine, the PARITY.md
    exact-integer-cents discipline.

    Scale shape: ONE window exchange on ``key_col`` (the lead), then
    one (key, bucket) aggregation with map-side combine.  Zero-weight
    ties (same-timestamp observations) contribute nothing, matching
    the step-function reading.

    Returns (key, bucket_us — bucket start in epoch micros —
    twap, n_obs).  A group whose TOTAL hold time rounds to zero
    microseconds (every observation in the bucket's last microsecond)
    has no defined time-weighted value: its row is KEPT with
    ``twap = NULL`` — identically in the SQL mirror (0/0 division) —
    rather than silently dropped.
    """
    from pyspark.sql import Window

    if bucket_ns <= 0:
        raise ValueError(
            f"bucket_ns must be a positive integer, got {bucket_ns} — "
            "pmod(ts, 0) is NULL and would silently null every bucket"
        )

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    # ALL time math in 64-bit integer ops (`-`, `pmod`, `div`): a
    # float division of epoch-nanos (~1.7e18) has 256 ns ULP error —
    # enough to desync the microsecond mirror
    bucket_start = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(bucket_ns)))
    nxt = F.lead(ts_col).over(w)
    end = F.least(
        F.coalesce(nxt, bucket_start + F.lit(bucket_ns)),
        bucket_start + F.lit(bucket_ns),
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    rows = df.select(
        F.col(key_col),
        bucket_start.alias("__bs"),
        (end - F.col(ts_col)).alias("__dur_ns"),
        cents.alias("__c"),
    ).select(
        F.col(key_col),
        F.expr("__bs div 1000").alias("bucket_us"),
        (F.col("__c") * F.expr("__dur_ns div 1000")).alias("__wv"),
        F.expr("__dur_ns div 1000").alias("__w"),
    )
    return rows.groupBy(key_col, "bucket_us").agg(
        F.round(
            # try_divide: a zero-total-weight group is NULL, not an
            # ANSI DIVIDE_BY_ZERO error (DuckDB's 0/0 is NULL too)
            F.try_divide(F.sum("__wv"), F.sum("__w")) / F.lit(100.0), 6
        ).alias("twap"),
        F.count(F.lit(1)).alias("n_obs"),
    )
