"""Declarative data-quality validation (constraint suites).

Extends the one-pass profiler (operators/profile.py) from "describe the
table" to "assert the contract": a check suite is a list of named
constraints — completeness, uniqueness, accepted values, bounds,
predicate compliance — evaluated in ONE aggregation pass over the table
and returned as a long (check_name, metric, passed) DataFrame, plus
referential-integrity checks between tables as bounded anti-join
aggregates.  This is the validation gate a training-data / CDC pipeline
runs before promoting a batch: the output is a tiny frame regardless of
input size, so it can gate a 100 TB load for the cost of one scan.

Scale notes: all row-level checks compile into a single `agg` (one
scan, map-side partial aggregation, scalar output).  `uniqueness` uses
exact `count_distinct` (one expand); at extreme cardinality swap for
`approx_count_distinct` — the suite accepts any Column metric.
Referential integrity is a left-anti-style join aggregated to one row;
Spark broadcasts the dimension side when small, and the key projection
prunes the scan to one column each side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``metric`` is an aggregate Column over the
    table; the check passes when ``min_ok <= metric <= max_ok``."""

    name: str
    metric: Column
    min_ok: float
    max_ok: float


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null ``col`` (1.0 = fully complete)."""
    return F.avg(F.col(col).isNotNull().cast("double"))


def uniqueness(*cols: str) -> Column:
    """distinct / count over ``cols`` (1.0 = key candidate)."""
    return F.count_distinct(*[F.col(c) for c in cols]) / F.count(F.lit(1))


def compliance(predicate: Column) -> Column:
    """Fraction of rows satisfying ``predicate`` (nulls count as
    failing — a null status is not a compliant status)."""
    return F.avg(F.coalesce(predicate.cast("double"), F.lit(0.0)))


def accepted_values(col: str, values: list) -> Column:
    return compliance(F.col(col).isin(values))


def check_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in one aggregation pass.

    Returns (check_name, metric, passed) — one row per check, computed from
    a single scan of ``df``.
    """
    if not checks:
        raise ValueError("check_suite() needs at least one check")
    row = df.agg(
        *[c.metric.cast("double").alias(f"__m_{i}") for i, c in enumerate(checks)]
    )

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    stack_args = ", ".join(
        f"{q(c.name)}, __m_{i}, "
        f"(__m_{i} >= CAST({c.min_ok!r} AS DOUBLE) AND "
        f"__m_{i} <= CAST({c.max_ok!r} AS DOUBLE))"
        for i, c in enumerate(checks)
    )
    return row.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, metric, passed)"
    )


def key_skew_report(
    df: DataFrame, cols: list[str] | tuple[str, ...], top: int = 10
) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective shuffle/join key: the
    ``top`` most frequent key values with their row share and skew
    factor (rows ÷ mean rows per key).  ONE count aggregation over the
    table + a TakeOrdered of the tiny per-key frame — run it before
    choosing partition keys; a skew factor ≫ 1 on the planned join key
    is the signal to salt (operators/joins.py) or pre-aggregate.

    Output: (*cols, n, share, skew_x), ordered by n desc then key.
    """
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *cols,
            "n",
            (F.col("n") / F.col("_total")).alias("share"),
            # divide BEFORE multiplying: n * nkeys as int64 overflows at
            # the cardinalities this report exists for (n=1e10 rows ×
            # nkeys=1e9 keys > 2^63)
            (F.col("n") / F.col("_total") * F.col("_nkeys")).alias("skew_x"),
        )
        .orderBy(F.desc("n"), *cols)
        .limit(top)
    )


def referential_integrity(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
    max_orphan_frac: float = 0.0,
) -> DataFrame:
    """Orphan-rate check: fraction of non-null ``child_col`` values
    with no match in ``parent_col``.  Same (check, metric, passed)
    shape as :func:`check_suite` so suites union cleanly."""
    name = name or f"ri_{child_col}_in_{parent_col}"
    c = child.select(F.col(child_col).alias("_k")).filter(
        F.col("_k").isNotNull()
    )
    p = (
        parent.select(F.col(parent_col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = c.join(p, "_k", "left")
    return joined.agg(
        F.lit(name).alias("check_name"),
        F.coalesce(
            F.avg(F.col("_hit").isNull().cast("double")), F.lit(0.0)
        ).alias("metric"),
    ).select(
        "check_name",
        "metric",
        (F.col("metric") <= F.lit(float(max_orphan_frac))).alias("passed"),
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_frac: float,
) -> DataFrame:
    """Exact heavy hitters in two bounded passes: keys occurring in at
    least ``min_frac`` of rows, with their EXACT counts — including a
    NULL key group (a null-heavy column is precisely the kind of skew
    this report exists to surface, and the plain GROUP BY oracle has
    the NULL group too).

    Pass 1 screens candidates with per-partition Misra–Gries summaries
    (Misra & Gries 1982; the streaming frequent-items algorithm) over
    ``mapInPandas`` — ``k = ceil(1/min_frac)`` counters per partition
    guarantee ZERO false negatives: a key with global frequency
    >= min_frac·N must, by weighted pigeonhole, reach local frequency
    >= min_frac·n_p on some partition, and MG with k >= 1/min_frac
    counters retains every key above n_p/(k+1).  The screen also
    tallies each partition's row and null-key counts, so the total N
    and the exact NULL-group count come from the SCREEN output (tiny)
    — no extra scan.  Pass 2 computes exact counts for non-null
    candidates only (broadcast semi-join) and applies the threshold
    with integer math.

    Why not a plain groupBy: at 100 TB a full count-by-key shuffles
    EVERY row; here the shuffle carries only rows of candidate keys
    (<= k per partition survive the Arrow screen, so the candidate
    set is tiny and broadcastable) while the screen itself is a
    shuffle-free single scan.  This is the exact-output complement to
    the sampling-based ``key_skew_report`` above.

    Output: ``key_col, cnt`` for every key with
    ``cnt * 1e6 >= num * N`` where ``num`` is ``min_frac`` in exact
    parts-per-million, sorted by cnt desc / key asc (NULLS LAST).
    """
    import math

    if not (0.0 < min_frac <= 1.0):
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    k = max(1, math.ceil(1.0 / min_frac))
    num = int(round(min_frac * 1_000_000))
    ktype = dict(df.dtypes)[key_col]
    out_schema = f"{key_col} {ktype}, __pn long, __pnull long"

    def mg_screen(batches):
        import pandas as pd

        counters: dict = {}
        n_rows = 0
        n_null = 0
        for pdf in batches:
            for v in pdf[key_col]:
                n_rows += 1
                if v is None or (isinstance(v, float) and v != v):
                    n_null += 1  # exact tally; nulls never enter MG
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        cand = list(counters.keys())
        yield pd.DataFrame(
            {
                key_col: pd.Series(cand + [None], dtype=object),
                "__pn": pd.Series([None] * len(cand) + [n_rows], dtype=object),
                "__pnull": pd.Series(
                    [None] * len(cand) + [n_null], dtype=object
                ),
            }
        )

    # the screen output is tiny (<= k+1 rows per partition) but feeds
    # THREE consumers (stats, candidates, null group) — collect it once
    # and recreate as a local frame so the table is scanned exactly
    # once with NOTHING left cached (a persist() here leaked one
    # cached RDD per call in long-lived sessions; ADVICE r6)
    spark = df.sparkSession
    screen = spark.createDataFrame(
        df.select(key_col).mapInPandas(mg_screen, schema=out_schema).collect(),
        schema=out_schema,
    )
    stats = screen.agg(
        F.sum("__pn").alias("__n"), F.sum("__pnull").alias("__nnull")
    )
    cands = (
        screen.where(F.col("__pn").isNull() & F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
    )
    counted = (
        df.join(F.broadcast(cands), key_col, "leftsemi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(stats))
        .where(F.col("cnt") * F.lit(1_000_000) >= F.lit(num) * F.col("__n"))
        .select(key_col, "cnt")
    )
    null_group = (
        stats.where(
            (F.col("__nnull") > 0)
            & (
                F.col("__nnull") * F.lit(1_000_000)
                >= F.lit(num) * F.col("__n")
            )
        )
        .select(
            F.lit(None).cast(ktype).alias(key_col),
            F.col("__nnull").alias("cnt"),
        )
    )
    return counted.unionByName(null_group).orderBy(
        F.col("cnt").desc(), F.col(key_col).asc_nulls_last()
    )


def robust_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.5,
    min_group: int = 8,
) -> DataFrame:
    """Per-key robust outlier detection: flag rows whose ``value_col``
    deviates from its key's MEDIAN by more than ``k`` robust standard
    deviations, where the robust sigma is ``1.4826 · MAD`` (median
    absolute deviation; the 1.4826 factor makes MAD consistent with
    sigma under normality — Hampel's rule, the standard robust
    replacement for the z-score).  Mean/stddev outlier rules break on
    the exact data they exist to find (one huge value drags the mean
    and inflates sigma until nothing is flagged — masking); median/MAD
    have a 50% breakdown point.

    The DQ use: metric streams (payment values, latencies, event
    volumes) audited per entity before a batch is promoted.

    Scale shape: ONE hash shuffle on ``key_col``; both the median and
    the MAD evaluate as exact interpolated ``percentile`` aggregates
    over two whole-partition Window passes that SHARE that single
    partitioning (no second exchange — the MAD window consumes the
    median window's output in place).  No driver state, no join.

    Guards (both sides of the oracle mirror):
    - groups smaller than ``min_group`` rows never flag (median/MAD of
      a handful of points is noise);
    - ``mad = 0`` (a majority-constant group) never flags — every
      deviation would otherwise be infinite sigma; surface those keys
      with accepted-values checks instead.

    Returns the FLAGGED rows only: (key, value, med, mad, rows in the
    key's group), med/mad rounded to 6 dp for the cross-engine hash
    discipline; the flag itself compares UNROUNDED doubles with the
    same literal-times-literal expression shape both engines constant-
    fold identically.
    """
    from pyspark.sql import Window

    if min_group < 1:
        raise ValueError(f"min_group must be >= 1, got {min_group}")
    w = Window.partitionBy(key_col)
    med = F.percentile(F.col(value_col), F.lit(0.5)).over(w)
    with_med = df.select(
        "*",
        med.alias("__med"),
        F.count(F.lit(1)).over(w).alias("__n"),
    )
    mad = F.percentile(
        F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)
    ).over(w)
    scored = with_med.select("*", mad.alias("__mad"))
    return scored.where(
        (F.col("__n") >= F.lit(int(min_group)))
        & (F.col("__mad") > F.lit(0.0))
        & (
            F.abs(F.col(value_col) - F.col("__med"))
            > F.lit(float(k)) * F.lit(1.4826) * F.col("__mad")
        )
    ).select(
        *[c for c in df.columns],
        F.round("__med", 6).alias("med"),
        F.round("__mad", 6).alias("mad"),
        F.col("__n").alias("group_rows"),
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p: float = 0.01,
    out_col: str | None = None,
) -> DataFrame:
    """Per-key winsorization: clamp ``value_col`` into its key's
    exact interpolated [p, 1-p] percentile band — the standard tail
    treatment when downstream aggregates (means, regressions, feature
    scalings) must survive heavy-tailed metrics WITHOUT dropping rows
    (the complement of :func:`robust_outliers`, which flags-and-
    reports instead of repairing).

    Scale shape: both percentile bounds evaluate as exact aggregates
    over ONE whole-partition window on ``key_col`` — a single hash
    exchange, no join, no driver state.  Adds ``out_col`` (default
    ``<value_col>_w``) plus the per-key ``lo``/``hi`` bounds; original
    columns pass through untouched.
    """
    from pyspark.sql import Window

    if not (0.0 < p < 0.5):
        raise ValueError(f"p must be in (0, 0.5), got {p}")
    out_col = out_col or f"{value_col}_w"
    w = Window.partitionBy(key_col)
    lo = F.percentile(F.col(value_col), F.lit(p)).over(w)
    hi = F.percentile(F.col(value_col), F.lit(1.0 - p)).over(w)
    return df.select(
        "*", lo.alias("__lo"), hi.alias("__hi")
    ).select(
        *df.columns,
        F.round("__lo", 6).alias("lo"),
        F.round("__hi", 6).alias("hi"),
        # NULL passes through: Spark's greatest/least SKIP nulls, so an
        # unguarded clamp would turn a missing metric into the lower
        # bound — exactly the silent corruption this operator prevents
        F.when(F.col(value_col).isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.least(
                    F.greatest(F.col(value_col), F.col("__lo")),
                    F.col("__hi"),
                ),
                6,
            )
        )
        .alias(out_col),
    )


def psi_bin_expr(v: Column, lo: Column, hi: Column, bins: int) -> Column:
    """The shared PSI bin assignment: equal-width bins over the
    reference [lo, hi], out-of-range values clamped into the edge
    bins, a degenerate (hi == lo) reference collapsing to bin 0.
    Factored out so the batch monitor (:func:`psi_drift`) and the
    streaming histogram maintainer certify the IDENTICAL expression."""
    width = (hi - lo) / F.lit(float(bins))
    return (
        F.when(hi == lo, F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.greatest(F.floor((v - lo) / width), F.lit(0).cast("long")),
                F.lit(int(bins) - 1).cast("long"),
            )
        )
    )


def psi_score(
    full: DataFrame,
    key_col: str,
    bins: int = 10,
    smooth: float = 0.5,
    threshold: float = 0.2,
) -> DataFrame:
    """Score a fully-enumerated (``__k``, ``__b``, ``__c_ref``,
    ``__c_cur``) histogram grid into per-key PSI rows — the shared
    back half of :func:`psi_drift`, reused by the streaming monitor
    so streamed state and batch recompute run the same scoring code.
    A key with ``n_ref = 0`` (first seen in the current half) is
    FORCED to ``drift = true`` regardless of its smoothed PSI — a
    brand-new key is maximal drift by definition, mirroring
    ``corpus_token_drift``'s all-OOV stance on new sources.
    Output: (key, n_ref, n_cur, psi, drift)."""
    totals = full.groupBy("__k").agg(
        F.sum("__c_ref").alias("__n_ref"), F.sum("__c_cur").alias("__n_cur")
    )
    s = F.lit(float(smooth))
    denom_pad = F.lit(float(bins) * float(smooth))
    scored = full.join(F.broadcast(totals), "__k").select(
        "__k",
        "__n_ref",
        "__n_cur",
        (
            (
                (F.col("__c_cur") + s) / (F.col("__n_cur") + denom_pad)
                - (F.col("__c_ref") + s) / (F.col("__n_ref") + denom_pad)
            )
            * F.log(
                ((F.col("__c_cur") + s) / (F.col("__n_cur") + denom_pad))
                / ((F.col("__c_ref") + s) / (F.col("__n_ref") + denom_pad))
            )
        ).alias("__term"),
    )
    return (
        scored.groupBy("__k")
        .agg(
            F.first("__n_ref").alias("__nr"),
            F.first("__n_cur").alias("__nc"),
            F.round(F.sum("__term"), 6).alias("psi"),
        )
        .select(
            F.col("__k").alias(key_col),
            F.col("__nr").cast("long").alias("n_ref"),
            F.col("__nc").cast("long").alias("n_cur"),
            "psi",
            (
                (F.col("psi") > F.lit(float(threshold)))
                | (F.col("__nr") == 0)
            ).alias("drift"),
        )
    )


def psi_grid(ref_keys: DataFrame, bins: int) -> DataFrame:
    """Enumerate the full key × bin grid (``__k``, ``__b``) from a
    one-column ``__k`` frame of reference keys — absent cells must
    enter the PSI sum, so both monitor faces left-join their counts
    onto this grid."""
    return ref_keys.select(
        "__k",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(int(bins) - 1).cast("long"))
        ).alias("__b"),
    )


def psi_drift(
    df: DataFrame,
    key_col: str,
    value_col: str,
    epoch_col: str,
    bins: int = 10,
    smooth: float = 0.5,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-key Population Stability Index between the EARLY and LATE
    half of a metric stream — the standard drift monitor a training-
    data / feature pipeline runs before promoting a window of data
    (PSI < 0.1 stable, 0.1-0.2 watch, > 0.2 act; the banking-scorecard
    convention the ML-monitoring literature inherited).

    The stream splits at the midpoint of its exact integer epoch range
    (``epoch_col``; rows at or before ``(min+max) div 2`` are the
    reference half).  Each key's reference half fixes ``bins`` equal-
    width value bins over its [min, max]; both halves histogram into
    that shared grid (current-half values outside the reference range
    clamp into the edge bins, the standard treatment).  Proportions
    are Laplace-smoothed — ``(count + smooth) / (n + bins·smooth)`` —
    so empty cells contribute finitely, and EVERY cell of the
    key × bin grid enters the sum (an absent bin still contributes
    when the two halves' totals differ).

    Keys FIRST SEEN in the current half do not vanish (a monitoring
    consumer must see a brand-new event type): with no reference rows
    to fix bin edges, such a key takes the degenerate grid (every
    value in bin 0), scores against the uniform smoothed reference,
    and is FORCED to ``drift = true`` regardless of the resulting
    PSI — the same maximal-drift stance ``corpus_token_drift`` takes
    on a source with an unseen vocabulary.  NULL and NaN values are
    excluded up front (NaN would poison a key's reference min/max and
    every downstream bin assignment, and Spark and ANSI engines
    disagree on NaN ordering/equality).

        PSI(key) = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

    Scale shape: one global 2-long aggregate (broadcast back), one
    per-key min/max aggregate over both halves (|keys| rows —
    broadcast to the bin assignment, no big-side shuffle), then ONE
    hash aggregation to (key, bin) cells and a |keys|·bins-sized
    reduction to the per-key PSI.  No window, no sort, no driver
    loop; the wide input never shuffles on anything finer than the
    aggregate grids.

    Determinism: the split runs on exact integer epochs (``div``, no
    float); bin edges and widths are double arithmetic on identical
    inputs (IEEE-identical cross-engine); ``ln`` of identical doubles
    agrees to the last ulp across libm implementations far below the
    6-dp output rounding.

    Returns one row per key: (key, n_ref, n_cur, psi, drift) with
    counts as BIGINT, psi rounded to 6 dp, and ``drift`` the
    ``psi > threshold OR n_ref = 0`` boolean.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    ev = df.select(
        F.col(key_col).alias("__k"),
        F.col(value_col).alias("__v"),
        F.col(epoch_col).alias("__e"),
    ).where(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
    )
    bounds = ev.agg(F.min("__e").alias("__mn"), F.max("__e").alias("__mx"))
    halves = ev.crossJoin(F.broadcast(bounds)).select(
        "__k", "__v", F.expr("__e <= (__mn + __mx) div 2").alias("__is_ref")
    )
    # one aggregate over BOTH halves: reference-half min/max where the
    # key has reference rows, the degenerate lo = hi = 0 grid (every
    # value bins to 0) where it is current-only — so new keys keep a
    # row instead of dropping at the stats join
    ref = halves.groupBy("__k").agg(
        F.coalesce(
            F.min(F.when(F.col("__is_ref"), F.col("__v"))), F.lit(0.0)
        ).alias("__lo"),
        F.coalesce(
            F.max(F.when(F.col("__is_ref"), F.col("__v"))), F.lit(0.0)
        ).alias("__hi"),
    )
    cells = (
        halves.join(F.broadcast(ref), "__k")
        .select(
            "__k",
            "__is_ref",
            psi_bin_expr(
                F.col("__v"), F.col("__lo"), F.col("__hi"), bins
            ).alias("__b"),
        )
        .groupBy("__k", "__b")
        .agg(
            F.sum(F.when(F.col("__is_ref"), 1).otherwise(0)).alias("__c_ref"),
            F.sum(F.when(~F.col("__is_ref"), 1).otherwise(0)).alias("__c_cur"),
        )
    )
    full = psi_grid(ref.select("__k"), bins).join(
        cells, ["__k", "__b"], "left"
    ).select(
        "__k",
        "__b",
        F.coalesce("__c_ref", F.lit(0)).alias("__c_ref"),
        F.coalesce("__c_cur", F.lit(0)).alias("__c_cur"),
    )
    return psi_score(full, key_col, bins=bins, smooth=smooth, threshold=threshold)


def t_closeness_ordered_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """Per-QI-class t-closeness for an ORDERED (numeric/ordinal)
    sensitive attribute — the paper's second distance (Li, Li,
    Venkatasubramanian 2007): with ground distance |i-j|/(m-1) over
    the m-value order, the Earth Mover's Distance has the closed
    form

        EMD = (1/(m-1)) * sum_i | sum_{j<=i} (p_j - q_j) |

    — the running prefix sum of the class-vs-global probability gap,
    accumulated along the value order.  This is what distinguishes a
    class skewed into an ADJACENT band from one skewed into a FAR
    band; the nominal form (:func:`t_closeness_report`) scores both
    identically.

    Unlike the nominal monitor, the grid here is MATERIALIZED at
    |classes| x m cells: the prefix sum changes at every global
    value an absent class value passes through, so observed cells
    alone cannot carry it.  That stays input-size-independent — the
    Exchange moves cells, never rows — and m is small by the same
    generalization stance as the QI projection: an ordered audit
    runs on BANDED values (the paper's own setup), so pick the band
    projection explicitly, as with the quasi-identifiers.

    NULL sensitive values are EXCLUDED here (a missing value has no
    position in the order, so it cannot participate in a transport
    distance) — the opposite of the nominal monitor's NULL-as-own-
    value stance, deliberate and documented: audit missingness with
    :func:`t_closeness_report` / :func:`l_diversity_violations`, and
    order-distance the values that exist.  A class that is all-NULL
    therefore does not appear.  NULL quasi-identifiers remain real
    classes (null-safe grid join).

    Scale shape: one hash aggregation to observed (QI, value) cells,
    an m-row global value table (broadcast; its rank window runs on
    those m rows only), one |classes| x m grid via broadcast cross
    join, one window Exchange partitioned BY CLASS over the grid.

    Returns one row per class: (quasi_cols..., n, emd, leaks) with
    n BIGINT (non-NULL rows), emd rounded to 6 dp, ``leaks = emd >
    t``; a single-value order (m == 1) scores 0 for every class."""
    from pyspark.sql import Window

    if not 0.0 < t < 1.0:
        raise ValueError(f"t must be in (0, 1), got {t}")
    cells = (
        df.where(F.col(sensitive_col).isNotNull())
        .groupBy(*quasi_cols, F.col(sensitive_col).alias("__sv"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # global value order: m rows, ranked by the attribute's own order
    # (single-partition window — bounded by m, never by input rows)
    vals = (
        cells.groupBy("__sv")
        .agg(F.sum("__c").alias("__g"))
        .select(
            "__sv",
            "__g",
            F.row_number().over(Window.orderBy("__sv")).alias("__i"),
        )
    )
    class_tot = cells.groupBy(*quasi_cols).agg(
        F.sum("__c").alias("__n")
    )
    big = vals.agg(
        F.sum("__g").alias("__tot"), F.count(F.lit(1)).alias("__m")
    )
    grid = class_tot.alias("__ct").crossJoin(
        F.broadcast(vals.alias("__vals"))
    )
    cell_cond = F.col("__vals.__sv") == F.col("__cells.__sv")
    for q in quasi_cols:
        cell_cond = cell_cond & F.col(f"__ct.{q}").eqNullSafe(
            F.col(f"__cells.{q}")
        )
    joined = grid.join(cells.alias("__cells"), cell_cond, "left")
    wc = Window.partitionBy(
        *[F.col(f"__ct.{q}") for q in quasi_cols]
    ).orderBy("__i")
    cum = joined.crossJoin(F.broadcast(big)).select(
        *[F.col(f"__ct.{q}").alias(q) for q in quasi_cols],
        "__n",
        "__m",
        F.sum(
            F.coalesce(F.col("__cells.__c"), F.lit(0)) / F.col("__n")
            - F.col("__g") / F.col("__tot")
        )
        .over(wc)
        .alias("__cum"),
    )
    return (
        cum.groupBy(*quasi_cols)
        .agg(
            F.first("__n").cast("long").alias("n"),
            F.round(
                F.when(
                    F.first("__m") > 1,
                    F.sum(F.abs(F.col("__cum")))
                    / (F.first("__m") - F.lit(1)).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("emd"),
        )
        .select(
            *quasi_cols,
            "n",
            "emd",
            (F.col("emd") > F.lit(float(t))).alias("leaks"),
        )
    )


def emb_drift_score(per_dim: DataFrame, counts: DataFrame) -> DataFrame:
    """Score per-dimension half-means into the embedding-drift report
    — the shared back half of the ``emb_drift_report`` monitor,
    factored out (round 13) so the batch face and the streaming
    maintainer certify the IDENTICAL cosine expressions, mirroring
    :func:`psi_score`'s role for the value monitor.

    ``per_dim``: (label, pos, m_ref, m_cur) — the mean of embedding
    component ``pos`` over each half (NULL when the half is empty for
    the label).  ``counts``: (label, n_ref, n_cur) vector counts per
    half.  Output: (label BIGINT, n_ref BIGINT, n_cur BIGINT,
    mean_cosine DOUBLE rounded to 6 dp) — NULL cosine when either
    half's mean vector has zero norm or no rows (an all-cancelling or
    absent half has no direction; the guard keeps Spark 4's ANSI x/0
    at the oracle's NULL semantics)."""
    cos = (
        per_dim.groupBy("label")
        .agg(
            F.sum(F.col("m_ref") * F.col("m_cur")).alias("dot"),
            F.sqrt(F.sum(F.col("m_ref") * F.col("m_ref"))).alias("nr"),
            F.sqrt(F.sum(F.col("m_cur") * F.col("m_cur"))).alias("nc"),
        )
        .select(
            "label",
            F.round(
                F.when(
                    F.col("nr") * F.col("nc") != 0.0,
                    F.col("dot") / (F.col("nr") * F.col("nc")),
                ),
                6,
            ).alias("mean_cosine"),
        )
    )
    # LEFT join (ADVICE r13): a label whose embeddings are all
    # NULL/empty in BOTH halves contributes zero per_dim rows on the
    # Spark side (posexplode / maintained cells emit nothing), while
    # the oracle's CROSS JOIN generate_series grid keeps the label
    # with NULL means — so cos must attach as optional, keeping the
    # label with NULL mean_cosine on both faces to match the oracle's
    # row set on degenerate data.
    return counts.join(cos, "label", "left").select(
        F.col("label").cast("long").alias("label"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        "mean_cosine",
    )


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier classes smaller than ``k`` — the k-anonymity
    audit a privacy gate runs before releasing or training on a table
    (Sweeney 2002: a release is k-anonymous when every combination of
    quasi-identifier values is shared by at least k rows; smaller
    classes re-identify individuals by linkage).

    The caller picks the quasi-identifier projection — typically
    coarsened columns (bands, prefixes, truncated geo) rather than raw
    values, since k-anonymity is a property OF a generalization.

    Scale shape: ONE hash aggregation on the QI tuple (map-side
    combined), then a count filter — the violating classes are by
    definition the small ones, so the output is bounded by
    |violators| · k rows' worth of classes regardless of table size.
    NULL QI values group as their own class (Spark and ANSI GROUP BY
    agree on null grouping), which is the conservative reading: an
    all-null band is still a linkable signature.

    Returns (quasi_cols..., n) for classes with ``n < k``, counts as
    BIGINT.
    """
    return k_anonymity_score(
        df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n")), k
    )


def k_anonymity_score(counts: DataFrame, k: int, n_col: str = "n") -> DataFrame:
    """The k-anonymity VERDICT over already-aggregated QI-class counts
    — the shared back half of the audit, factored out (round 14) so
    the batch face (:func:`k_anonymity_violations`) and the streaming
    face (maintained RollupMaintainer counts) certify the IDENTICAL
    threshold expression, mirroring :func:`psi_score` /
    :func:`emb_drift_score` for the drift monitors.

    ``counts``: (QI cols..., ``n_col``).  A class is a violation when
    ``0 < n < k`` — the lower bound is free on the batch face (a
    GROUP BY count is >= 1) and makes the expression safe on a
    MID-REPLAY maintained state, where a retraction arriving ahead of
    its insert legitimately leaves a negative in-flight group
    (operators/incremental.apply_rollup_delta's documented contract:
    readers tolerate mid-replay reads by filtering n > 0)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return counts.where(
        (F.col(n_col) > 0) & (F.col(n_col) < F.lit(int(k)))
    )


def l_diversity_violations(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """Quasi-identifier classes whose sensitive attribute takes fewer
    than ``l`` DISTINCT values — the homogeneity gap k-anonymity
    leaves open (Machanavajjhala et al. 2007: a class can be
    k-anonymous yet reveal every member's sensitive value when the
    class is homogeneous; distinct l-diversity is the baseline
    remedy a privacy gate checks alongside
    :func:`k_anonymity_violations`).

    A NULL sensitive value counts as ONE value of its own — a class
    where everyone's diagnosis is missing is still homogeneous, and
    ANSI GROUP BY (both engines) groups NULLs together, which the
    two-level aggregation below inherits for free.

    Scale shape: ONE hash aggregation on (QI..., sensitive) — the
    distinct collapse, map-side combined so duplicate values fold
    before the shuffle — then ONE |distinct-tuples|-sized aggregation
    to (QI, n, l_vals).  Output bounded by the violating classes.

    Returns (quasi_cols..., n, l_vals) for classes with
    ``l_vals < l``; counts as BIGINT (``n`` = class size, ``l_vals``
    = distinct sensitive values seen in the class).
    """
    per_value = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__sv")
    ).agg(F.count(F.lit(1)).alias("__c"))
    return l_diversity_score(per_value, quasi_cols, l)


def l_diversity_score(
    per_value: DataFrame,
    quasi_cols: list[str],
    l: int,
    count_col: str = "__c",
) -> DataFrame:
    """The distinct-l-diversity verdict over already-aggregated
    (QI..., sensitive-value, count) cells — the shared back half of
    the audit (round 14), so the batch face
    (:func:`l_diversity_violations`) and a streaming face scoring a
    maintained (QI, value) count state certify the IDENTICAL
    expressions, the :func:`k_anonymity_score` pattern.

    Cells with ``count <= 0`` are dropped first: a maintained state
    mid-replay can carry a negative in-flight cell (retraction ahead
    of its insert), and a retracted-to-then-pruned value must not be
    counted toward diversity either way.  On the batch face the
    filter is free (GROUP BY counts are >= 1)."""
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    return (
        per_value.where(F.col(count_col) > 0)
        .groupBy(*quasi_cols)
        .agg(
            F.sum(count_col).cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("l_vals"),
        )
        .where(F.col("l_vals") < F.lit(int(l)))
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.3,
) -> DataFrame:
    """Per-QI-class t-closeness for a NOMINAL sensitive attribute —
    the third privacy audit (Li, Li, Venkatasubramanian 2007): a
    class can be k-anonymous AND l-diverse yet still leak when its
    sensitive distribution differs sharply from the table's (the
    skewness attack — 2 distinct diagnoses where one is 'cancer' at
    50% against a 1% base rate).  For categorical attributes under
    the uniform ground distance, the paper's Earth Mover's Distance
    is EXACTLY the total variation distance
    ``0.5 * sum_s |p(s|class) - p(s)|``, which is what this computes.

    No class x value grid is materialized: values absent from a class
    contribute their full global mass, and

        sum_s |p_c - p_g|  =  1 + sum_{s in class} (|p_c - p_g| - p_g)

    (the absent values' sum_s p_g folds into the constant), so the
    report needs only the OBSERVED (QI, sensitive) cells.  NULL
    sensitive values are one value of their own, as in
    :func:`l_diversity_violations`.

    Scale shape: ONE hash aggregation to the observed (QI, sensitive)
    cells (map-side combined), a |classes|-sized and a |values|-sized
    re-aggregation, one broadcast join of the |values| global table
    and one 1-row total attach; the input is never shuffled on
    anything finer than the cell grid.  Both re-attach joins are
    NULL-SAFE (``eqNullSafe`` / ``IS NOT DISTINCT FROM``): a NULL
    sensitive value is one value of its own and a NULL quasi-
    identifier is a real class, so neither may drop from the term sum
    the way a null-rejecting equi-join would silently do.

    Returns one row per class: (quasi_cols..., n, tvd, leaks) with
    n BIGINT, tvd rounded to 6 dp, ``leaks = tvd > t``.  Every class
    is reported (the monitor wants the whole distribution-distance
    landscape, thresholded like psi_drift's ``drift`` flag).
    """
    cells = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__sv")
    ).agg(F.count(F.lit(1)).alias("__c"))
    return t_closeness_score(cells, quasi_cols, t)


def t_closeness_score(
    cells: DataFrame,
    quasi_cols: list[str],
    t: float,
    count_col: str = "__c",
    value_col: str = "__sv",
) -> DataFrame:
    """The t-closeness verdict over already-aggregated (QI...,
    sensitive-value, count) cells — the shared back half (round 14),
    so the batch face (:func:`t_closeness_report`) and a streaming
    face scoring a maintained cell state certify the IDENTICAL
    absent-value EMD algebra, completing the privacy triad's shared-
    scorer set with :func:`k_anonymity_score` /
    :func:`l_diversity_score`.

    Cells with ``count <= 0`` are dropped first (mid-replay safety,
    free on the batch face where GROUP BY counts are >= 1)."""
    if not 0.0 < t < 1.0:
        raise ValueError(f"t must be in (0, 1), got {t}")
    cells = cells.where(F.col(count_col) > 0).select(
        *quasi_cols,
        F.col(value_col).alias("__sv"),
        F.col(count_col).alias("__c"),
    )
    class_tot = cells.groupBy(*quasi_cols).agg(
        F.sum("__c").alias("__n")
    )
    global_tot = cells.groupBy("__sv").agg(F.sum("__c").alias("__g"))
    # "__tot", not "__N": Spark resolves columns case-insensitively by
    # default, so "__N" would collide with the per-class "__n"
    big_n = cells.agg(F.sum("__c").alias("__tot"))
    # eqNullSafe keys keep NULL sensitive values and NULL QI classes
    # in the report (plain equi-joins would drop them: the value's
    # term would vanish from the sum while still counted in __n, and
    # an all-NULL class would vanish entirely).  EqualNullSafe is a
    # legal hash-join key, so both stay broadcast hash joins.
    c, g, k = cells.alias("__cells"), global_tot.alias("__gt"), (
        class_tot.alias("__ct")
    )
    qi_cond = F.lit(True)
    for q in quasi_cols:
        qi_cond = qi_cond & F.col(f"__cells.{q}").eqNullSafe(
            F.col(f"__ct.{q}")
        )
    scored = (
        c.join(
            F.broadcast(g),
            F.col("__cells.__sv").eqNullSafe(F.col("__gt.__sv")),
        )
        .join(F.broadcast(k), qi_cond)
        .crossJoin(F.broadcast(big_n))
        .select(
            *[F.col(f"__cells.{q}").alias(q) for q in quasi_cols],
            "__n",
            (
                F.abs(
                    F.col("__c") / F.col("__n")
                    - F.col("__g") / F.col("__tot")
                )
                - F.col("__g") / F.col("__tot")
            ).alias("__term"),
        )
    )
    return (
        scored.groupBy(*quasi_cols)
        .agg(
            F.first("__n").cast("long").alias("n"),
            F.round(
                F.lit(0.5) * (F.lit(1.0) + F.sum("__term")), 6
            ).alias("tvd"),
        )
        .select(
            *quasi_cols,
            "n",
            "tvd",
            (F.col("tvd") > F.lit(float(t))).alias("leaks"),
        )
    )
