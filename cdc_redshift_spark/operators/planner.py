"""Stats-driven join planning: turn persisted column statistics
(:meth:`ParquetSink.analyze` sidecars, or any ``{col: {n, ndv, ...}}``
dict of the same shape) into an explicit join strategy BEFORE the job
launches — broadcast the provably-small side, fall back to shuffle,
and surface the high-multiplicity warning that precedes a skew blowup.

Why this exists at 100 TB: Spark's own broadcast decision
(``autoBroadcastJoinThreshold``) sees only file-size estimates at plan
time, which lie badly after filters or for wide tables read narrow —
and AQE only corrects it at the first shuffle boundary, after paying
the scan.  A table that was ``analyze``-d commits its row count / NDV
once; every later query can make the right call from metadata alone,
the way a warehouse CBO uses its statistics catalog.  (The reference
delegates all of this to Redshift's planner; here the engine owns it.)

The estimator is deliberately conservative and transparent: dtype-based
bytes/row (strings use a documented default width since the stats
carry no average length) and mean key multiplicity = rows / NDV.
Stats say nothing about the MAX key frequency, so the planner flags
*possible* skew (high mean multiplicity) and points at the exact
diagnostics that measure it (``key_skew_report`` / ``heavy_hitters``)
rather than silently salting on a guess.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: dtype → estimated bytes per value (in-memory row estimate for the
#: broadcast decision; strings/binary default wide to stay conservative)
_DTYPE_BYTES = {
    "boolean": 1,
    "tinyint": 1,
    "smallint": 2,
    "int": 4,
    "integer": 4,
    "float": 4,
    "date": 4,
    "bigint": 8,
    "long": 8,
    "double": 8,
    "timestamp": 8,
    "timestamp_ntz": 8,
}
_DEFAULT_WIDTH = 24  # strings, decimals, anything unlisted


def estimate_size_bytes(stats: dict, row_bytes: int | None = None) -> int:
    """In-memory size estimate of an analyzed table: rows ×
    ``row_bytes`` when given, else rows × Σ per-column dtype width
    over the columns PRESENT IN ``stats``.

    CAVEAT — the width sum covers only analyzed columns: a table
    analyzed on a column subset (e.g. just its join key) is
    UNDER-estimated by the unanalyzed columns' width, which would turn
    a broadcast decision into an OOM.  When the join carries more
    columns than were analyzed, pass ``row_bytes`` (full-row width —
    ``analyze()`` on all columns once, or the table's bytes/rows from
    file metadata); :func:`join_plan` forwards its ``*_row_bytes``
    params here for exactly this.  ``stats`` is the
    :meth:`ParquetSink.analyze` shape; row count is taken from any
    column's ``n`` (they are all the same scan)."""
    if not stats:
        raise ValueError("estimate_size_bytes: empty stats")
    rows = max(s["n"] for s in stats.values())
    if row_bytes is not None:
        return int(rows) * int(row_bytes)
    # reserved entries ("__key__" etc.) are derived statistics, not
    # physical columns — including them would inflate the width sum;
    # a stats dict of ONLY reserved entries (df_key_stats composite
    # output) falls back to counting them so the estimate is never 0
    cols = {k: s for k, s in stats.items() if not k.startswith("__")} or stats
    width = sum(
        _DTYPE_BYTES.get(s.get("dtype", ""), _DEFAULT_WIDTH)
        for s in cols.values()
    )
    return int(rows) * int(width)


#: stats-dict entry name for a persisted Count-Min sketch of the key
#: (``ParquetSink.analyze(key_sketch=True)``).  Reserved ("__" prefix)
#: like :data:`COMPOSITE_KEY`; shape ``{n, d, w, key, cells, dtype}``
#: with ``cells`` the :func:`~.sketches.cm_collect` serialization.
CM_SKETCH = "__cm__"


def _cm_output_estimate(
    left_stats: dict, right_stats: dict, join_key: str | None = None
):
    """Join-SIZE estimate from two sidecar CM sketches (the
    Cormode-Muthukrishnan inner product, ``sketches.
    cm_inner_product_cells``) — ``(est, noise_floor)``, or
    ``(None, None)`` when either side lacks a sketch or the
    geometries differ (estimates across mismatched (d, w) are
    meaningless).  Pure driver-side metadata math: <= d*w cells per
    side, zero Spark jobs.

    ``noise_floor`` is the estimator's expected additive collision
    bias, ``n_left * n_right / w`` (each cross pair of stream
    elements collides into a shared cell with probability 1/w; the
    min-over-d rows trims the tail but not the expectation).  The
    raw estimate of ANY join between tables larger than ~sqrt(w * k
    * max(n)) is dominated by this term, so risk decisions must
    subtract it — the raw value alone would flag every large benign
    join.

    Caller contract: BOTH sketches must have been built over the
    JOIN columns — the inner product of frequency vectors on
    unrelated columns is geometry-valid but semantically
    meaningless.  Key names legitimately differ across sides
    (``fact.fk = dim.k``), so this cannot be hard-checked; when
    ``join_key`` is given and a side's recorded sketch column
    differs from it, a ``log.debug`` breadcrumb makes a mispriced
    plan diagnosable."""
    a, b = left_stats.get(CM_SKETCH), right_stats.get(CM_SKETCH)
    if not a or not b:
        return None, None
    if (a["d"], a["w"]) != (b["d"], b["w"]):
        return None, None
    if join_key is not None:
        for side, s in (("left", a), ("right", b)):
            if s.get("key") is not None and s["key"] != join_key:
                log.debug(
                    "join_plan: %s CM sketch covers column %r but the "
                    "join key is %r — est_output_rows is meaningful "
                    "only if both sketches cover the join columns "
                    "(names may differ legitimately: fact.fk = dim.k)",
                    side,
                    s["key"],
                    join_key,
                )
    from cdc_redshift_spark.operators.sketches import (
        cm_inner_product_cells,
    )

    est = cm_inner_product_cells(a["cells"], b["cells"], a["d"])
    n_l = sum(c for _, _, c in a["cells"]) // a["d"]
    n_r = sum(c for _, _, c in b["cells"]) // b["d"]
    return est, (n_l * n_r) // a["w"]


def join_plan(
    left_stats: dict,
    right_stats: dict,
    key: str,
    broadcast_threshold: int = 64 * 1024 * 1024,
    multiplicity_warn: float = 100.0,
    left_row_bytes: int | None = None,
    right_row_bytes: int | None = None,
    blowup_warn: float = 8.0,
) -> dict:
    """Pick a join strategy from persisted stats.

    Decision rule (in order):

    1. a side whose estimated size is under ``broadcast_threshold``
       is broadcast (smaller side preferred when both qualify) — the
       shuffle-free plan;
    2. otherwise shuffle (sort-merge) on ``key``.

    Pass ``left_row_bytes``/``right_row_bytes`` (full-row widths)
    whenever the stats were computed on a COLUMN SUBSET — the
    dtype-width fallback only sees analyzed columns and would
    under-estimate a wide table into a broadcast OOM (see
    :func:`estimate_size_bytes`).

    Independently, ``skew_risk`` is set when either side's mean key
    multiplicity (rows / NDV of ``key``) exceeds
    ``multiplicity_warn`` — the metadata-visible precursor of a skew
    blowup.  Mean multiplicity cannot prove a hot key (that needs
    ``key_skew_report`` / ``heavy_hitters`` over the data), so the
    planner WARNS and names the measurement instead of silently
    salting.

    When BOTH stats carry a :data:`CM_SKETCH` entry of the same
    geometry (``analyze(key_sketch=True)``), the plan additionally
    prices the join's OUTPUT.  Contract: both sketches must have
    been built over the JOIN columns — sketches of unrelated columns
    produce a geometry-valid but meaningless estimate, and since key
    names legitimately differ across sides this is the CALLER's
    responsibility (a ``log.debug`` fires when a recorded sketch
    column differs from ``key``, for diagnosis). ``est_output_rows`` is the
    never-undershooting Cormode-Muthukrishnan inner-product estimate
    (RAW — it includes the estimator's expected collision bias
    ``n_left*n_right/w``, reported as ``est_output_noise_floor``),
    and ``blowup_risk`` fires when the NOISE-ADJUSTED estimate
    exceeds ``blowup_warn`` × the larger input — the
    metadata-visible signature of a quadratic self-join /
    many-to-many key explosion that mean multiplicity alone can
    miss.  Unlike ``skew_risk`` (a heuristic on means), the sketch
    sees the actual frequency-vector product; with the noise floor
    subtracted a fact⋈dim join (output ≈ fact) never trips the flag
    regardless of table size (the raw estimate of any join between
    ~100k+-row tables is collision-dominated at the default w=4096 —
    measured: two 200k-row unique-key tables estimate ~10M raw,
    ~200k adjusted).  Without sketches all three fields are
    ``None``/``False`` — strictly additive.

    Returns ``{strategy, est_left_bytes, est_right_bytes,
    mean_multiplicity_left, mean_multiplicity_right, skew_risk,
    est_output_rows, est_output_noise_floor, blowup_risk}``.
    """
    for side, st in (("left", left_stats), ("right", right_stats)):
        if key not in st:
            raise ValueError(f"join_plan: key {key!r} not in {side} stats")
    lb = estimate_size_bytes(left_stats, row_bytes=left_row_bytes)
    rb = estimate_size_bytes(right_stats, row_bytes=right_row_bytes)

    def mult(st: dict) -> float:
        ks = st[key]
        return (ks["n"] - ks["n_null"]) / max(ks["ndv"], 1)

    lm, rm = mult(left_stats), mult(right_stats)
    if min(lb, rb) <= broadcast_threshold:
        strategy = "broadcast_left" if lb <= rb else "broadcast_right"
    else:
        strategy = "shuffle"
    est_out, noise = _cm_output_estimate(left_stats, right_stats, key)
    n_in = max(left_stats[key]["n"], right_stats[key]["n"])
    return {
        "strategy": strategy,
        "est_left_bytes": lb,
        "est_right_bytes": rb,
        "mean_multiplicity_left": round(lm, 2),
        "mean_multiplicity_right": round(rm, 2),
        "skew_risk": max(lm, rm) > multiplicity_warn,
        "est_output_rows": est_out,
        "est_output_noise_floor": noise,
        "blowup_risk": (
            est_out is not None
            and (est_out - noise) > blowup_warn * n_in
        ),
    }


#: floor for the broadcast MERGE flip: below this estimated target
#: size, shuffling the target is cheap and the broadcast plan's fixed
#: overheads (a second column-pruned target scan + three bounded
#: jobs) dominate — measured at sf0.01: 60k-row target, broadcast
#: 0.38 s vs shuffle 0.28 s for a 364-row micro-batch.
MERGE_BROADCAST_MIN_TARGET = 256 * 1024 * 1024
#: and the target must dwarf the changeset — near-equal sides get
#: nothing from avoiding the shuffle (both plans move ~everything).
MERGE_BROADCAST_MIN_RATIO = 8.0


def merge_strategy_from_plan(
    plan: dict,
    min_target_bytes: int = MERGE_BROADCAST_MIN_TARGET,
    min_ratio: float = MERGE_BROADCAST_MIN_RATIO,
) -> str:
    """Map a :func:`join_plan` decision (left = merge target, right =
    changeset) to an ``apply_changeset`` strategy.

    ``join_plan`` answers "is a side broadcastable"; the merge flip
    needs more — the broadcast merge only wins when the work it avoids
    (shuffling the whole target) exceeds its own overheads, so require
    ALL of: the changeset provably broadcastable (``broadcast_right``),
    the target at least ``min_ratio`` × the changeset, and the target
    over ``min_target_bytes`` in absolute terms.  Everything else —
    including a broadcastable-target plan (``broadcast_left``: the
    shuffle is cheap anyway) — keeps the statistics-free default.
    Shared by ``ParquetSink._merge_strategy`` and the bench's
    crossover probe so the decision can't drift between them."""
    if plan["strategy"] != "broadcast_right":
        return "shuffle"
    if plan["est_left_bytes"] < min_target_bytes:
        return "shuffle"
    if plan["est_left_bytes"] < min_ratio * max(plan["est_right_bytes"], 1):
        return "shuffle"
    return "broadcast"


def confirm_hot_keys(
    stats: dict,
    candidates: list[str],
    min_rows: int,
) -> dict[str, int]:
    """Name the hot keys behind a ``blowup_risk`` flag from sidecar
    metadata alone: CM POINT-query each candidate against the side's
    persisted :data:`CM_SKETCH` (``sketches.cm_point_cells`` — the
    same md5 double-hash the sketch was built with) and keep those
    whose estimated count exceeds ``min_rows`` (pick it near your
    rows-per-task target).  Returns ``{key: est_rows}``; empty when
    no candidate is hot or the stats carry no sketch.

    The sketch cannot ENUMERATE keys — candidates come from the
    caller (the live side's top keys are one bounded ``groupBy
    ... limit`` away; domain defaults like NULL/'' /0 are free
    guesses).  Candidates must be the STRING FORM the sketch was
    built over: single keys are ``cast("string")``; a composite-key
    sidecar (``analyze(key_sketch=True)`` on a multi-key sink)
    sketches the ``"\\x1f"``-joined string of the key columns, so
    candidates must be joined the same way.  Point estimates never
    undershoot, so a returned key really does carry at least
    ~``min_rows - n/w`` rows; zero Spark jobs either way."""
    sk = stats.get(CM_SKETCH)
    if not sk:
        return {}
    from cdc_redshift_spark.operators.sketches import cm_point_cells

    out = {}
    for k in candidates:
        est = cm_point_cells(sk["cells"], sk["d"], sk["w"], str(k))
        if est > min_rows:
            out[str(k)] = est
    return out


def suggest_salt_factor(
    hot_rows: int,
    target_rows_per_task: int = 1_000_000,
    max_factor: int = 256,
) -> int:
    """Derive the salt factor from a CONFIRMED hot key's mass — the
    sizing step between :func:`confirm_hot_keys` and
    :func:`apply_join_plan`, so a caller need not guess.

    ``hot_rows``: the largest confirmed hot key's row estimate (the
    max value of :func:`confirm_hot_keys`'s dict — CM point queries
    only overshoot, so sizing from them errs toward MORE spread,
    never an under-split straggler).  ``target_rows_per_task``: the
    per-task row budget the deployment tolerates — the same quantity
    ``spark.sql.files.maxPartitionBytes`` expresses in bytes for
    scans.  The factor is the smallest power of two whose per-salt
    share fits the budget (power of two keeps shares exactly even
    under ``pmod``), clamped to ``max_factor`` because the dim side
    replicates ``factor``× (past the clamp, replication cost
    dominates what further spreading saves; see salted_join's
    Generate-replicated build side).

    Returns 1 when no salting is needed (hot key already fits one
    task) — callers treat ``factor <= 1`` as "skip the salt".
    Measured effect at factor 32 on a 50%-hot 8M-row join:
    max-task/median 70.8 → 1.83 (SCALE.md round-14)."""
    if hot_rows < 0:
        raise ValueError(f"hot_rows must be >= 0, got {hot_rows}")
    if target_rows_per_task < 1:
        raise ValueError(
            f"target_rows_per_task must be >= 1, got {target_rows_per_task}"
        )
    factor = 1
    while factor * target_rows_per_task < hot_rows and factor < max_factor:
        factor *= 2
    # the loop doubles, so a non-power-of-two max_factor (e.g. 100)
    # could otherwise return an overshoot (128) past the caller's
    # stated replication-cost ceiling
    return min(factor, max_factor)


def apply_join_plan(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    plan: dict,
    how: str = "inner",
    salt_factor: int | None = None,
    discriminator=None,
) -> DataFrame:
    """Execute a :func:`join_plan` decision: attach the broadcast hint
    to the side the stats proved small, or plain equi-join for the
    shuffle strategy (AQE still owns runtime re-optimization).  The
    hint OVERRIDES ``autoBroadcastJoinThreshold`` — that is the point:
    the decision came from committed statistics, not the scan-time
    size guess.

    A plan carrying ``blowup_risk`` (the CM sketches priced the
    output above ``blowup_warn`` × the inputs, noise-adjusted) is
    LOGGED loudly; whether it is also MITIGATED is the caller's
    choice via ``salt_factor``: a shuffle-strategy inner/left join
    executes as :func:`operators.joins.salted_join` (``left`` as the
    skewed fact side spread over ``salt_factor`` sub-partitions per
    key, ``right`` replicated ``salt_factor``×) — row-identical
    output by construction, but no single hot key can exceed
    ~1/``salt_factor`` of its rows in one task.  Confirm the hot key
    first with :func:`confirm_hot_keys` (CM point queries on
    candidate keys): salting a join whose blowup is semantic (a
    missing predicate) just distributes the explosion evenly.
    Broadcast strategies never shuffle on the key, so skew cannot
    concentrate a task there and the salt is skipped.  Salting is
    opt-in (``salt_factor=None`` keeps the warn-only behavior)
    because the right fix may instead be a predicate or
    pre-aggregation — semantic choices the planner must not make."""
    if plan.get("blowup_risk"):
        keys = [on] if isinstance(on, str) else list(on)
        if (
            salt_factor
            and plan["strategy"] == "shuffle"
            and how in ("inner", "left")
        ):
            from cdc_redshift_spark.operators.joins import salted_join

            log.warning(
                "join_plan priced this join's output at ~%s rows "
                "(noise floor %s) — executing the salted-skew form "
                "(factor %d) so no hot key exceeds one task",
                plan.get("est_output_rows"),
                plan.get("est_output_noise_floor"),
                salt_factor,
            )
            return salted_join(
                left,
                right,
                keys,
                factor=salt_factor,
                discriminator=discriminator,
                how=how,
            )
        log.warning(
            "join_plan priced this join's output at ~%s rows "
            "(noise floor %s) — a many-to-many key explosion; "
            "check the join predicate, pre-aggregate a side, or use "
            "salted_join for the hot keys",
            plan.get("est_output_rows"),
            plan.get("est_output_noise_floor"),
        )
    strategy = plan["strategy"]
    if strategy == "broadcast_left":
        return F.broadcast(left).join(right, on, how)
    if strategy == "broadcast_right":
        return left.join(F.broadcast(right), on, how)
    if strategy == "shuffle":
        return left.join(right, on, how)
    raise ValueError(f"apply_join_plan: unknown strategy {strategy!r}")


def row_bytes_of(dtypes: list[tuple[str, str]]) -> int:
    """Full-row width estimate from a ``df.dtypes`` list — the
    ``row_bytes`` input :func:`estimate_size_bytes` wants whenever
    stats cover a column subset (nested/string types fall back to the
    conservative default width)."""
    return sum(_DTYPE_BYTES.get(dt, _DEFAULT_WIDTH) for _, dt in dtypes)


#: stats-dict entry name for a COMPOSITE key's statistics.  Kept out
#: of the column namespace (no real column may start with "__") so
#: per-column consumers can ignore it; its ``n`` matches every other
#: column's, so :func:`estimate_size_bytes` (which callers feed
#: ``row_bytes`` for subset stats anyway) is unaffected.
COMPOSITE_KEY = "__key__"


def df_key_stats(df: DataFrame, key) -> dict:
    """One-job ``join_plan``-shaped statistics for a LIVE DataFrame —
    the changeset side of a merge, which has no ``_ANALYZE`` sidecar
    because it never touched disk.  Row count + null count exact,
    NDV via ``approx_count_distinct`` (HLL++, one pass, no expand —
    the planner only needs multiplicity to an order of magnitude).

    ``key``: a column name, or a sequence of names for a COMPOSITE
    key — the NDV is then computed over ``struct(keys...)`` (the real
    grouping grain; any single column's NDV can under-state composite
    multiplicity arbitrarily) and stored under :data:`COMPOSITE_KEY`.

    Cost: ONE aggregation job over the frame; callers gate it on the
    decision being worth making (the ParquetSink only runs it when
    the target actually has persisted stats to plan against).
    """
    if not isinstance(key, str) and len(key) == 1:
        key = key[0]
    if isinstance(key, str):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.col(key)).alias("nn"),
            F.approx_count_distinct(F.col(key)).alias("ndv"),
        ).first()
        return {
            key: {
                "n": row["n"],
                "n_null": row["n"] - row["nn"],
                "ndv": max(row["ndv"], 1),
                "dtype": dict(df.dtypes)[key],
            }
        }
    kc = F.struct(*[F.col(k) for k in key])
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(kc).alias("ndv"),
    ).first()
    # a struct literal is never NULL row-wise (NULL fields group like
    # groupBy's null buckets), so the composite has no null rows
    return {
        COMPOSITE_KEY: {
            "n": row["n"],
            "n_null": 0,
            "ndv": max(row["ndv"], 1),
            "dtype": "struct",
        }
    }
