"""Mergeable cardinality sketches: KMV (k-minimum-values) and
Datasketches HLL.

Why this exists: COUNT(DISTINCT) is the one rollup measure that is
neither incrementally maintainable (operators/incremental.py) nor
re-aggregable from a finer rollup (``events_hourly_rollup``'s daily
re-aggregation works for count/sum/max, never for distinct).  At 100 TB
the standard move is to persist a small *mergeable sketch* per rollup
bucket and union sketches at query time — partial aggregation stays
map-side, re-aggregation is associative, and a month-over-distinct query
reads kilobytes instead of rescanning the base table.

Two implementations, deliberately complementary:

- **KMV** (`Bar-Yossef et al. 2002 <doi:10.1007/3-540-45726-7_1>`_):
  keep the ``k`` smallest values of a uniform hash; estimate
  ``(k-1) / theta_k`` where ``theta_k`` is the k-th minimum as a
  fraction of hash space.  Built on the same engine-stable 60-bit md5
  hash as the sampling/gram operators (``operators/corpus.py``), so the
  sketch bytes — and therefore the *estimate itself* — are reproducible
  bit-for-bit in DuckDB SQL.  That makes KMV the value-oracle-checkable
  form: the gate proves lossless mergeability (union of per-day minima
  == global minima), not just "close enough".
- **HLL** (Apache DataSketches via ``F.hll_sketch_agg``): the
  production-scale form — fixed 2^lgk bytes per group vs KMV's k×8 —
  kept for interop (the sketch bytes are the cross-system DataSketches
  format Redshift/Trino/Druid can also merge).  Its estimate is
  implementation-defined, so it gates through pytest tolerance + merge
  equality, not the SQL value oracle.

Scale notes: the sketch build is two bounded shuffles (distinct on
(dims, hash), then per-dims top-k via window — per-group state is O(k),
never a ``collect_set`` of the whole group).  Merges shuffle one row of
k longs per (bucket × dims) group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.corpus import stable_hash60

#: Hash-space size for the 60-bit stable hash (see stable_hash60).
HASH_SPACE = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    dims: list[str] | tuple[str, ...],
    col: str,
    k: int = 256,
) -> DataFrame:
    """Per-``dims`` KMV sketch of ``col``: sorted array of the ``k``
    smallest distinct 60-bit hashes.

    Distinct first (one shuffle on (dims, hash) — map-side combined),
    then ``row_number`` per dims (second shuffle; per-group memory is
    one row, output capped at k rows per group before the final
    ``collect_list`` of at most k longs).
    """
    h = stable_hash60(F.col(col).cast("string"))
    # COUNT(DISTINCT) semantics: NULL values are not counted — and a
    # NULL hash must not CONSUME a k-slot either (review r14: NULLS
    # FIRST gave the NULL rank 1, collect_list then dropped it, so
    # the sketch shrank to k-1 entries and kmv_estimate fell into its
    # "exact" branch — a silent, unbounded underestimate on any
    # NULL-bearing column)
    pairs = (
        df.select(*dims, h.alias("_h"))
        .where(F.col("_h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*dims).orderBy("_h")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*dims)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    )


def kmv_merge(
    sketches: DataFrame,
    dims: list[str] | tuple[str, ...],
    k: int = 256,
) -> DataFrame:
    """Union KMV sketches down to coarser ``dims`` (e.g. drop the day
    column of daily sketches): distinct-union the arrays, keep the k
    smallest.  Lossless: the global k minima are always contained in
    the union of per-part k minima.  Shuffles one k-long array per
    input group."""
    return sketches.groupBy(*dims).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1,
            k,
        ).alias("kmv"),
        F.count(F.lit(1)).alias("n_parts"),
    )


def kmv_estimate(kmv: Column, k: int = 256) -> Column:
    """Distinct-count estimate from a KMV array: exact ``size`` when
    fewer than k hashes were ever seen, else the unbiased
    ``(k-1)/theta_k`` estimator.  Pure double arithmetic over exact
    integers — deterministic across engines."""
    hk = F.element_at(kmv, k)
    return F.when(F.size(kmv) < k, F.size(kmv).cast("double")).otherwise(
        F.lit(float(k - 1) * HASH_SPACE) / hk
    )


def kmv_intersect_estimate(a: Column, b: Column, k: int = 256) -> Column:
    """Distinct-INTERSECTION estimate from two KMV arrays — the set
    operation COUNT(DISTINCT) rollups cannot answer from counts alone
    ("users active in BOTH cohorts").  Standard KMV set arithmetic
    (Beyer et al., SIGMOD'07 "On synopses for distinct-value
    estimation"): form the combined sketch K = k smallest of
    ``a ∪ b``; the match fraction ``|K ∩ a ∩ b| / k`` times the union
    estimate ``(k-1)/theta_K`` estimates the intersection.  When the
    union holds fewer than k hashes BOTH sketches are complete sets
    and the intersection is exact.  Pure Column arithmetic over the
    engine-stable 60-bit hashes — deterministic, so the DuckDB oracle
    reproduces the estimate bit-for-bit."""
    u = F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)
    matches = F.size(F.array_intersect(F.array_intersect(u, a), b))
    est_union = F.lit(float(k - 1) * HASH_SPACE) / F.element_at(u, k)
    return F.when(
        F.size(u) < k, F.size(F.array_intersect(a, b)).cast("double")
    ).otherwise((matches / F.lit(float(k))) * est_union)


def duck_kmv_intersect(k: int, a: str, b: str) -> str:
    """DuckDB SQL mirroring :func:`kmv_intersect_estimate` over two
    list expressions, same operation order so doubles match exactly."""
    const = float(k - 1) * HASH_SPACE
    u = f"list_slice(list_sort(list_distinct(list_concat({a}, {b}))), 1, {k})"
    matches = f"len(list_intersect(list_intersect({u}, {a}), {b}))"
    return (
        f"CASE WHEN len({u}) < {k} "
        f"THEN len(list_intersect({a}, {b}))::DOUBLE "
        f"ELSE ({matches}::DOUBLE / {float(k)!r}) "
        f"* ({const!r} / ({u})[{k}]) END"
    )


def duck_kmv_estimate(k: int, hk_expr: str, nd_expr: str) -> str:
    """DuckDB SQL mirroring :func:`kmv_estimate`: ``hk_expr`` is the
    k-th smallest distinct hash (NULL when fewer than k), ``nd_expr``
    the distinct-hash count."""
    const = float(k - 1) * HASH_SPACE
    return (
        f"CASE WHEN {nd_expr} < {k} THEN CAST({nd_expr} AS DOUBLE) "
        f"ELSE {const!r} / {hk_expr} END"
    )


def hll_rollup(
    df: DataFrame,
    dims: list[str] | tuple[str, ...],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-``dims`` DataSketches HLL sketch bytes of ``col`` (the
    persistable rollup artifact; ~2^lgk bytes per group)."""
    return df.groupBy(*dims).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lgk)).alias("hll")
    )


def hll_merge_estimate(
    sketches: DataFrame,
    dims: list[str] | tuple[str, ...],
) -> DataFrame:
    """Union HLL sketch bytes down to coarser ``dims`` and estimate.
    The union geometry comes from the sketch BYTES themselves
    (``hll_union_agg``), not a parameter — the former ``lgk``
    argument was dead and silently ignored (review r14)."""
    merged = sketches.groupBy(*dims).agg(
        F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return merged.withColumn("n_est", F.hll_sketch_estimate("hll"))


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: log2 histogram with integer sub-bins
# ---------------------------------------------------------------------------
# Quantiles are the other rollup measure (besides distinct) that can't
# be re-aggregated from finer rollups.  The standard mergeable answer
# is a relative-error log histogram (the DDSketch construction —
# Masson/Rim/Lee, VLDB'19): bucket values by order of magnitude with
# fixed sub-bins, count per bucket, merge = add counts.  This variant
# uses base-2 octaves with 16 integer sub-bins over positive integer
# cents, so every bin id and boundary is EXACT integer math on both
# engines (msb via length(bin(x)), sub-bin via shift/mask) — the whole
# sketch, its merge, and the quantile extraction mirror bit-for-bit in
# DuckDB SQL.  Guarantee: a bin spans [lo, lo + lo/(16+sub)), so the
# midpoint estimate is within 1/(2*16) ≈ 3.2 % relative error.

HIST_SUB = 16  # sub-bins per octave
#: (numerator, denominator, label) — ranks are computed as
#: ceil(num*n/den) in EXACT integer math on both engines (a float
#: `0.9 * n` is double math in Spark but DECIMAL math in DuckDB and
#: they disagree at exact multiples — see PARITY.md).
QUANTILES = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))


def hist_bin(col: str) -> Column:
    """Bin id of a positive integer column (by NAME — the shift amount
    is itself a column, which the Python ``F.shiftright`` helper does
    not accept; the SQL function does).

    Values < 16 get exact singleton bins (id = value); above, the id
    is ``msb*16 + sub`` with ``msb = length(bin(v))`` and ``sub`` the
    4 bits after the leading bit — ids never collide across the two
    ranges (msb >= 5 → id >= 80)."""
    return F.expr(
        f"CAST(CASE WHEN {col} < 16 THEN {col} "
        f"ELSE length(bin({col})) * {HIST_SUB} "
        f"     + (shiftright({col}, length(bin({col})) - 5) & 15) "
        f"END AS BIGINT)"
    )


def hist_bin_mid(col: str) -> Column:
    """Midpoint (DOUBLE, exact dyadic rational) of a bin-id column."""
    return F.expr(
        f"CASE WHEN {col} < 16 THEN CAST({col} AS DOUBLE) "
        f"ELSE CAST(shiftleft(({col} % {HIST_SUB}) + {HIST_SUB}, "
        f"                    CAST({col} div {HIST_SUB} AS INT) - 5) AS DOUBLE) "
        f"     + CAST(shiftleft(1L, CAST({col} div {HIST_SUB} AS INT) - 5) AS DOUBLE) / 2.0 "
        f"END"
    )


def hist_sketch(
    df: DataFrame, dims: list[str], value: Column
) -> DataFrame:
    """(dims..., bin_id, cnt) — one count row per (group, bin).

    ``value`` must be a positive integer Column (cents, micros, token
    counts...).  One groupBy shuffle; per-group state is O(bins) ≈
    16 octaves × 16 sub-bins, independent of row count."""
    return (
        df.select(*dims, value.alias("__v"))
        # a NULL value cannot be binned: counting it as a NULL bin_id
        # inflated hist_quantiles' n/cumsums and shifted every
        # quantile (review r14); the contract is positive integers,
        # so NULLs drop — mirroring COUNT(col)'s NULL exclusion
        .where(F.col("__v").isNotNull())
        .select(*dims, hist_bin("__v").alias("bin_id"))
        .groupBy(*dims, "bin_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(sketch: DataFrame, dims: list[str]) -> DataFrame:
    """Re-aggregate a sketch to coarser dims (drop grouping columns,
    add counts) — losslessly, the mergeability property."""
    return sketch.groupBy(*dims, "bin_id").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    dims: list[str],
    quantiles=QUANTILES,
) -> DataFrame:
    """(dims..., q, est) — midpoint of the bin holding each rank.

    rank = ceil(num*n/den) exact-integer; the answer bin is the first
    whose cumulative count reaches the rank (one per-group cumsum
    window + a min-aggregate per quantile)."""
    w = (
        Window.partitionBy(*dims)
        .orderBy("bin_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*dims))
    )
    qs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(num).alias("num"),
                    F.lit(den).alias("den"),
                    F.lit(lbl).alias("q"),
                )
                for num, den, lbl in quantiles
            ]
        )
    ).alias("qq")
    return (
        cum.select(*dims, "bin_id", "cum", "n", qs)
        .select(
            *dims,
            "bin_id",
            "cum",
            F.col("qq.q").alias("q"),
            # ceil(num*n/den) = (num*n + den - 1) div den, all integer
            F.expr("(qq.num * n + qq.den - 1) div qq.den").alias("rank"),
        )
        .where(F.col("cum") >= F.col("rank"))
        .groupBy(*dims, "q")
        .agg(F.min("bin_id").alias("bin_id"))
        .select(*dims, "q", hist_bin_mid("bin_id").alias("est"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimation in fixed space)
# ---------------------------------------------------------------------------

#: Count-Min geometry: d hash rows x w buckets.  Error bound is
#: ``est - exact <= e/w * N`` with probability ``1 - e^-d`` (Cormode &
#: Muthukrishnan 2005, doi:10.1016/j.jalgor.2003.12.001); w=2048, d=4
#: bounds the overestimate at ~0.13% of the stream mass with ~98%
#: confidence, in 64 KiB regardless of key cardinality.
CM_D = 4
CM_W = 2048


def cm_hashes(key_col: Column) -> tuple[Column, Column]:
    """Kirsch–Mitzenmacher double-hash bases: row j probes bucket
    ``(h1 + j*h2) mod w``.  Both bases are the engine-stable 60-bit
    md5 hash (``stable_hash60``), h2 forced odd so the j-progression
    never degenerates; j*h2 < 2^62 keeps the sum inside BIGINT in
    BOTH engines, so the sketch cells — and the estimates — mirror
    bit-for-bit in DuckDB SQL."""
    h1 = stable_hash60(key_col)
    h2 = stable_hash60(F.concat(F.lit("c:"), key_col)).bitwiseOR(F.lit(1))
    return h1, h2


def _cm_cells(
    df: DataFrame, key_col: str, d: int, w: int, *keep: str
) -> DataFrame:
    """The (j, bucket) cell coordinates of every row's key — the ONE
    definition of the CM hash/bucket arithmetic (build, estimate and
    the DuckDB mirrors all derive from it; see ``duck_cm_cells`` /
    ``duck_cm_probe_cells``).  ``keep`` columns ride along."""
    if not 1 <= d <= 8:
        # the h1 + j*h2 progression stays inside BIGINT only for
        # j <= 7 (j*h2 < 8 * 2^60 < 2^63): past that Spark (non-ANSI)
        # would wrap while the DuckDB mirror raises — three
        # "identical" implementations silently disagreeing (review r14)
        raise ValueError(f"CM depth d must be in [1, 8], got {d}")
    h1, h2 = cm_hashes(F.col(key_col).cast("string"))
    return df.select(
        *keep,
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
        h1.alias("__h1"),
        h2.alias("__h2"),
    ).select(
        *keep,
        "j",
        F.pmod(
            F.col("__h1") + F.col("j").cast("long") * F.col("__h2"),
            F.lit(int(w)).cast("long"),
        ).alias("bucket"),
    )


def cm_sketch(
    df: DataFrame,
    key_col: str,
    d: int = CM_D,
    w: int = CM_W,
) -> DataFrame:
    """Build the sketch: ``(j, bucket, cnt)`` rows, at most d*w of
    them whatever the key cardinality.  ONE explode of d small ints
    per input row, then a (j, bucket)-keyed count — the partial
    aggregation collapses each task's contribution to <= d*w cells
    map-side, so shuffle volume is bounded by geometry, not data.
    Unlike the exact ``heavy_hitters`` two-pass (operators/quality),
    the sketch is MERGEABLE: cells add, so per-bucket rollups union
    and re-aggregate without touching the base table."""
    return (
        _cm_cells(df, key_col, d, w)
        .groupBy("j", "bucket")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise sum of sketches with the same geometry — the
    mergeability that makes CM a rollup measure."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = CM_D,
    w: int = CM_W,
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]``: min over the
    d rows of the probed cells (absent cell = 0).  Never
    underestimates.  The sketch side is <= d*w rows BY CONSTRUCTION,
    so it broadcasts; the probe frame never shuffles.  ``d``/``w``
    must match the build geometry."""
    cells = _cm_cells(probes, key_col, d, w, key_col)
    return (
        cells.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def duck_cm_probe_cells(
    probes_sql: str, key_col: str, d: int, w: int
) -> str:
    """DuckDB mirror of the probe side of :func:`cm_estimate`: the
    (key, j, bucket) cells of a probe relation — shares the exact
    hash/bucket arithmetic with :func:`duck_cm_cells` so the two
    mirrors cannot drift from each other or from ``_cm_cells``."""
    return f"""
  SELECT p.{key_col}, u.j,
         (p.h1 + u.j * p.h2) % {w} AS bucket
  FROM (
    SELECT {key_col},
           ('0x' || substr(md5({key_col}), 1, 15))::BIGINT AS h1,
           (('0x' || substr(md5('c:' || {key_col}), 1, 15))::BIGINT | 1) AS h2
    FROM ({probes_sql})
  ) p, UNNEST(range(0, {d})) AS u(j)
"""


def _duck_mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 in DuckDB without overflowing HUGEINT (a full
    64x64 product can exceed signed-128): split a into 32-bit halves,
    so each partial product stays under 2^96."""
    return (
        f"CAST((( (({a}) % 4294967296)::HUGEINT * ({b})::HUGEINT"
        f" + ((((({a}) // 4294967296)::HUGEINT * ({b})::HUGEINT)"
        f" % 4294967296) * 4294967296)"
        f" ) % 18446744073709551616) AS UBIGINT)"
    )


def _duck_rotl64(x: str, r: int) -> str:
    return (
        f"CAST((( ({x})::HUGEINT * {1 << r} ) % 18446744073709551616"
        f" + (({x}) >> {64 - r})::HUGEINT)"
        f" % 18446744073709551616 AS UBIGINT)"
    )


def _duck_fmix64(x: str) -> str:
    a = f"xor({x}, ({x}) >> 33)"
    b = _duck_mul64(a, "18397679294719823053::UBIGINT")  # 0xff51afd7ed558ccd
    c = f"xor({b}, ({b}) >> 33)"
    d = _duck_mul64(c, "14181476777654086739::UBIGINT")  # 0xc4ceb9fe1a85ec53
    return f"xor({d}, ({d}) >> 33)"


def cm_point_cells(
    cells: list[list[int]], d: int, w: int, key: str
) -> int:
    """Pure-Python CM POINT query over collected cells — the driver-
    side frequency estimate of one key, mirroring :func:`cm_estimate`
    exactly (same ``stable_hash60`` md5 bases, same Kirsch-
    Mitzenmacher ``(h1 + j*h2) % w`` probe, min over d rows).  Never
    undershoots the true count; overshoots by collision mass ~n/w.
    Used by ``planner.confirm_hot_keys`` to turn a blowup flag into a
    named hot key from sidecar metadata alone — zero Spark jobs."""
    import hashlib

    h1 = int(hashlib.md5(key.encode("utf-8")).hexdigest()[:15], 16)
    h2 = (
        int(hashlib.md5(("c:" + key).encode("utf-8")).hexdigest()[:15], 16)
        | 1
    )
    idx = {(j, b): c for j, b, c in cells}
    return min(idx.get((j, (h1 + j * h2) % w), 0) for j in range(d))


def duck_hll8_registers(
    source_sql: str, dim: str, key_expr: str, lgk: int
) -> str:
    """DuckDB mirror of the Apache DataSketches HLL_8 register array
    per ``dim`` group — the full-value oracle for queries that emit
    :func:`parse_hll8` output.  Implements the exact public-spec
    pipeline the engine's ``hll_sketch_agg`` input goes through:
    murmur3_x64_128(utf8(key), seed 9001) → slot = h1 & (2^26-1) &
    (k-1), value = min(CLZ64(h2), 62) + 1 → max per slot, zero slots
    materialized via a dim x range(k) grid.

    The murmur3 covers the FULL algorithm (round 13): the 16-byte
    block rounds run as a recursive CTE carrying (h1, h2) across
    ``strlen // 16`` iterations, then the 0–15-byte tail and the
    length-xor/fmix finalization — so keys of ANY length mirror,
    not just the <= 15-byte tail-only domain of rounds 10–12.
    Byte extraction rides ``ord(substr(...))`` (code points), so the
    domain is ASCII keys — what ids and ASCII composites produce; a
    non-ASCII key would need a byte-level decode instead.  64-bit
    wrap math rides HUGEINT with split multiplies
    (:func:`_duck_mul64`); bit ops are DuckDB-native on UBIGINT."""
    k = 1 << lgk
    C1 = "9782798678568883157::UBIGINT"  # 0x87c37b91114253d5
    C2 = "5545529020109919103::UBIGINT"  # 0x4cf5ad432745937f
    seed = "9001::UBIGINT"
    M = "18446744073709551616"

    def le64(off_expr: str, lo: int, hi_expr: str, base: int) -> str:
        # little-endian uint64 of bytes s[off_expr + lo .. off_expr +
        # hi_expr], weighted from byte index `base` (sum < 2^67, fits
        # HUGEINT before the wrap)
        return (
            f"CAST(COALESCE(list_sum(list_transform("
            f"range({lo}, {hi_expr} + 1), "
            f"bi -> ord(substr(s, ({off_expr} + bi)::INT, 1))::HUGEINT"
            f" * (1::HUGEINT << (8 * (bi - {base}))))), 0) % {M}"
            f" AS UBIGINT)"
        )

    return f"""
  WITH RECURSIVE hx_base AS (
    -- DataSketches treats update(null) and update("") as NO-OPS
    -- (no hash, no register): mirror that, or the mirror would emit
    -- a register the engine never wrote (review r14)
    SELECT DISTINCT {dim} AS d, {key_expr} AS s FROM ({source_sql})
    WHERE {key_expr} IS NOT NULL AND {key_expr} <> ''
  ),
  hx_meta AS (
    SELECT d, s, strlen(s) AS t, strlen(s) // 16 AS nb FROM hx_base
  ),
  hx_blk AS (
    SELECT d, s, t, nb, 0 AS i, {seed} AS h1, {seed} AS h2 FROM hx_meta
    UNION ALL
    SELECT d, s, t, nb, i + 1 AS i,
           h1n AS h1,
           CAST((h2z::HUGEINT * 5 + 944331445) % {M} AS UBIGINT) AS h2
    FROM (
      SELECT d, s, t, nb, i, h1n,
             CAST((({_duck_rotl64("h2x", 31)})::HUGEINT
                   + h1n::HUGEINT) % {M} AS UBIGINT) AS h2z
      FROM (
        SELECT d, s, t, nb, i, h1n, xor(h2, k2m) AS h2x
        FROM (
          SELECT d, s, t, nb, i, h2, k2m,
                 CAST((h1z::HUGEINT * 5 + 1390208809) % {M}
                      AS UBIGINT) AS h1n
          FROM (
            SELECT d, s, t, nb, i, h2, k2m,
                   CAST((({_duck_rotl64("h1x", 27)})::HUGEINT
                         + h2::HUGEINT) % {M} AS UBIGINT) AS h1z
            FROM (
              SELECT d, s, t, nb, i, h2, k2m, xor(h1, k1m) AS h1x
              FROM (
                SELECT d, s, t, nb, i, h1, h2,
                  {_duck_mul64(_duck_rotl64(_duck_mul64("k1", C1), 31), C2)} AS k1m,
                  {_duck_mul64(_duck_rotl64(_duck_mul64("k2", C2), 33), C1)} AS k2m
                FROM (
                  SELECT d, s, t, nb, i, h1, h2,
                    {le64("16 * i", 1, "8", 1)} AS k1,
                    {le64("16 * i", 9, "16", 9)} AS k2
                  FROM hx_blk WHERE i < nb
                )
              )
            )
          )
        )
      )
    )
  ),
  hx_done AS (
    SELECT d, s, t, nb, h1, h2, t - 16 * nb AS rem
    FROM hx_blk WHERE i = nb
  ),
  hx_kk AS (
    SELECT d, t, h1, h2, rem,
      {le64("16 * nb", 1, "least(rem, 8)", 1)} AS k1,
      {le64("16 * nb", 9, "rem", 9)} AS k2
    FROM hx_done
  ),
  hx_tail AS (
    SELECT d, t,
      CASE WHEN rem > 0 THEN xor(h1,
        {_duck_mul64(_duck_rotl64(_duck_mul64("k1", C1), 31), C2)})
        ELSE h1 END AS h1a,
      CASE WHEN rem > 8 THEN xor(h2,
        {_duck_mul64(_duck_rotl64(_duck_mul64("k2", C2), 33), C1)})
        ELSE h2 END AS h2a
    FROM hx_kk
  ),
  hx_len AS (
    SELECT d, xor(h1a, t::UBIGINT) AS h1b, xor(h2a, t::UBIGINT) AS h2b
    FROM hx_tail
  ),
  hx_pre AS (
    SELECT d,
      CAST((h1b::HUGEINT + h2b::HUGEINT)
           % 18446744073709551616 AS UBIGINT) AS h1c,
      CAST((h2b::HUGEINT + h1b::HUGEINT + h2b::HUGEINT)
           % 18446744073709551616 AS UBIGINT) AS h2c
    FROM hx_len
  ),
  hx_mix AS (
    SELECT d, {_duck_fmix64("h1c")} AS h1d, {_duck_fmix64("h2c")} AS h2d
    FROM hx_pre
  ),
  hx_fin AS (
    SELECT d,
      CAST((h1d::HUGEINT + h2d::HUGEINT)
           % 18446744073709551616 AS UBIGINT) AS h1,
      CAST((h2d::HUGEINT + h1d::HUGEINT + h2d::HUGEINT)
           % 18446744073709551616 AS UBIGINT) AS h2
    FROM hx_mix
  ),
  hx_sv AS (
    SELECT d,
      CAST((h1 & 67108863::UBIGINT) & {k - 1}::UBIGINT AS INT) AS slot,
      least(CASE WHEN h2 = 0 THEN 64 ELSE 64 - length(bin(h2)) END, 62)
        + 1 AS val
    FROM hx_fin
  ),
  hx_grid AS (
    SELECT dd.d, gs.slot
    FROM (SELECT DISTINCT d FROM hx_base) dd,
         (SELECT CAST(UNNEST(range(0, {k})) AS INT) AS slot) gs
  )
  SELECT g.d AS {dim}, g.slot AS slot,
         CAST(COALESCE(mx.mreg, 0) AS INT) AS reg
  FROM hx_grid g
  LEFT JOIN (
    SELECT d AS md, slot AS mslot, max(val) AS mreg
    FROM hx_sv GROUP BY d, slot
  ) mx ON g.d = mx.md AND g.slot = mx.mslot
"""


def parse_hll8(sketch_bytes: bytes):
    """(lgk, registers) from serialized Apache DataSketches HLL_8
    bytes in HLL array mode (public wire format:
    datasketches.apache.org, HLL preamble spec — 40-byte preamble +
    k register bytes).  Raises if the sketch is still in LIST/SET
    coupon mode (small inputs) or is not HLL_8 — callers choose lgk
    small enough that their corpus promotes (> ~0.75 * 2^lgk
    distinct).  Bounded driver-side work: the input is <= 40 + 2^lgk
    bytes by construction."""
    b = sketch_bytes
    if b[2] != 7:
        raise ValueError(f"not a DataSketches HLL sketch (family {b[2]})")
    cur_mode = b[7] & 0x3
    tgt_type = (b[7] >> 2) & 0x3
    if cur_mode != 2:
        raise ValueError(f"sketch not in HLL array mode (mode {cur_mode})")
    if tgt_type != 2:
        raise ValueError(f"not HLL_8 (tgt type {tgt_type})")
    lgk = b[3]
    k = 1 << lgk
    regs = list(b[40 : 40 + k])
    if len(regs) != k:
        raise ValueError(f"short register array: {len(regs)} != {k}")
    return lgk, regs


def duck_cm_cells(source_sql: str, key_expr: str, d: int, w: int) -> str:
    """DuckDB mirror of :func:`cm_sketch`'s cells over ``source_sql``
    (a relation producing one row per stream element)."""
    return f"""
  SELECT j,
         (('0x' || substr(md5({key_expr}), 1, 15))::BIGINT
          + j * ((('0x' || substr(md5('c:' || {key_expr}), 1, 15))::BIGINT | 1))
         ) % {w} AS bucket,
         count(*) AS cnt
  FROM ({source_sql}), UNNEST(range(0, {d})) AS u(j)
  GROUP BY 1, 2
"""


def cm_inner_product(sk_a: DataFrame, sk_b: DataFrame, d: int) -> DataFrame:
    """Equi-join SIZE estimate from two Count-Min sketches — the
    Cormode-Muthukrishnan inner-product estimator (J. Algorithms 2005
    §4.3): the true join cardinality is the frequency-vector inner
    product ``sum_k cA(k)*cB(k)``; each sketch row j overestimates it
    by its colliding-cell products, so

        est = min_j sum_b A[j,b] * B[j,b]

    NEVER underestimates and errs by <= ||A||_1*||B||_1 / w with
    probability 1 - 2^-d.  THE pre-shuffle planning probe at 100 TB:
    decide broadcast-vs-shuffle or pre-detect a pathological join
    blowup from two geometry-bounded sketches (<= d*w rows each,
    buildable incrementally via :func:`cm_merge`) without touching
    either table.

    A row j absent from the cell join has zero colliding cells, which
    upper-bounds the true product at 0 — so fewer than ``d`` joined
    rows short-circuits the estimate to exactly 0.

    Output: one row ``(n_est,)`` as DECIMAL(38,0): cell-count products
    of two ~1e10-row tables exceed 2^63, and a LONG sum would WRAP
    and silently break the one-sided guarantee — exact 38-digit
    integer arithmetic matches DuckDB's HUGEINT behavior instead.
    """
    dec = "decimal(19,0)"
    prod = (
        sk_a.alias("a")
        .join(sk_b.alias("b"), ["j", "bucket"])
        .groupBy("j")
        .agg(
            F.sum(
                F.col("a.cnt").cast(dec) * F.col("b.cnt").cast(dec)
            ).alias("__p")
        )
    )
    return prod.agg(
        F.when(F.count(F.lit(1)) < d, F.lit(0))
        .otherwise(F.min("__p"))
        .cast("decimal(38,0)")
        .alias("n_est")
    )


def cm_collect(sketch: DataFrame) -> list[list[int]]:
    """Materialize a sketch as plain ``[[j, bucket, cnt], ...]`` rows —
    at most d*w of them BY CONSTRUCTION, so the collect is geometry-
    bounded, never data-bounded.  This is the serialization the
    ``_ANALYZE`` sidecar stores (planner.CM_SKETCH entry): a sketch
    that lives in table metadata can price a join at plan time without
    launching a single job."""
    return [
        [r["j"], r["bucket"], r["cnt"]]
        for r in sketch.select("j", "bucket", "cnt").collect()
    ]


def cm_inner_product_cells(
    cells_a: list[list[int]], cells_b: list[list[int]], d: int
) -> int:
    """Pure-Python :func:`cm_inner_product` over collected cells — the
    planner-side estimator (operators/planner.join_plan): both inputs
    are <= d*w entries, so the product is a bounded driver computation,
    and Python integers are arbitrary-precision, so the same
    no-wrap guarantee as the DECIMAL(38,0) DataFrame path holds.
    Identical semantics: est = min_j sum_b A[j,b]*B[j,b]; a row j with
    zero colliding cells bounds the estimate at exactly 0."""
    b_idx: dict[tuple[int, int], int] = {
        (j, b): c for j, b, c in cells_b
    }
    per_row: dict[int, int] = {}
    for j, b, c in cells_a:
        cb = b_idx.get((j, b))
        if cb is not None:
            per_row[j] = per_row.get(j, 0) + c * cb
    if len(per_row) < d:
        return 0
    return min(per_row.values())


def duck_cm_inner_product(cells_a: str, cells_b: str, d: int) -> str:
    """DuckDB mirror of :func:`cm_inner_product` over two
    :func:`duck_cm_cells` relations (DECIMAL(38,0) like the Spark
    side — BIGINT products would raise on overflow)."""
    return f"""
  SELECT CAST(CASE WHEN count(*) < {d} THEN 0 ELSE min(p) END
              AS DECIMAL(38,0)) AS n_est
  FROM (
    SELECT a.j,
           sum(CAST(a.cnt AS DECIMAL(19,0))
               * CAST(b.cnt AS DECIMAL(19,0))) AS p
    FROM ({cells_a}) a JOIN ({cells_b}) b USING (j, bucket)
    GROUP BY a.j
  )
"""
