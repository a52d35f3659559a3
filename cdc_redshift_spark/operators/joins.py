"""Skew-robust join helpers.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions — but it only works
for sort-merge joins and only per-partition.  :func:`salted_join` is
the explicit, planable alternative for the pathological case AQE can't
fix: ONE join key so hot that a single key's rows exceed an executor
(the classic null-key / default-value / celebrity-entity skew on a
100 TB fact table).

Mechanics: the fact (skewed) side gets a deterministic salt in
[0, factor) hashed from a row-discriminating column, widening each hot
key across `factor` shuffle partitions; the dim side is replicated
`factor`× via explode so every (key, salt) bucket finds its match.
The join result is EXACTLY the plain join's (verified by the
`salted_join_orders` query's oracle, which is written as the plain
join) — only the physical row distribution changes.

Cost model: dim-side bytes × factor extra shuffle — worth it only
when the hot key's row count ≫ rows-per-task; keep `factor` near
(hot-key rows / target task rows).  For dim tables small enough to
broadcast, broadcast instead: salting is for the mid-size dim that
neither broadcasts nor survives a skewed shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | tuple[str, ...],
    factor: int = 8,
    discriminator: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on the shared `on` columns with the fact
    side salted across `factor` sub-partitions per key.

    ``discriminator``: a fact column (or Column) that varies WITHIN a
    join key — its hash spreads the hot key's rows uniformly and
    deterministically (no rand(), so retries and both engines of the
    correctness gate see identical placement).  When omitted, a
    per-row synthetic id (``monotonically_increasing_id``) is used so
    even EXACT-DUPLICATE rows spread — the classic null-key hot key is
    often all-identical rows, where a whole-row hash would put every
    one in the same bucket and silently unsalt the join.  The synthetic
    id makes row PLACEMENT (never results) depend on partitioning, so
    pass an explicit discriminator where reproducible placement
    matters (e.g. the oracle-gated query does).

    Supported ``how``: inner / left (semantics of the plain join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    if discriminator is None:
        disc = F.xxhash64(F.monotonically_increasing_id())
    elif isinstance(discriminator, str):
        disc = F.xxhash64(F.col(discriminator))
    else:
        disc = F.xxhash64(discriminator)
    # underscore-extend the salt column past any real column (the
    # merge-path marker discipline): withColumn on a clashing name
    # would overwrite-and-drop a user's "__salt" data column
    salt = "__salt"
    taken = set(fact.columns) | set(dim.columns)
    while salt in taken:
        salt += "_"
    f = fact.withColumn(salt, F.pmod(disc, F.lit(factor)).cast("int"))
    d = dim.withColumn(
        salt, F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    return f.join(d, [*keys, salt], how).drop(salt)


def fuzzy_name_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str],
    right_cols: tuple[str, str],
    max_dist: int = 1,
    block_len: int = 4,
) -> DataFrame:
    """Entity-resolution fuzzy join: blocking + Levenshtein verify.

    ``left_cols``/``right_cols`` are ``(key_col, name_col)``.  Names
    are canonicalized (lower, trim, collapse whitespace); candidate
    pairs share the first ``block_len`` characters (the BLOCKING key —
    the standard ER recall contract: pairs that differ inside the
    block prefix are not candidates, so pick a prefix that survives
    the expected error modes, e.g. a stable field prefix or a phonetic
    code), then are verified with ``levenshtein <= max_dist``, with a
    free length-difference pre-filter ahead of the O(n·m) distance.

    Output: ``key_a, key_b, name_a, name_b, dist``.

    Scale: one equi-join shuffled on the block key — never an all-pairs
    theta join (plan-pinned).  Block sizes bound verify work; skewed
    blocks (one hot prefix) are the same hot-key problem as any join
    and compose with :func:`salted_join`.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    from cdc_redshift_spark.functions.text import normalize_text

    lk, ln = left_cols
    rk, rn = right_cols

    def norm(c: str) -> Column:
        return normalize_text(F.col(c))

    a = left.select(
        F.col(lk).alias("key_a"),
        norm(ln).alias("name_a"),
        F.substring(norm(ln), 1, block_len).alias("__blk"),
    )
    b = right.select(
        F.col(rk).alias("key_b"),
        norm(rn).alias("name_b"),
        F.substring(norm(rn), 1, block_len).alias("__blk"),
    )
    return (
        a.join(b, "__blk")
        .where(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("key_a", "key_b", "name_a", "name_b", "dist")
    )


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    key: str,
    bits_per_key: int = 18,
    k_hashes: int = 5,
    max_filter_mb: int = 64,
) -> DataFrame:
    """Pre-filter ``big`` to rows whose ``key`` MIGHT appear in
    ``small``'s key set, using ONE Bloom bitmap evaluated inside the
    big side's scan — the semi-join runtime-filter pattern for the
    regime where the small side's key SET is too large to broadcast
    as a hash relation but its Bloom (~``bits_per_key``/8 bytes per
    key, 2.25 B/key at the default) is not.

    NO FALSE NEGATIVES by construction (every present key set its
    bits — same Kirsch–Mitzenmacher double hashing as the sink's file
    index, ``operators/layout._bloom_h1_h2``); false positives pass
    through, so ALWAYS follow with the exact join — the prefilter
    only shrinks what reaches the shuffle.  Probe cost: ``k_hashes``
    codegen ``element_at``/bitwise ops per row, ZERO shuffle, ZERO
    join — the bitmap rides the task binary as an array literal.

    The bitmap is built with one distinct+aggregate over ``small``
    and collected to the driver as m/64 longs — bounded by
    ``max_filter_mb`` (a guard, not a knob to raise blindly: past
    ~64 MB the task-binary broadcast wins you nothing over a plain
    broadcast hash join of the keys themselves).
    """
    from cdc_redshift_spark.operators.layout import _bloom_h1_h2

    if not (1 <= k_hashes <= 8):
        # h1 + i*h2 with two 60-bit hashes exceeds Long.MAX from i=8
        # (ANSI mode turns that into a data-dependent overflow error)
        raise ValueError(f"k_hashes must be in [1, 8], got {k_hashes}")
    bt, st_ = dict(big.dtypes).get(key), dict(small.dtypes).get(key)
    if bt != st_:
        # different types can string-cast differently (5 vs "5.00") —
        # hashes then disagree and a TRUE match is silently dropped,
        # breaking the no-false-negative contract
        raise ValueError(
            f"bloom_prefilter: key {key!r} types differ — big={bt!r}, "
            f"small={st_!r}; cast both sides to one type first"
        )
    keys = (
        small.select(F.col(key).cast("string").alias("__k"))
        .where(F.col("__k").isNotNull())
        .distinct()
        .persist()  # count + bitmap build read it once, not twice
    )
    try:
        n = keys.count()
        if n == 0:
            return big.where(F.lit(False))
        m_bits = max(((n * bits_per_key + 63) // 64) * 64, 16384)
        if m_bits > max_filter_mb * 8 * 1024 * 1024:
            raise ValueError(
                f"bloom_prefilter: {n} keys need a "
                f"{m_bits // 8 // 1024} KB filter "
                f"(> max_filter_mb={max_filter_mb}) — at that size "
                "broadcast the keys as a hash relation instead"
            )
        h1, h2 = _bloom_h1_h2(F.col("__k"))
        positions = F.transform(
            F.sequence(F.lit(0), F.lit(k_hashes - 1)),
            lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m_bits)),
        )
        rows = (
            keys.select(F.explode(positions).alias("pos"))
            .select(
                (F.col("pos") / 64).cast("int").alias("widx"),
                F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
            )
            .groupBy("widx")
            .agg(F.bit_or("bit").alias("word"))
            .collect()
        )
    finally:
        keys.unpersist()
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["widx"]] = r["word"]
    arr = F.lit(words)
    bh1, bh2 = _bloom_h1_h2(F.col(key).cast("string"))
    probed = big.where(F.col(key).isNotNull())
    cond = F.lit(True)
    pos_cols = []
    for i in range(k_hashes):
        c = f"__bloom_pos_{i}"
        pos_cols.append(c)
        probed = probed.withColumn(
            c, F.pmod(bh1 + F.lit(i).cast("long") * bh2, F.lit(m_bits))
        )
        word = F.element_at(arr, (F.col(c) / 64).cast("int") + 1)
        bit = F.expr(f"shiftleft(1L, cast({c} % 64 as int))")
        cond = cond & (word.bitwiseAND(bit) != 0)
    return probed.where(cond).drop(*pos_cols)
