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
    f = fact.withColumn("__salt", F.pmod(disc, F.lit(factor)).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    return f.join(d, [*keys, "__salt"], how).drop("__salt")
