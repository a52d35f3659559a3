"""Similarity-search queries over the embeddings table, with oracles.

Brute-force variants get exact DuckDB oracles (double-precision dot
products rounded to 6 dp).  The ANN variants (LSH / IVF) get FULL
value oracles too: the hyperplanes / centroid seeds are deterministic
(fixed LCG / first-k-by-id), so the DuckDB SQL embeds the same plane
literals and mirrors bucket assignment, candidate generation, scoring
and ranking bit-for-bit.  Each `sim_*_eval` entry additionally rides
the measured recall-vs-exact-kNN audit on every output row, with the
recall arithmetic mirrored in the same oracle (round-8 fold of the
former separate topk/recall entries).

Note on this corpus: the synthetic embeddings are near-uniform random
vectors, LSH's theoretical worst case — true neighbors sit at
θ ≈ 67° barely closer than random pairs at 90°, so no parameter
choice gets high recall at sub-brute-force cost (p = 1 - θ/π gives
0.63 vs 0.50 — almost no gap to amplify).  The recall artifact makes
that measurable instead of hidden; real embedding corpora cluster and
behave far better.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.similarity import (
    cosine_topk_query,
    hyperplanes,
    ivf_topk,
    knn_all_pairs,
    rh_lsh_topk,
    semantic_dedup,
)
from cdc_redshift_spark.sources.tables import load_table

DIM = 64  # embeddings tables are dim-64 at every SF (TESTDATA.md)

# ---- DuckDB fragments mirroring operators/similarity.py ------------------

DUCK_V = """
  SELECT vec_id AS id,
         list_transform(embedding, x -> x::DOUBLE) AS e,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS n
  FROM embeddings
"""

DUCK_COSINE = (
    "round(list_sum(list_transform(range(1, len(va.e) + 1),"
    " i -> va.e[i] * vb.e[i])) / (va.n * vb.n), 6)"
)


def _duck_bucket(planes: list[list[float]]) -> str:
    """Sign-bit bucket id over the double list `e` — same literal
    hyperplanes the Spark UDF multiplies against."""
    bits = []
    for i, plane in enumerate(planes):
        d = " + ".join(f"e[{j + 1}] * {v!r}" for j, v in enumerate(plane))
        bits.append(f"(CASE WHEN ({d}) >= 0.0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def duck_lsh_cand_sql(n_planes: int, n_tables: int, symmetric: bool) -> str:
    """CTE chain v → tag → cand mirroring `_lsh_candidates`."""
    buckets = ", ".join(
        _duck_bucket(hyperplanes(DIM, n_planes, seed=7 + 101 * t)) + f" AS b{t}"
        for t in range(n_tables)
    )
    blist = "[" + ", ".join(f"b{t}" for t in range(n_tables)) + "]"
    cond = "a.id < x.id" if symmetric else "a.id <> x.id"
    return f"""
v AS ({DUCK_V}),
b AS (SELECT id, {buckets} FROM v),
tag AS (
  SELECT id, tbl, {blist}[tbl + 1] AS bucket
  FROM b CROSS JOIN range(0, {n_tables}) AS r(tbl)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, x.id AS id_b
  FROM tag a JOIN tag x ON a.tbl = x.tbl AND a.bucket = x.bucket AND {cond}
)"""


# ---- queries -------------------------------------------------------------


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """Deterministic query point: embedding of the min vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.orderBy("vec_id").select("embedding").first()
    return [float(x) for x in row[0]]


def q_sim_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar vectors to the vec_id=min query point."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_query(emb, _query_vec(spark, sf_dir), k=20)


ORACLE_TOPK_QUERY = """
WITH q AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS qe
  FROM embeddings ORDER BY vec_id LIMIT 1
), v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
)
SELECT vec_id,
       round(list_sum(list_transform(range(1, len(e) + 1), i -> e[i] * qe[i]))
             / (sqrt(list_sum(list_transform(e, x -> x*x)))
                * sqrt(list_sum(list_transform(qe, x -> x*x)))), 6) AS cosine
FROM v, q
ORDER BY cosine DESC, vec_id ASC
LIMIT 20
"""


def q_sim_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-NN for every vector (blocked-GEMM brute force)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_all_pairs(emb, k=3)


ORACLE_KNN = f"""
WITH v AS ({DUCK_V}), pairs AS (
  SELECT va.id AS vec_id, vb.id AS neighbor_id, {DUCK_COSINE} AS cosine
  FROM v va JOIN v vb ON va.id <> vb.id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT vec_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 3
"""


LSH_K, LSH_PLANES, LSH_TABLES = 3, 4, 8


def q_sim_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH buckets, WITH its measured
    quality: every neighbor row carries the index's global recall@3
    vs the exact kNN baseline (round-8 fold of the former
    ``sim_lsh_topk`` + ``sim_lsh_recall`` entries — identical function
    coverage: the full bucketed top-k AND the recall audit, one
    registry slot).  The 1-row recall frame rides a broadcast; the
    oracle mirrors bucket generation (same plane literals), exact
    ranking and the recall arithmetic."""
    emb = load_table(spark, sf_dir, "embeddings")
    # approx feeds the output rows AND the hits semi-join; exact feeds
    # hits AND total -- materialize both once
    approx = rh_lsh_topk(
        emb, k=LSH_K, n_planes=LSH_PLANES, n_tables=LSH_TABLES, dim=DIM
    ).localCheckpoint(eager=True)
    exact = knn_all_pairs(emb, k=LSH_K).persist()
    hits = (
        exact.join(approx, ["vec_id", "neighbor_id"], "left_semi")
        .agg(F.count("*").alias("hits"))
    )
    total = exact.agg(F.count("*").alias("total"))
    rec = (
        hits.crossJoin(total)
        .select(
            F.lit(LSH_K).alias("k"),
            "total",
            "hits",
            F.round(F.col("hits") / F.col("total"), 6).alias("recall"),
        )
        .localCheckpoint(eager=True)
    )
    exact.unpersist()
    return approx.crossJoin(F.broadcast(rec)).select(
        "vec_id", "rank", "neighbor_id", "cosine",
        "k", "total", "hits", "recall",
    )


ORACLE_LSH_EVAL = f"""
WITH {duck_lsh_cand_sql(LSH_PLANES, LSH_TABLES, symmetric=False)},
scored AS (
  SELECT c.id_a, c.id_b, {DUCK_COSINE} AS cosine
  FROM cand c JOIN v va ON va.id = c.id_a JOIN v vb ON vb.id = c.id_b
), approx AS (
  SELECT * FROM (
    SELECT id_a AS vec_id, id_b AS neighbor_id, cosine,
           row_number() OVER (PARTITION BY id_a
                              ORDER BY cosine DESC, id_b ASC) AS rank
    FROM scored
  ) WHERE rank <= {LSH_K}
), all_pairs AS (
  SELECT va.id AS vec_id, vb.id AS neighbor_id, {DUCK_COSINE} AS cosine
  FROM v va JOIN v vb ON va.id <> vb.id
), exact AS (
  SELECT * FROM (
    SELECT vec_id, neighbor_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM all_pairs
  ) WHERE rank <= {LSH_K}
), rec AS (
  SELECT {LSH_K} AS k,
         (SELECT count(*) FROM exact) AS total,
         (SELECT count(*) FROM exact e
          WHERE EXISTS (SELECT 1 FROM approx a
                        WHERE a.vec_id = e.vec_id
                          AND a.neighbor_id = e.neighbor_id)) AS hits
)
SELECT a.vec_id, a.rank, a.neighbor_id, a.cosine,
       rec.k, rec.total, rec.hits,
       round(rec.hits::DOUBLE / rec.total, 6) AS recall
FROM approx a, rec
"""


IVF_K, IVF_CELLS, IVF_PROBE = 3, 8, 2


def _ivf_ctes(n_cells: int, n_probe: int, s: str, refined: bool) -> str:
    """CTE chain (appended after a shared ``v``) ending in ``ranked{s}``,
    mirroring operators/similarity.py `ivf_topk`.

    ``refined=True`` adds one deterministic Lloyd step exactly as
    `kmeans_refine` computes it: home assignment under the seed
    centroids, then per-cell elementwise mean over the id-ORDERED
    member list (DuckDB's list_sum is left-to-right, matching numpy
    cumsum), rounded to 6 dp; empty cells keep their seed."""
    seeds = f"""
c0{s} AS (
  SELECT row_number() OVER (ORDER BY id) AS cell, e AS ce, n AS cn
  FROM (SELECT * FROM v ORDER BY id LIMIT {n_cells})
)"""
    if not refined:
        cents = f"cc{s} AS (SELECT cell, ce, cn FROM c0{s})"
    else:
        cents = f"""
a0{s} AS (
  SELECT id, cell FROM (
    SELECT v.id, c.cell,
           row_number() OVER (PARTITION BY v.id ORDER BY
             round(list_sum(list_transform(range(1, len(v.e) + 1),
                                           i -> v.e[i] * c.ce[i])) / (v.n * c.cn), 6) DESC,
             c.cell ASC) AS rk
    FROM v CROSS JOIN c0{s} c
  ) WHERE rk = 1
),
vl{s} AS (
  SELECT a.cell, list(v.e ORDER BY v.id) AS L
  FROM a0{s} a JOIN v ON v.id = a.id GROUP BY a.cell
),
cm{s} AS (
  SELECT c.cell,
         CASE WHEN l.cell IS NULL THEN c.ce
              ELSE list_transform(range(1, {DIM} + 1),
                                  j -> round(list_sum(list_transform(l.L, x -> x[j]))
                                             / len(l.L), 6))
         END AS ce
  FROM c0{s} c LEFT JOIN vl{s} l ON c.cell = l.cell
),
cc{s} AS (
  SELECT cell, ce, sqrt(list_sum(list_transform(ce, x -> x * x))) AS cn FROM cm{s}
)"""
    return f"""{seeds},
{cents},
cellsim{s} AS (
  SELECT v.id, c.cell,
         round(list_sum(list_transform(range(1, len(v.e) + 1),
                                       i -> v.e[i] * c.ce[i])) / (v.n * c.cn), 6) AS sim
  FROM v CROSS JOIN cc{s} c
),
assigned{s} AS (
  SELECT id, cell, cell_rank FROM (
    SELECT id, cell,
           row_number() OVER (PARTITION BY id ORDER BY sim DESC, cell ASC) AS cell_rank
    FROM cellsim{s}
  ) WHERE cell_rank <= {n_probe}
),
cand{s} AS (
  SELECT DISTINCT q.id AS id_a, d.id AS id_b
  FROM assigned{s} q JOIN assigned{s} d
    ON q.cell = d.cell AND d.cell_rank = 1 AND q.id <> d.id
),
scored{s} AS (
  SELECT c.id_a, c.id_b, {DUCK_COSINE} AS cosine
  FROM cand{s} c JOIN v va ON va.id = c.id_a JOIN v vb ON vb.id = c.id_b
),
ranked{s} AS (
  SELECT id_a AS vec_id,
         row_number() OVER (PARTITION BY id_a
                            ORDER BY cosine DESC, id_b ASC) AS rank,
         id_b AS neighbor_id, cosine
  FROM scored{s}
)"""


def q_sim_ivf_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via multi-probe IVF under BOTH centroid variants —
    'seed' (first n_cells vectors by id) and 'kmeans' (one
    deterministic Lloyd refinement, id-ordered left-to-right sums,
    6-dp rounding) — labeled by ``variant``, with each row carrying
    the per-variant recall@k audit vs exact kNN (round-8 fold of the
    former ``sim_ivf_topk`` + ``sim_ivf_kmeans_topk`` +
    ``sim_ivf_recall`` entries: identical function coverage — both
    index builds, both probes, and the refinement's measured quality
    gain — one registry slot)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = knn_all_pairs(emb, k=IVF_K).persist()
    total = exact.agg(F.count("*").alias("total"))
    parts = []
    for name, refine in (("seed", 0), ("kmeans", 1)):
        approx = ivf_topk(
            emb, k=IVF_K, n_cells=IVF_CELLS, n_probe=IVF_PROBE, refine_iters=refine
        ).localCheckpoint(eager=True)
        hits = exact.join(approx, ["vec_id", "neighbor_id"], "left_semi").agg(
            F.count("*").alias("hits")
        )
        rec = (
            hits.crossJoin(total)
            .select(
                F.lit(IVF_K).alias("k"),
                "total",
                "hits",
                F.round(F.col("hits") / F.col("total"), 6).alias("recall"),
            )
            .localCheckpoint(eager=True)
        )
        parts.append(
            approx.crossJoin(F.broadcast(rec)).select(
                F.lit(name).alias("variant"),
                "vec_id", "rank", "neighbor_id", "cosine",
                "k", "total", "hits", "recall",
            )
        )
    out = parts[0].unionByName(parts[1])
    exact.unpersist()
    return out


ORACLE_IVF_EVAL = f"""
WITH v AS ({DUCK_V}),
{_ivf_ctes(IVF_CELLS, IVF_PROBE, "_s", refined=False)},
{_ivf_ctes(IVF_CELLS, IVF_PROBE, "_k", refined=True)},
all_pairs AS (
  SELECT va.id AS vec_id, vb.id AS neighbor_id, {DUCK_COSINE} AS cosine
  FROM v va JOIN v vb ON va.id <> vb.id
), exact AS (
  SELECT * FROM (
    SELECT vec_id, neighbor_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM all_pairs
  ) WHERE rank <= {IVF_K}
), a_s AS (SELECT vec_id, rank, neighbor_id, cosine
           FROM ranked_s WHERE rank <= {IVF_K}),
a_k AS (SELECT vec_id, rank, neighbor_id, cosine
        FROM ranked_k WHERE rank <= {IVF_K}),
rec_s AS (
  SELECT {IVF_K} AS k,
         (SELECT count(*) FROM exact) AS total,
         (SELECT count(*) FROM exact e WHERE EXISTS (
            SELECT 1 FROM a_s a WHERE a.vec_id = e.vec_id
              AND a.neighbor_id = e.neighbor_id)) AS hits
),
rec_k AS (
  SELECT {IVF_K} AS k,
         (SELECT count(*) FROM exact) AS total,
         (SELECT count(*) FROM exact e WHERE EXISTS (
            SELECT 1 FROM a_k a WHERE a.vec_id = e.vec_id
              AND a.neighbor_id = e.neighbor_id)) AS hits
)
SELECT 'seed' AS variant, a.vec_id, a.rank, a.neighbor_id, a.cosine,
       r.k, r.total, r.hits, round(r.hits::DOUBLE / r.total, 6) AS recall
FROM a_s a, rec_s r
UNION ALL
SELECT 'kmeans' AS variant, a.vec_id, a.rank, a.neighbor_id, a.cosine,
       r.k, r.total, r.hits, round(r.hits::DOUBLE / r.total, 6) AS recall
FROM a_k a, rec_k r
"""


PQ_SUB, PQ_KS, PQ_K = 8, 16, 20
_PQ_SD = DIM // PQ_SUB  # sub-dim


def q_sim_pq_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 for the min-id query point via product
    quantization — codebooks are the sub-vectors of the first 16
    vectors by id (mirrored in SQL), codes are argmin of 6-dp-rounded
    squared L2, scoring is LUT-sum asymmetric distance over codes
    only, never raw vectors — with the recall@20 audit vs the exact
    scan riding every row (round-8 fold of the former ``sim_pq_topk``
    + ``sim_pq_recall`` entries: identical function coverage — encode,
    ADC scan, and the 16× compression's measured quality — one
    registry slot)."""
    from cdc_redshift_spark.operators.similarity import (
        cosine_topk_query,
        pq_topk_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    approx = pq_topk_query(
        emb, qv, k=PQ_K, n_sub=PQ_SUB, ks=PQ_KS
    ).localCheckpoint(eager=True)
    exact = cosine_topk_query(emb, qv, k=PQ_K).select("vec_id")
    hits = exact.join(approx, "vec_id", "left_semi").agg(
        F.count("*").alias("hits")
    )
    rec = hits.select(
        F.lit(PQ_K).alias("k"),
        "hits",
        F.round(F.col("hits") / F.lit(PQ_K), 6).alias("recall"),
    ).localCheckpoint(eager=True)
    return approx.crossJoin(F.broadcast(rec)).select(
        "vec_id", "approx_cosine", "k", "hits", "recall"
    )


def _pq_ctes() -> str:
    """CTE chain v → cb → enc → lut → sc mirroring pq_encode /
    pq_topk_query (0-based codes, left-to-right list_sum everywhere)."""
    return f"""
cb AS (
  SELECT r.m, s.code, s.e[(r.m * {_PQ_SD} + 1):(r.m * {_PQ_SD} + {_PQ_SD})] AS sub
  FROM (SELECT row_number() OVER (ORDER BY id) - 1 AS code, e
        FROM (SELECT * FROM v ORDER BY id LIMIT {PQ_KS})) s
  CROSS JOIN range(0, {PQ_SUB}) r(m)
),
enc AS (
  SELECT id, m, code FROM (
    SELECT v.id, cb.m, cb.code,
           row_number() OVER (PARTITION BY v.id, cb.m ORDER BY
             round(list_sum(list_transform(range(1, {_PQ_SD} + 1),
                   i -> (v.e[cb.m * {_PQ_SD} + i] - cb.sub[i])
                      * (v.e[cb.m * {_PQ_SD} + i] - cb.sub[i]))), 6) ASC,
             cb.code ASC) AS rk
    FROM v CROSS JOIN cb
  ) WHERE rk = 1
),
q AS (SELECT e AS qe, n AS qn FROM v ORDER BY id LIMIT 1),
lut AS (
  SELECT cb.m, cb.code,
         list_sum(list_transform(range(1, {_PQ_SD} + 1),
                                 i -> q.qe[cb.m * {_PQ_SD} + i] * cb.sub[i])) AS dot_qc,
         list_sum(list_transform(cb.sub, x -> x * x)) AS c2
  FROM cb, q
),
sc AS (
  SELECT e.id,
         list_sum(list(l.dot_qc ORDER BY l.m)) AS dotsum,
         list_sum(list(l.c2 ORDER BY l.m)) AS n2sum
  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
  GROUP BY e.id
)"""


ORACLE_PQ_EVAL = f"""
WITH v AS ({DUCK_V}),
{_pq_ctes()},
approx AS (
  SELECT sc.id AS vec_id,
         round(sc.dotsum / (q.qn * sqrt(sc.n2sum)), 6) AS approx_cosine
  FROM sc, q
  ORDER BY approx_cosine DESC, vec_id ASC
  LIMIT {PQ_K}
),
exact AS (
  SELECT va.id FROM v va, q
  ORDER BY round(list_sum(list_transform(range(1, len(va.e) + 1),
                                         i -> va.e[i] * q.qe[i]))
                 / (va.n * q.qn), 6) DESC, va.id ASC
  LIMIT {PQ_K}
),
rec AS (
  SELECT {PQ_K} AS k,
         (SELECT count(*) FROM exact e WHERE EXISTS
            (SELECT 1 FROM approx a WHERE a.vec_id = e.id)) AS hits
)
SELECT a.vec_id, a.approx_cosine,
       rec.k, rec.hits,
       round(rec.hits::DOUBLE / {PQ_K}, 6) AS recall
FROM approx a, rec
"""


def q_emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    compression step before shipping vectors to an ANN index.  Codes
    are computed JVM-side (scale = max|x|/127 per vector, code =
    floor(x/scale + 0.5) — explicit half-up so both engines round
    identically), and the gated aggregates are pure integers: total /
    extreme code values and exact clip checks per label."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = F.transform("embedding", lambda x: x.cast("double"))
    raw_scale = F.array_max(F.transform(d, F.abs)) / F.lit(127.0)
    # all-zero vector -> scale 0 -> x/scale is NaN and the engines
    # diverge; with scale forced to 1 its codes are floor(0.5) = 0,
    # the right quantization of a zero vector
    scale = F.when(raw_scale == 0, F.lit(1.0)).otherwise(raw_scale)
    codes = F.transform(d, lambda x: F.floor(x / scale + F.lit(0.5)))
    return (
        emb.select(
            "label",
            F.aggregate(codes, F.lit(0).cast("long"), lambda a, x: a + x).alias(
                "sum_q"
            ),
            F.array_min(codes).alias("min_q"),
            F.array_max(codes).alias("max_q"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("sum_q").alias("total_q"),
            F.min("min_q").alias("global_min_q"),
            F.max("max_q").alias("global_max_q"),
        )
        .orderBy("label")
    )


ORACLE_INT8 = """
WITH v0 AS (
  SELECT label,
         list_transform(embedding, x -> x::DOUBLE) AS e,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
           AS raw_scale
  FROM embeddings
), v AS (
  SELECT label, e,
         CASE WHEN raw_scale = 0 THEN 1.0 ELSE raw_scale END AS scale
  FROM v0
), q AS (
  SELECT label,
         list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS c
  FROM v
)
SELECT label, count(*) AS n_vectors,
       CAST(sum(list_sum(c)) AS BIGINT) AS total_q,
       min(list_min(c)) AS global_min_q,
       max(list_max(c)) AS global_max_q
FROM q GROUP BY label ORDER BY label
"""


CN_K, CN_SHARDS = 4, 16


def q_emb_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling
    (operators/similarity.py `contrastive_negatives`): 4 pseudo-random
    partners per anchor from its hash shard's ring — reproducible with
    zero RNG state; per-shard rank windows keep the plan parallel at
    any corpus size.  The oracle mirrors the ring arithmetic exactly."""
    from cdc_redshift_spark.operators.similarity import contrastive_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    return contrastive_negatives(emb, k_neg=CN_K, n_shards=CN_SHARDS)


CN_VALUES = ", ".join(f"({{j}})".format(j=j) for j in range(1, CN_K + 1))

ORACLE_CONTRASTIVE = f"""
WITH base AS (
  SELECT vec_id AS id,
         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM embeddings
), ranked AS (
  SELECT id, CAST(h % {CN_SHARDS} AS INT) AS shard,
         row_number() OVER (PARTITION BY h % {CN_SHARDS} ORDER BY h, id) AS r,
         count(*) OVER (PARTITION BY h % {CN_SHARDS}) AS sz
  FROM base
), draws AS (
  SELECT a.id AS anchor_id, a.shard, a.sz, t.j, a.r AS r_a,
         ((a.r - 1 + t.j) % a.sz) + 1 AS r_n
  FROM ranked a, (VALUES {CN_VALUES}) t(j)
  WHERE t.j <= a.sz - 1
)
SELECT d.anchor_id, p.id AS neg_id, CAST(d.j AS INT) AS j
FROM draws d JOIN ranked p ON p.shard = d.shard AND p.r = d.r_n
"""




def q_emb_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal component by power iteration
    (operators/similarity.pca_top_component): the OPQ-style rotation /
    dimensionality-reduction step in front of an ANN index.  The only
    distributed work is two bounded aggregates (d-element mean,
    d^2-cell second moments); three matrix-vector iterations run on
    the collected d x d matrix with 9-dp rounding at every step, so
    the DuckDB oracle — which unrolls the SAME iterations as CTE
    blocks, the PageRank discipline — reproduces the eigenvector
    bit-for-bit and the 6-dp projections hash-match."""
    from cdc_redshift_spark.operators.similarity import pca_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    proj, _, _ = pca_top_component(emb, "vec_id", "embedding", iters=3)
    return proj.orderBy("vec_id")


ORACLE_PCA = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, i - 1 AS i, v[i] AS xi
  FROM e, UNNEST(range(1, len(v) + 1)) AS u(i)
),
n AS (SELECT count(*) AS n FROM e),
mu AS (
  SELECT i, round(sum(xi) / (SELECT n FROM n), 9) AS m
  FROM ex GROUP BY i
),
cov AS (
  SELECT a.i, b.i AS j,
         round(sum(a.xi * b.xi) / (SELECT n FROM n) - ma.m * mb.m, 9)
           AS c
  FROM ex a
  JOIN ex b USING (vec_id)
  JOIN mu ma ON ma.i = a.i
  JOIN mu mb ON mb.i = b.i
  GROUP BY a.i, b.i, ma.m, mb.m
),
v0 AS (SELECT i, 1.0 AS vv FROM mu),
w1 AS (
  SELECT c.i, round(sum(c.c * v0.vv), 9) AS w
  FROM cov c JOIN v0 ON v0.i = c.j GROUP BY c.i
),
v1 AS (
  SELECT i, round(w / sqrt((SELECT sum(w * w) FROM w1)), 9) AS vv
  FROM w1
),
w2 AS (
  SELECT c.i, round(sum(c.c * v1.vv), 9) AS w
  FROM cov c JOIN v1 ON v1.i = c.j GROUP BY c.i
),
v2 AS (
  SELECT i, round(w / sqrt((SELECT sum(w * w) FROM w2)), 9) AS vv
  FROM w2
),
w3 AS (
  SELECT c.i, round(sum(c.c * v2.vv), 9) AS w
  FROM cov c JOIN v2 ON v2.i = c.j GROUP BY c.i
),
v3 AS (
  SELECT i, round(w / sqrt((SELECT sum(w * w) FROM w3)), 9) AS vv
  FROM w3
),
b AS (SELECT round(sum(mu.m * v3.vv), 9) AS b FROM mu JOIN v3 USING (i))
SELECT ex.vec_id,
       round(sum(ex.xi * v3.vv) - (SELECT b FROM b), 6) AS pc1
FROM ex JOIN v3 USING (i)
GROUP BY ex.vec_id
ORDER BY ex.vec_id
"""

def q_cdc_stream_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF index maintenance (streaming/annindex.py): the
    offline-trained coarse quantizer assigns three micro-batches of
    arriving vectors into cell partitions under the exactly-once
    ``batch=<id>`` layout, a REPLAYED batch is proven not to duplicate
    index rows in-query, and the final index must equal batch
    ``ivf_assign`` over the whole table — which is exactly what the
    mirrored-oracle green row certifies (per-row assignment against
    fixed centroids is batch/stream invariant BY CONSTRUCTION; the
    gate proves the landing machinery preserves that)."""
    import shutil
    import tempfile

    from cdc_redshift_spark.operators.similarity import _centroids
    from cdc_redshift_spark.streaming.annindex import IvfIndexMaintainer

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb, IVF_CELLS, "vec_id", "embedding")
    root = tempfile.mkdtemp(prefix="ivf_stream_")
    try:
        m = IvfIndexMaintainer(spark, root, cents)
        for i in range(3):
            m.update(
                emb.where(F.pmod(F.col("vec_id"), F.lit(3)) == i), i
            )
        n_before = m.index().count()
        # foreachBatch retry: same batch id, same rows — must be a
        # clean overwrite, never an append
        m.update(emb.where(F.pmod(F.col("vec_id"), F.lit(3)) == 1), 1)
        if m.index().count() != n_before:
            raise RuntimeError("replayed batch duplicated index rows")
        return (
            m.index()
            .select(F.col("id").alias("vec_id"), "cell")
            .orderBy("vec_id")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE_STREAM_IVF = f"""
WITH v AS ({DUCK_V}),
{_ivf_ctes(IVF_CELLS, 1, "", refined=False)}
SELECT id AS vec_id, cell::INTEGER AS cell
FROM assigned WHERE cell_rank = 1 ORDER BY vec_id
"""


SEM_CELLS, SEM_TAU = 8, 0.35


def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: one k-means (Lloyd)
    refinement of the first-k-by-id seed centroids, then the
    keep-first rule on within-cell rounded cosine >= tau.  The oracle
    mirrors the ENTIRE path — refined centroid math, cell assignment,
    pairwise threshold, survivor rule — in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(
        emb, n_cells=SEM_CELLS, tau=SEM_TAU, refine_iters=1
    )
    return out.orderBy("vec_id")


ORACLE_SEMANTIC_DEDUP = f"""
WITH v AS ({DUCK_V}),
{_ivf_ctes(SEM_CELLS, 1, "", refined=True)},
home AS (SELECT id, cell::INTEGER AS cell FROM assigned WHERE cell_rank = 1),
p AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM home a JOIN home b ON a.cell = b.cell AND a.id < b.id
  JOIN v va ON va.id = a.id
  JOIN v vb ON vb.id = b.id
  WHERE {DUCK_COSINE} >= {SEM_TAU}
)
SELECT h.id AS vec_id, h.cell, (d.id_b IS NULL) AS kept
FROM home h LEFT JOIN (SELECT DISTINCT id_b FROM p) d ON h.id = d.id_b
ORDER BY vec_id
"""

QUERIES = {
    "emb_semantic_dedup": q_emb_semantic_dedup,
    "cdc_stream_ivf_index": q_cdc_stream_ivf_index,
    "emb_pca_projection": q_emb_pca_projection,
    "sim_topk_query": q_sim_topk_query,
    "sim_knn_exact": q_sim_knn_exact,
    "sim_lsh_eval": q_sim_lsh_eval,
    "sim_ivf_eval": q_sim_ivf_eval,
    "sim_pq_eval": q_sim_pq_eval,
    "emb_int8_quantize": q_emb_int8_quantize,
    "emb_contrastive_negatives": q_emb_contrastive_negatives,
}

ORACLES = {
    "emb_semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "cdc_stream_ivf_index": ORACLE_STREAM_IVF,
    "emb_pca_projection": ORACLE_PCA,
    "sim_topk_query": ORACLE_TOPK_QUERY,
    "sim_knn_exact": ORACLE_KNN,
    "sim_lsh_eval": ORACLE_LSH_EVAL,
    "sim_ivf_eval": ORACLE_IVF_EVAL,
    "sim_pq_eval": ORACLE_PQ_EVAL,
    "emb_int8_quantize": ORACLE_INT8,
    "emb_contrastive_negatives": ORACLE_CONTRASTIVE,
}
