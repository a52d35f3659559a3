"""Similarity-search queries over the embeddings table, with oracles.

Brute-force variants get exact DuckDB oracles (same double-precision
left-to-right dot products, rounded to 6).  ANN variants (LSH / IVF)
are approximate by design → rows-only driver check, with recall pinned
against the exact baseline in tests/test_similarity_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.similarity import (
    cosine_topk_query,
    ivf_topk,
    knn_all_pairs,
    rh_lsh_topk,
)
from cdc_redshift_spark.sources.tables import load_table


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
    """Exact 3-NN for every vector (brute force baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_all_pairs(emb, k=3)


ORACLE_KNN = """
WITH v AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> x::DOUBLE) AS e,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS n
  FROM embeddings
), pairs AS (
  SELECT a.id AS vec_id, b.id AS neighbor_id,
         round(list_sum(list_transform(range(1, len(a.e) + 1),
                                       i -> a.e[i] * b.e[i])) / (a.n * b.n), 6) AS cosine
  FROM v a JOIN v b ON a.id <> b.id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT vec_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 3
"""


def q_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH buckets (rows-only check;
    recall vs exact baseline pinned in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return rh_lsh_topk(emb, k=3, n_planes=4, n_tables=8)


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF cells (rows-only check; recall pinned in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, k=3, n_cells=8)


QUERIES = {
    "sim_topk_query": q_sim_topk_query,
    "sim_knn_exact": q_sim_knn_exact,
    "sim_lsh_topk": q_sim_lsh_topk,
    "sim_ivf_topk": q_sim_ivf_topk,
}

ORACLES = {
    "sim_topk_query": ORACLE_TOPK_QUERY,
    "sim_knn_exact": ORACLE_KNN,
    # sim_lsh_topk / sim_ivf_topk: approximate → rows-only
}
