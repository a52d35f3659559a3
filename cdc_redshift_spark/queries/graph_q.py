"""Link-graph centrality queries (operators/graph.py).

The corpus-curation use: PageRank-family scores over a link graph are
a standard document/host quality prior when assembling web-scale LLM
training corpora.  Here the graph is deterministic from the TPC-H-ish
testdata — customer → supplier edges via orders⋈lineitem — and the
fixed-iteration power method unrolls to pure SQL, so the ENTIRE
iterative computation (teleport, per-round dangling-mass
redistribution, uniform out-distribution) is value-checked against a
DuckDB mirror at 6 dp, the same discipline as the BM25 mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.graph import pagerank
from cdc_redshift_spark.sources.tables import load_table

PR_ITERS = 3
PR_DAMPING = 0.85


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier fulfilment graph (who buys
    from whom): 3 power iterations with damping 0.85.  Suppliers have
    no out-edges, so every round redistributes their dangling mass —
    the oracle mirrors that too.  Output ranks at 6 dp with the node
    id as tiebreak."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    pr = pagerank(edges, iterations=PR_ITERS, damping=PR_DAMPING)
    return pr.select(
        "id", F.round("rank", 6).alias("rank_6dp")
    ).orderBy(F.col("rank_6dp").desc(), "id")


def _pagerank_oracle(iters: int = PR_ITERS, d: float = PR_DAMPING) -> str:
    """Unrolled power iteration in DuckDB — one CTE block per round."""
    sql = """
WITH e AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
         's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), nodes AS (
  SELECT src AS id FROM e UNION SELECT dst AS id FROM e
), od AS (
  SELECT src AS id, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY 1
), meta AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
), r0 AS (
  SELECT n.id, 1.0 / m.n AS rank FROM nodes n CROSS JOIN meta m
)"""
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""", dang{i} AS (
  SELECT coalesce(sum(r.rank), 0) AS m
  FROM {prev} r LEFT JOIN od ON od.id = r.id WHERE od.id IS NULL
), contrib{i} AS (
  SELECT e.dst AS id, sum(r.rank / od.outdeg) AS im
  FROM {prev} r JOIN od ON od.id = r.id JOIN e ON e.src = r.id
  GROUP BY 1
), r{i} AS (
  SELECT n.id,
         (1 - {d}) / m.n + {d} * (coalesce(c.im, 0) + g.m / m.n) AS rank
  FROM nodes n CROSS JOIN meta m CROSS JOIN dang{i} g
  LEFT JOIN contrib{i} c ON c.id = n.id
)"""
        prev = f"r{i}"
    sql += f"""
SELECT id, round(rank, 6) AS rank_6dp FROM {prev}
ORDER BY rank_6dp DESC, id
"""
    return sql


def q_graph_tree_roots(spark, sf_dir):
    """Recursive hierarchy resolution (operators/graph.tree_roots):
    every customer resolves to its root ancestor and depth in the
    synthetic decimal forest parent(k) = floor(k/10) (k >= 10; k < 10
    are roots) — the ``WITH RECURSIVE`` walk Spark SQL lacks,
    implemented as POINTER DOUBLING: O(log depth) self-joins instead
    of O(depth) frontier rounds (a depth-1M chain is ~20 rounds at
    100 TB).  The oracle IS DuckDB's recursive CTE, so the green row
    certifies the doubling algebra against the real recursion."""
    from cdc_redshift_spark.operators.graph import tree_roots
    from cdc_redshift_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    c = load_table(spark, sf_dir, "customer")
    edges = c.select(
        F.col("c_custkey").alias("id"),
        F.when(
            F.col("c_custkey") >= 10, F.floor(F.col("c_custkey") / 10)
        ).alias("parent"),
    )
    return tree_roots(edges).orderBy("id")


ORACLE_TREE_ROOTS = """
WITH RECURSIVE walk AS (
  SELECT c_custkey AS id, c_custkey AS node, CAST(0 AS BIGINT) AS depth
  FROM customer
  UNION ALL
  SELECT id, node // 10, depth + 1 FROM walk WHERE node >= 10
)
SELECT id, CAST(node AS BIGINT) AS root, depth
FROM walk WHERE node < 10
ORDER BY id
"""


QUERIES = {
    "graph_pagerank": q_graph_pagerank,
    "graph_tree_roots": q_graph_tree_roots,
}

ORACLES = {
    "graph_pagerank": _pagerank_oracle(),
    "graph_tree_roots": ORACLE_TREE_ROOTS,
}
