"""Link-graph analytics for corpus curation: PageRank.

Why this lives in a training-data engine: link-graph centrality is a
standard document-quality prior for web-corpus curation (Common
Crawl-scale pipelines rank hosts/pages by a PageRank-family score and
keep/weight the top of the distribution).  The reference engine has no
graph operator (its scope stops at CDC→warehouse); this is part of the
LLM-pipeline layer, like the dedup/similarity families.

Spark-first design: the power iteration is a DataFrame loop — per
round ONE join (ranks → out-edges) and ONE groupBy(dst) shuffle, both
on the node key, exactly the ``connected_components`` discipline in
``operators/dedup.py``: lineage truncated per round via
``localCheckpoint`` so the plan does not grow with iterations, no
driver-side state beyond the loop counter, and at 100 TB both sides
hash-partition on node id (pre-bucket the edge table by ``src`` to
make every round's join co-located — the rank side then shuffles only
|nodes| rows per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list; returns
    ``(id, rank)`` for every node appearing as src or dst.

    Standard formulation (Brin & Page 1998) with uniform
    teleportation: ``r_{t+1}(v) = (1-d)/N + d * (sum_{u->v}
    r_t(u)/outdeg(u) + dangling_t/N)`` where ``dangling_t`` is the
    rank mass sitting on nodes without out-edges — redistributed
    uniformly, the convention that keeps the ranks a probability
    distribution (sum == 1 every round, a property the tests pin).

    Deterministic and ORACLE-CHECKABLE: a fixed iteration count and
    pure arithmetic mean the whole computation unrolls to SQL — the
    gated query mirrors it in DuckDB at 6 dp, the same discipline as
    the BM25 mirror.  Duplicate edges are collapsed (multi-edges
    would silently re-weight the uniform out-distribution).

    Per-round cost: broadcast of the two scalar aggregates (N is
    computed once; the dangling sum is per-round), one
    ranks⋈out-edges join, one groupBy(dst).  ``iterations`` rounds,
    no growing lineage.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    base = nodes.join(outdeg, "id", "left")  # outdeg NULL => dangling
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    d = float(damping)
    ranks = base.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        dangling = (
            ranks.where(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            ranks.where(F.col("outdeg").isNotNull())
            .join(e, ranks["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("in_mass"))
        )
        ranks = (
            base.join(contrib, "id", "left")
            .withColumn(
                "rank",
                F.lit((1.0 - d) / n_nodes)
                + F.lit(d)
                * (
                    F.coalesce(F.col("in_mass"), F.lit(0.0))
                    + F.lit(dangling / n_nodes)
                ),
            )
            .drop("in_mass")
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", "rank")


def tree_roots(
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_rounds: int = 40,
) -> DataFrame:
    """Resolve every node of a FOREST to its root ancestor and depth —
    the ``WITH RECURSIVE`` hierarchy walk (org charts, category trees,
    bill-of-materials, reply threads) Spark SQL does not ship.

    Spark-first formulation: POINTER DOUBLING (path doubling), the
    textbook parallel-closure trick — state ``(id, ptr, d, done)``
    where ``ptr`` is a known ancestor at distance ``d``; each round
    joins the unresolved states against the full state on
    ``ptr = state.id``, so the known-ancestor distance DOUBLES per
    round: **O(log depth) self-joins** instead of the recursive CTE's
    O(depth) frontier walk — at 100 TB a depth-1M chain resolves in
    ~20 rounds, every round one equi-join hash-partitioned on the
    node key (pre-bucket by ``id`` for co-located rounds).  Lineage
    truncates per round (``localCheckpoint``, the pagerank/CC
    discipline); the only driver state is the unresolved count.

    Input: EXACTLY one row per node; ``parent_col`` NULL marks a
    root.  Returns ``(id, root, depth)`` for every node.  Raises
    loudly on a cycle (or depth > 2^max_rounds — unresolved rows
    survive every round), on a parent id with no node row (a dangling
    reference would otherwise vanish from the inner self-join), and
    on duplicate node ids (each duplicate would fan the self-join
    out multiplicatively).
    """
    dup = (
        edges.groupBy(id_col)
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"tree_roots: duplicate node id {dup[0][0]!r} — input must "
            "have exactly one row per node"
        )
    st = (
        edges.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(parent_col), F.col(id_col)).alias("ptr"),
            F.when(F.col(parent_col).isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("d"),
            F.col(parent_col).isNull().alias("done"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(max_rounds):
        if st.where(~F.col("done")).limit(1).count() == 0:
            break
        pending = st.where(~F.col("done"))
        resolved = st.where(F.col("done"))
        hop = pending.alias("a").join(
            st.select(
                F.col("id").alias("ptr"),
                F.col("ptr").alias("nxt"),
                F.col("d").alias("d2"),
                F.col("done").alias("done2"),
            ).alias("b"),
            "ptr",
            "left",
        ).select(
            F.col("a.id").alias("id"),
            F.col("nxt").alias("ptr"),
            (F.col("a.d") + F.col("d2")).alias("d"),
            F.col("done2").alias("done"),
            F.col("nxt").isNull().alias("__dangling"),
        )
        bad = hop.where(F.col("__dangling")).limit(1).collect()
        if bad:
            raise ValueError(
                f"tree_roots: node {bad[0]['id']!r} points at a parent "
                "with no node row — dangling reference (an inner join "
                "would silently drop the node)"
            )
        st = resolved.unionByName(hop.drop("__dangling")).localCheckpoint(
            eager=False
        )
    n = st.where(~F.col("done")).count()
    if n:
        raise ValueError(
            f"tree_roots: {n} node(s) unresolved after {max_rounds} "
            "doubling rounds — cycle in the parent graph, or depth "
            f"beyond 2^{max_rounds}"
        )
    return st.select("id", F.col("ptr").alias("root"), F.col("d").alias("depth"))
