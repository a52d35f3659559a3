

def test_pca_top_component_recovers_dominant_direction(spark):
    """On a strongly anisotropic synthetic cloud the 3-iteration power
    component must align with numpy's exact leading eigenvector
    (|cos| > 0.99) and the projections must match X_centered @ v."""
    import numpy as np

    from cdc_redshift_spark.operators.similarity import pca_top_component

    rng = np.random.RandomState(7)
    d, n = 8, 400
    base = rng.randn(d)
    base /= np.linalg.norm(base)
    X = (
        np.outer(rng.randn(n) * 10.0, base)  # dominant direction
        + rng.randn(n, d) * 0.3
        + rng.randn(d) * 2.0  # offset: exercises centering
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    proj, v, mu = pca_top_component(df, iters=3)
    C = np.cov(X.astype(np.float64).T, bias=True)
    evals, evecs = np.linalg.eigh(C)
    lead = evecs[:, -1]
    assert abs(float(np.dot(v, lead))) > 0.99
    got = {r.vec_id: r.pc1 for r in proj.collect()}
    want = (X.astype(np.float64) - np.array(mu)) @ np.array(v)
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-4


def test_semantic_dedup_keep_first_rule(spark):
    """Survivors are exactly the vectors with no smaller-id >= tau
    partner in their cell — including the chain case (b dropped by a
    does NOT resurrect c, because the rule reads the raw pair set)."""
    import numpy as np

    from cdc_redshift_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    n, d = 120, 16
    X = rng.randn(n, d)
    # a near-duplicate chain: 100 ~ 101 ~ 102 (each consecutive pair
    # close, so all share a cell and pair above tau)
    X[101] = X[100] + rng.randn(d) * 0.01
    X[102] = X[101] + rng.randn(d) * 0.01
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    tau = 0.6
    out = semantic_dedup(df, n_cells=4, tau=tau, refine_iters=1)
    rows = {r.vec_id: (r.cell, r.kept) for r in out.collect()}
    assert len(rows) == n  # one row per input, kept or not

    # brute-force mirror of the rule, same rounding
    Xd = X.astype(np.float64)
    norms = np.sqrt((Xd * Xd).sum(axis=1))
    sim = np.round((Xd @ Xd.T) / np.outer(norms, norms), 6)
    cells = {i: rows[i][0] for i in range(n)}
    for i in range(n):
        has_smaller = any(
            sim[j, i] >= tau and cells[j] == cells[i] for j in range(i)
        )
        assert rows[i][1] == (not has_smaller), i

    # the chain landed as expected: 100 kept, 101/102 dropped
    assert rows[100][1] and not rows[101][1] and not rows[102][1]


def test_semantic_dedup_empty_input(spark):
    from cdc_redshift_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = semantic_dedup(df, n_cells=4, tau=0.5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cell", "kept"]


def test_ivf_index_maintainer_topk_and_compaction(spark, tmp_path):
    """Streamed IVF index: topk over probed cells equals a numpy
    brute-force over the same cells' members, and compacting old
    batch partitions (the shared ingest compaction) changes neither
    the index content nor the search result."""
    import numpy as np

    from cdc_redshift_spark.operators.similarity import _centroids
    from cdc_redshift_spark.streaming.annindex import IvfIndexMaintainer

    rng = np.random.RandomState(11)
    n, d = 200, 16
    X = rng.randn(n, d)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    cents = _centroids(df, 4, "vec_id", "embedding")
    m = IvfIndexMaintainer(spark, str(tmp_path / "ivf"), cents)
    for b in range(4):
        m.update(df.where((df.vec_id % 4) == b), b)
    assert m.index().count() == n

    q = [float(x) for x in X[0]]
    got = [(r.vec_id, r.cosine) for r in m.topk(q, k=5, n_probe=2).collect()]

    # numpy mirror: same cell ranking, same rounded cosine ordering
    C = np.asarray(cents)
    qv = np.asarray(q)
    sim_c = np.round(
        (C @ qv) / (np.sqrt((C * C).sum(1)) * np.sqrt((qv * qv).sum())), 6
    )
    probe = set((np.lexsort((np.arange(len(C)), -sim_c))[:2] + 1).tolist())
    Xd = X.astype(np.float64)
    sim_x = np.round(
        (Xd @ qv) / (np.sqrt((Xd * Xd).sum(1)) * np.sqrt((qv * qv).sum())), 6
    )
    cell_of = np.array(
        [r.cell for r in m.index().orderBy("id").collect()]
    )
    members = [i for i in range(n) if cell_of[i] in probe]
    want = sorted(members, key=lambda i: (-sim_x[i], i))[:5]
    assert [g[0] for g in got] == want

    # the batch dirs are sub-partitioned by cell, so a probe's
    # cell IN (...) predicate prunes DIRECTORIES (the docstring's
    # IVF I/O claim): batch=0/cell=<c>/ must exist on disk
    import os

    from pyspark.sql import functions as F

    b0 = tmp_path / "ivf" / "batch=0"
    cell_dirs = [d for d in os.listdir(b0) if d.startswith("cell=")]
    assert cell_dirs, f"expected cell= sub-partitions, got {os.listdir(b0)}"
    plan = m.index().where(F.col("cell").isin([1, 2]))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]

    # compaction (cell layout preserved): fold batches 0-2, index and
    # search unchanged, consolidated dir keeps cell= sub-dirs
    res = m.compact(3)
    assert res["folded_dirs"] == 3
    assert m.index().count() == n
    got2 = [(r.vec_id, r.cosine) for r in m.topk(q, k=5, n_probe=2).collect()]
    assert got2 == got


def test_ivf_index_maintainer_rejects_bad_centroids(spark, tmp_path):
    import numpy as np
    import pytest as _pytest

    from cdc_redshift_spark.streaming.annindex import IvfIndexMaintainer

    with _pytest.raises(ValueError, match="centroid matrix"):
        IvfIndexMaintainer(spark, str(tmp_path / "x"), np.zeros((0, 4)))


def test_semantic_dedup_cell_size_guard(spark):
    import numpy as np
    import pytest as _pytest

    from cdc_redshift_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(1)
    X = rng.randn(50, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    # 2 cells over 50 vectors: some cell must exceed 10
    with _pytest.raises(ValueError, match="exceed max_cell_size"):
        semantic_dedup(df, n_cells=2, tau=0.5, max_cell_size=10)
    # generous bound passes and output is complete
    out = semantic_dedup(df, n_cells=2, tau=0.5, max_cell_size=1000)
    assert out.count() == 50


def test_emb_drift_report_invariants(spark, tmp_path):
    """emb_drift_report: a label whose late half repeats the early
    half exactly scores mean_cosine 1.0; a label whose late half is
    the NEGATED early half scores -1.0; a label with rows in only one
    half reports a NULL cosine (null propagation, not a dropped row).
    vec_id 0..3 -> midpoint 1: ids {0,1} are the reference half."""
    from cdc_redshift_spark.queries.analytics import q_emb_drift_report

    rows = [
        # label 1: identical halves
        (0, [1.0, 2.0, 3.0, 0.0], 1),
        (1, [0.0, 1.0, 0.0, 1.0], 1),
        (2, [1.0, 2.0, 3.0, 0.0], 1),
        (3, [0.0, 1.0, 0.0, 1.0], 1),
        # label 2: late half is the negation
        (0, [1.0, 0.0, 2.0, 0.0], 2),
        (3, [-1.0, 0.0, -2.0, 0.0], 2),
        # label 3: reference-only
        (1, [5.0, 5.0, 5.0, 5.0], 3),
        # label 4: reference mean is the ZERO vector (the two vectors
        # cancel) -- cosine undefined, must be NULL not a crash
        # (Spark 4 ANSI mode raises on unguarded x/0)
        (0, [1.0, 0.0, 0.0, 0.0], 4),
        (1, [-1.0, 0.0, 0.0, 0.0], 4),
        (2, [1.0, 1.0, 1.0, 1.0], 4),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r["label"]: r
        for r in q_emb_drift_report(spark, str(tmp_path)).collect()
    }
    assert out[1]["mean_cosine"] == 1.0
    assert out[1]["n_ref"] == 2 and out[1]["n_cur"] == 2
    assert out[2]["mean_cosine"] == -1.0
    assert out[3]["mean_cosine"] is None
    assert out[3]["n_ref"] == 1 and out[3]["n_cur"] == 0
    assert out[4]["mean_cosine"] is None
    assert out[4]["n_ref"] == 2 and out[4]["n_cur"] == 1


def test_null_embedding_rows_are_excluded_not_fatal(spark):
    """r15 review hunt: one NULL embedding used to abort every
    similarity operator inside numpy (inhomogeneous-shape ValueError
    in the Arrow batch) — or, worse, poison the deterministic
    centroid/codebook seeds.  NULL-vector rows are now excluded at
    every entry point."""
    from cdc_redshift_spark.operators.similarity import (
        cosine_topk_query,
        infer_dim,
        ivf_topk,
        knn_all_pairs,
        pq_codebooks,
        pq_encode,
        rh_lsh_topk,
        semantic_dedup,
    )

    rows = [(i, [float(i % 7 + 1), float(i % 5), 1.0, 0.5]) for i in range(1, 30)]
    rows.insert(0, (0, None))  # NULL vector FIRST (seed-poisoning spot)
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    assert infer_dim(df) == 4  # first() used to hit the NULL row
    got = cosine_topk_query(df, [1.0, 0.0, 1.0, 0.5], k=5).collect()
    assert len(got) == 5 and all(r.cosine is not None for r in got)
    ids = {r.vec_id for r in knn_all_pairs(df, k=2).collect()}
    assert 0 not in ids and len(ids) == 29
    assert rh_lsh_topk(df, k=2, n_planes=2, n_tables=2).count() > 0
    assert ivf_topk(df, k=2, n_cells=4, n_probe=2).count() > 0
    books = pq_codebooks(df, n_sub=2, ks=4)
    assert books.shape == (2, 4, 2)
    assert pq_encode(df, books).count() == 29  # NULL row dropped
    sd = semantic_dedup(df, n_cells=4, tau=0.99)
    assert sd.count() == 29
