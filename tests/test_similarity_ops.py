

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
