

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
