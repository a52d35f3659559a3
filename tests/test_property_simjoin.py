"""Property-based exactness of the prefix-filtered similarity join and
the histogram quantile sketch.

Hypothesis generates adversarial corpora (tiny vocabularies so token
overlap is COMMON, duplicate docs, single-token docs) and random
thresholds; prefix filtering must equal the brute-force definition on
every one — the completeness guarantee is combinatorial, so small
nasty cases are exactly where it would break (p-1 prefix off-by-one,
empty-token docs, tau=1 edge).

Spark round-trips are slow → few, dense examples; deadline disabled.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.simjoin import jaccard_similarity_join

# docs over a 6-word vocabulary: overlap everywhere, many exact dups
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=6),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, tau=st.sampled_from([0.34, 0.5, 0.75, 1.0]))
def test_simjoin_always_equals_bruteforce(spark, docs, tau):
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_similarity_join(df, tau=tau, eager=False).collect()
    }
    # brute force in Python on the same normalized token sets
    sets = [set(words) for words in docs]
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            if inter / len(sets[i] | sets[j]) >= tau:
                want.add((i, j))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=80)
)
def test_hist_quantiles_error_bound_random(spark, vals):
    from cdc_redshift_spark.operators.sketches import (
        hist_quantiles,
        hist_sketch,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = hist_sketch(df.withColumn("g", F.lit("all")), dims=["g"], value=F.col("v"))
    est = {r.q: r.est for r in hist_quantiles(sk, dims=["g"]).collect()}
    svals = sorted(vals)
    n = len(svals)
    for num, den, lbl in ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")):
        rank = (num * n + den - 1) // den
        exact = svals[rank - 1]
        if exact < 16:
            assert est[lbl] == exact  # singleton bins are exact
        else:
            assert abs(est[lbl] - exact) / exact <= 1 / 32 + 1e-9
