"""Unit tests for product quantization (operators/similarity.py).

The query gate checks the full PQ pipeline against DuckDB; these pin
the operator-level invariants: codebook shape/determinism, encode
round-trip of codebook members, and reconstruction quality vs a
random-code baseline.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.similarity import (
    pq_codebooks,
    pq_encode,
    pq_topk_query,
)
from cdc_redshift_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_SUB, KS = 8, 16


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return pq_codebooks(emb, n_sub=N_SUB, ks=KS)


def test_codebook_shape_and_determinism(emb, books):
    dim = len(emb.select("embedding").first()[0])
    assert books.shape == (N_SUB, KS, dim // N_SUB)
    again = pq_codebooks(emb, n_sub=N_SUB, ks=KS)
    assert np.array_equal(books, again)


def test_codebook_members_encode_to_themselves(emb, books):
    """The first KS vectors ARE the codewords, so each must encode to
    its own code in every subspace (distance 0 beats everything, and
    exact-tie duplicates resolve to the lower code on both engines)."""
    first = emb.orderBy("vec_id").limit(KS)
    codes = {r["id"]: r["codes"] for r in pq_encode(first, books).collect()}
    ids = sorted(codes)
    # build the expected code for each seed vector: its own row index,
    # unless an identical sub-vector appears at a lower code (tie rule)
    for row_idx, vid in enumerate(ids):
        for m in range(N_SUB):
            expected = row_idx
            for c in range(row_idx):
                if np.allclose(books[m, c], books[m, row_idx], rtol=0, atol=0):
                    expected = c
                    break
            assert codes[vid][m] == expected, (vid, m)


def test_pq_beats_random_reconstruction(emb, books):
    """Mean squared reconstruction error of PQ codes must beat assigning
    every vector code 0 — i.e. the quantizer actually quantizes."""
    enc = {r["id"]: r["codes"] for r in pq_encode(emb, books).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    sub = books.shape[2]
    err_pq = err_c0 = 0.0
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        rec_pq = np.concatenate([books[m, enc[r["vec_id"]][m]] for m in range(N_SUB)])
        rec_c0 = np.concatenate([books[m, 0] for m in range(N_SUB)])
        err_pq += float(((v - rec_pq) ** 2).sum())
        err_c0 += float(((v - rec_c0) ** 2).sum())
    assert err_pq < err_c0 * 0.9


def test_pq_topk_is_codegen_scan(emb):
    """The ADC scoring scan must be pure JVM expressions over the codes
    column — the only Python stage is the one-off encode UDF."""
    q = [float(x) for x in emb.orderBy("vec_id").select("embedding").first()[0]]
    df = pq_topk_query(emb, q, k=5, n_sub=N_SUB, ks=KS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one Arrow eval (the encode); scoring adds no second one
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    rows = df.collect()
    assert len(rows) == 5
    # the query point itself reconstructs closest to itself -> rank 1
    top = rows[0]
    assert top["approx_cosine"] <= 1.000001
