"""Winnowing fingerprints: production row-based plan == array spec,
plus the scheme's shared-substring guarantee."""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.functions.text import (
    winnow_fingerprints,
    winnow_fingerprints_df,
)

K, W = 8, 4


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        # 3 shares a long substring with 1 (>= k+w-1 chars)
        (3, "SOMETHING quick brown fox jumps NEW TAIL HERE"),
        (4, "short"),  # shorter than k
        (5, "  Weird   WHITESPACE\tand CASE  "),
        (6, "weird whitespace and case"),  # normalizes equal to 5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_plan_matches_array_spec(spark, docs):
    spec = {
        r["doc_id"]: sorted(r["fps"])
        for r in docs.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=K, w=W).alias("fps")
        ).collect()
    }
    prod = {
        r["id"]: sorted(r["fps"])
        for r in winnow_fingerprints_df(docs, k=K, w=W).collect()
    }
    assert spec == prod


def test_shared_substring_shares_fingerprint(spark, docs):
    fps = {
        r["id"]: set(r["fps"])
        for r in winnow_fingerprints_df(docs, k=K, w=W).collect()
    }
    # guarantee: any shared substring of length >= k + w - 1 yields at
    # least one common fingerprint
    assert fps[1] & fps[3]
    # unrelated docs share nothing here
    assert not (fps[2] & fps[4])
    # normalization: differing case/whitespace -> identical sets
    assert fps[5] == fps[6]


def test_short_doc_single_window(spark, docs):
    out = {r["id"]: r["fps"] for r in winnow_fingerprints_df(docs, k=K, w=W).collect()}
    assert len(out[4]) == 1  # "short" < k chars -> one gram, one window


def test_arrow_window_parity(spark):
    """The Arrow per-doc path and the JVM window path must produce
    identical fingerprint SETS per document."""
    from cdc_redshift_spark.functions.text import (
        winnow_fingerprints_df,
        winnow_fingerprints_df_window,
    )
    from cdc_redshift_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    a = {
        r["id"]: sorted(r["fps"])
        for r in winnow_fingerprints_df(docs, k=8, w=4).collect()
    }
    b = {
        r["id"]: sorted(r["fps"])
        for r in winnow_fingerprints_df_window(docs, k=8, w=4).collect()
    }
    assert a == b and len(a) == 200
