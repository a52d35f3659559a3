"""Exact substring-span dedup (operators/spandedup.py).

Load-bearing guarantees:
- every reported span really is covered by length-n windows duplicated
  across >= 2 docs, spans are maximal (island-merged), and a corpus
  with no cross-doc repetition reports nothing;
- ``strip_spans`` removes exactly the covered tokens and passes
  untouched docs through byte-identical;
- short docs (< n tokens) produce no grams and never crash the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_redshift_spark.functions.text import words
from cdc_redshift_spark.operators.spandedup import (
    duplicated_spans,
    strip_spans,
)

BOILER = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_found_and_merged(spark):
    # docs 1 and 2 share the 8-token boilerplate plus one extra common
    # token on each side -> the two overlapping 8-windows must merge
    # into ONE maximal island, not two spans.
    rows = [
        (1, f"u1 common {BOILER} tail1 x y"),
        (2, f"v1 common {BOILER} tail2 p q"),
        (3, "totally unique words only here nothing shared at all"),
    ]
    spans = duplicated_spans(_docs(spark, rows), n=8).collect()
    by_doc = {r.doc_id: (r.span_start, r.span_end) for r in spans}
    # shared run = "common alpha ... theta" (9 tokens) at positions 1-9
    assert by_doc == {1: (1, 9), 2: (1, 9)}


def test_no_cross_doc_repetition_is_empty(spark):
    rows = [
        (1, "one two three four five six seven eight nine"),
        (2, "ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"),
    ]
    assert duplicated_spans(_docs(spark, rows), n=8).count() == 0


def test_within_doc_repetition_alone_does_not_count(spark):
    # the same 8-gram twice in ONE doc is not cross-doc duplication
    rows = [
        (1, f"{BOILER} mid {BOILER}"),
        (2, "totally different content with no overlap whatsoever here ok"),
    ]
    assert duplicated_spans(_docs(spark, rows), n=8).count() == 0


def test_short_docs_are_safe(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "")]
    assert duplicated_spans(_docs(spark, rows), n=8).count() == 0


def test_strip_spans_removes_exactly_covered_tokens(spark):
    rows = [
        (1, f"u1 {BOILER} tail1"),
        (2, f"v2 {BOILER} tail2"),
        (3, "untouched words stay byte identical here always ok yes sure"),
    ]
    docs = _docs(spark, rows)
    spans = duplicated_spans(docs, n=8)
    cleaned = {
        r.doc_id: r.text for r in strip_spans(docs, spans).collect()
    }
    assert cleaned[1] == "u1 tail1"
    assert cleaned[2] == "v2 tail2"
    assert cleaned[3] == rows[2][1]
    # token accounting: removed == span coverage
    cov = {
        r.doc_id: r.span_end - r.span_start + 1 for r in spans.collect()
    }
    orig = {r.doc_id: r.n for r in docs.select(
        "doc_id", F.size(words(F.col("text"))).alias("n")).collect()}
    for d, txt in cleaned.items():
        n_clean = len(txt.split()) if txt else 0
        assert n_clean == orig[d] - cov.get(d, 0)


def test_spans_maximal_and_disjoint_on_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spans = duplicated_spans(docs, n=8)
    rows = spans.orderBy("doc_id", "span_start").collect()
    assert rows, "fixture corpus is known to carry duplicated 8-grams"
    last = {}
    for r in rows:
        assert r.span_end - r.span_start + 1 >= 8
        if r.doc_id in last:
            # strictly disjoint (a touching/overlapping successor
            # means the island merge failed)
            assert r.span_start > last[r.doc_id]
        last[r.doc_id] = r.span_end
