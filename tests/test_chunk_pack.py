"""Chunking / sequence-packing / weighted-sampling properties."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.functions.text import py_normalize_text
from cdc_redshift_spark.operators.corpus import (
    chunk_documents,
    pack_token_stream,
    weighted_sample,
)
from cdc_redshift_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = load_table(spark, SF_DIR, "documents").cache()
    yield d
    # unpersist: a lingering cached `documents` relation substitutes an
    # InMemoryRelation into LATER tests' plans (plan-pin tests break)
    d.unpersist()


def test_chunk_covers_and_overlaps(spark, docs):
    mx, ov = 10, 3
    stride = mx - ov
    out = chunk_documents(docs, max_tokens=mx, overlap=ov)
    rows = out.collect()
    texts = {
        r.doc_id: py_normalize_text(r.text).split(" ")
        for r in docs.select("doc_id", "text").collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    assert set(by_doc) == set(texts)
    for did, toks in texts.items():
        chunks = [by_doc[did][i] for i in range(len(by_doc[did]))]
        n = len(toks)
        expect_nch = 1 if n <= mx else math.ceil((n - mx) / stride) + 1
        assert len(chunks) == expect_nch
        for i, c in enumerate(chunks):
            want = toks[i * stride : i * stride + mx]
            assert c.chunk_text == " ".join(want)
            assert c.n_tokens == len(want)
        # every token index covered
        covered = set()
        for i in range(len(chunks)):
            covered.update(range(i * stride, min(i * stride + mx, n)))
        assert covered == set(range(n))


def test_chunk_plan_is_shuffle_free(spark, docs):
    plan = (
        chunk_documents(docs, max_tokens=24, overlap=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_chunk_rejects_bad_overlap(spark, docs):
    for mx, ov in ((10, 10), (10, -1), (0, 0)):
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=mx, overlap=ov)


def test_pack_manifest_is_contiguous(spark, docs):
    budget, shards = 64, 4
    out = pack_token_stream(docs, budget=budget, n_shards=shards).collect()
    by_shard: dict = {}
    for r in out:
        assert r.shard == r.doc_id % shards
        assert r.seq_first == r.start_offset // budget
        assert r.seq_last == (r.start_offset + r.n_tokens - 1) // budget
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.start_offset == cum  # no gaps, no overlap
            cum += r.n_tokens


def test_weighted_sample_matches_python_mirror(spark, docs):
    k = 50
    got = {r.doc_id for r in weighted_sample(docs, k=k).collect()}
    pri = []
    for r in docs.select("doc_id", "text").collect():
        w = len(py_normalize_text(r.text).split(" "))
        h = int(
            hashlib.md5(f"{r.doc_id}:{r.text}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / float(1 << 60)
        pri.append((u ** (1.0 / w), -r.doc_id, r.doc_id))
    want = {d for _, _, d in sorted(pri, reverse=True)[:k]}
    assert got == want
    assert len(got) == k


def test_weighted_sample_prefers_long_docs(spark, docs):
    sample = weighted_sample(docs, k=100)
    avg_s = sample.agg(F.avg("n_tokens")).collect()[0][0]
    avg_all = (
        docs.select(
            F.size(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
                    " ",
                )
            ).alias("n")
        )
        .agg(F.avg("n"))
        .collect()[0][0]
    )
    assert avg_s > avg_all


def test_weighted_sample_plan_is_topk(spark, docs):
    plan = (
        weighted_sample(docs, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_new_ops_handle_empty_input(spark, docs):
    from cdc_redshift_spark.operators.simjoin import jaccard_similarity_join

    empty = docs.limit(0)
    assert jaccard_similarity_join(empty, tau=0.9, eager=False).count() == 0
    assert chunk_documents(empty, max_tokens=8).count() == 0
    assert pack_token_stream(empty, budget=64).count() == 0
    assert weighted_sample(empty, k=5).count() == 0


def test_pack_random_lengths_property(spark):
    # adversarial: docs longer than the budget, length-1 docs, and a
    # shard with a single doc — the manifest must stay gapless and the
    # seq ids must tile the stream exactly
    import random

    rnd = random.Random(7)
    rows = [
        (i, " ".join(f"t{j}" for j in range(rnd.randint(1, 150))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget, shards = 100, 3
    out = pack_token_stream(df, budget=budget, n_shards=shards).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.start_offset == cum
            assert r.seq_first == cum // budget
            assert r.seq_last == (cum + r.n_tokens - 1) // budget
            cum += r.n_tokens
        # total sequences tile the stream
        assert rs[-1].seq_last == (cum - 1) // budget
