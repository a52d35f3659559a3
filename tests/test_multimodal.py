"""Multimodal binary-column operators: container round trip, decode,
resize, frame explode, feature extraction, codec-stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.multimodal import (
    HEADER_LEN,
    decode_media,
    extract_features,
    pack_img1,
    resize_media,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.createDataFrame(
        [(0, "a" * 40), (1, "bc" * 30), (65, "xyz" * 20)],
        "doc_id bigint, text string",
    )
    return synth_media(docs).persist()


def test_pack_and_synth_geometry(media_df):
    rows = {r["doc_id"]: bytes(r["media"]) for r in media_df.collect()}
    assert rows[0][:4] == b"IMG1"
    assert len(rows[0]) == HEADER_LEN + 40
    # doc 65: width = 65 % 64 + 16 = 17
    meta = {r["doc_id"]: r for r in decode_media(media_df).collect()}
    assert meta[65]["width"] == 17
    assert meta[0]["width"] == 16
    assert meta[0]["size_bytes"] == 40
    assert meta[0]["sum_bytes"] == 40 * ord("a")
    assert meta[0]["channels"] == 3


def test_decode_keeps_other_columns(media_df):
    out = decode_media(media_df.withColumn("tag", F.lit("t")))
    assert {"doc_id", "tag", "media_type", "width"} <= set(out.columns)
    assert out.where(F.col("tag") != "t").count() == 0


def test_unknown_magic_raises_not_implemented(spark):
    df = spark.createDataFrame([(1, b"JPEGxxxx")], "doc_id bigint, media binary")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(df).collect()


def test_resize_roundtrip(media_df):
    out = decode_media(resize_media(media_df, new_width=8))
    meta = {r["doc_id"]: r for r in out.collect()}
    # doc 0: w=16, 40 bytes → 2 full rows → resized = 2*8 identical 'a's
    assert meta[0]["width"] == 8
    assert meta[0]["size_bytes"] == 16
    assert meta[0]["sum_bytes"] == 16 * ord("a")


def test_sample_frames_explodes(media_df):
    frames = sample_frames(media_df, every_n=1)
    by_doc = (
        frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n = {r["doc_id"]: r["n"] for r in by_doc}
    assert n[0] == 40 // 16  # 2 full 16-byte frames
    first = frames.where((F.col("doc_id") == 0) & (F.col("frame_idx") == 0)).first()
    assert bytes(first["frame"]) == b"a" * 16
    assert first["frame_sum"] == 16 * ord("a")


def test_extract_features_unit_norm(media_df):
    feats = extract_features(media_df, dim=8).collect()
    for r in feats:
        v = r["features"]
        assert len(v) == 8
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5


def test_features_feed_similarity_ops(spark, media_df):
    """Contract: extract_features output slots into the ANN operators."""
    from cdc_redshift_spark.operators.similarity import cosine_topk_query

    feats = extract_features(media_df, dim=8)
    base = feats.select(
        F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    qvec = feats.where(F.col("doc_id") == 0).first()["features"]
    got = cosine_topk_query(base, list(qvec), k=2).collect()
    assert got[0]["vec_id"] == 0  # self-match first
    assert abs(got[0]["cosine"] - 1.0) < 1e-5
