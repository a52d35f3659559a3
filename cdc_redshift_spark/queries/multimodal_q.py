"""Multimodal-column queries: binary media plumbing, oracle-verified.

Media is synthesized deterministically from the documents table (IMG1
containers, payload = UTF-8 text bytes — operators/multimodal.py), so
DuckDB can recompute every metadata/byte statistic from the source
columns directly: the oracle checks the full binary round trip
(pack → mapInPandas decode → stats).  documents text is pure ASCII in
the testdata, so char ops == byte ops on the oracle side.

All oracle-compared stats are integers (sums/counts/dims) — float-free
so the hash compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.multimodal import (
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
    synth_media,
    window_stats,
)
from cdc_redshift_spark.sources.tables import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_media(load_table(spark, sf_dir, "documents"))


def q_mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage: per-doc typed metadata + byte stats."""
    return decode_media(_media(spark, sf_dir)).select(
        "doc_id", "media_type", "width", "height", "channels", "size_bytes", "sum_bytes"
    )


ORACLE_MM_DECODE_META = """
SELECT doc_id,
       'img1' AS media_type,
       CAST(doc_id % 64 + 16 AS INTEGER) AS width,
       CAST(doc_id % 48 + 16 AS INTEGER) AS height,
       3 AS channels,
       CAST(length(text) AS BIGINT) AS size_bytes,
       CAST(list_sum(list_transform(string_split_regex(text, ''), x -> ascii(x))) AS BIGINT) AS sum_bytes
FROM documents
"""


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: every 2nd frame, count + checksum per doc."""
    frames = sample_frames(_media(spark, sf_dir), every_n=2)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("frame_sum").alias("sampled_bytes_sum"),
            F.min(F.length("frame")).alias("frame_len"),
        )
        .orderBy("doc_id")
    )


# Frames are width-strided rows of the text bytes; frame i covers chars
# [i*w, (i+1)*w); sampling keeps even i.  DuckDB rebuilds the same
# slices with substr arithmetic.
ORACLE_MM_FRAME_SAMPLE = """
WITH d AS (
  SELECT doc_id, text, doc_id % 64 + 16 AS w,
         length(text) // (doc_id % 64 + 16) AS n_full
  FROM documents
), f AS (
  SELECT doc_id, w, n_full, fi,
         substr(text, fi * w + 1, w) AS frame
  FROM d, LATERAL unnest(range(0, n_full)) AS t(fi)
  WHERE fi % 2 = 0
)
SELECT doc_id,
       count(*) AS n_frames,
       CAST(sum(list_sum(list_transform(string_split_regex(frame, ''), x -> ascii(x)))) AS BIGINT)
         AS sampled_bytes_sum,
       CAST(min(length(frame)) AS INTEGER) AS frame_len
FROM f
GROUP BY doc_id
ORDER BY doc_id
"""


def q_mm_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: stride-subsample every row to width 8, re-decode,
    verify new geometry + byte stats survive the binary round trip."""
    resized = resize_media(_media(spark, sf_dir), new_width=8)
    return decode_media(resized).select(
        "doc_id", "width", "size_bytes", "sum_bytes"
    )


# After resize to w'=8: payload = n_full rows × 8 samples, sample j of
# row i = byte at i*w + (j*w)//8 (0-based).  substr is 1-based.
ORACLE_MM_RESIZE_ROUNDTRIP = """
WITH d AS (
  SELECT doc_id, text, doc_id % 64 + 16 AS w,
         length(text) // (doc_id % 64 + 16) AS n_full
  FROM documents
), s AS (
  SELECT doc_id, w, n_full, fi, j,
         ascii(substr(text, fi * w + (j * w) // 8 + 1, 1)) AS b
  FROM d,
       LATERAL unnest(range(0, n_full)) AS t(fi),
       LATERAL unnest(range(0, 8)) AS u(j)
)
SELECT d.doc_id,
       8 AS width,
       CAST(d.n_full * 8 AS BIGINT) AS size_bytes,
       CAST(coalesce(sum(s.b), 0) AS BIGINT) AS sum_bytes
FROM d LEFT JOIN s ON d.doc_id = s.doc_id
GROUP BY d.doc_id, d.n_full
"""


def q_mm_features_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage feeding similarity search: byte-histogram
    features, then integer shape stats (dim, non-zero bins, unit-norm
    flag) — the plumbing contract an embedding model plugs into."""
    feats = extract_features(_media(spark, sf_dir), dim=16)
    return feats.select(
        "doc_id",
        F.size("features").alias("dim"),
        F.aggregate(
            "features", F.lit(0), lambda acc, x: acc + F.when(x > 0, 1).otherwise(0)
        ).alias("nonzero_bins"),
        (
            F.abs(
                F.aggregate(
                    "features", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
                )
                - 1.0
            )
            < 1e-5
        ).alias("unit_norm"),
    ).orderBy("doc_id")


ORACLE_MM_FEATURES_SIMILARITY = """
WITH b AS (
  SELECT doc_id, least(ascii(x) * 16 // 256, 15) AS bin
  FROM documents, LATERAL unnest(string_split_regex(text, '')) AS t(x)
  WHERE length(text) > 0
)
SELECT doc_id,
       16 AS dim,
       CAST(count(DISTINCT bin) AS INTEGER) AS nonzero_bins,
       TRUE AS unit_norm
FROM b
GROUP BY doc_id
ORDER BY doc_id
"""


MM_WIN = 64


def q_mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowing: per 64-byte sample window of each media
    payload, integer-exact energy (sum of squares) and peak — the
    frame/hop shape of audio feature extraction, flatMap'd via
    mapInPandas (operators/multimodal.py `window_stats`)."""
    return window_stats(_media(spark, sf_dir), window=MM_WIN)


ORACLE_MM_AUDIO = f"""
WITH chunks AS (
  SELECT doc_id, i AS win_idx,
         substr(text, CAST(i * {MM_WIN} + 1 AS INTEGER), {MM_WIN}) AS chunk
  FROM documents,
       LATERAL unnest(range(0, (greatest(length(text), 1) + {MM_WIN - 1})
                               // {MM_WIN})) AS r(i)
)
SELECT doc_id, win_idx,
       CAST(length(chunk) AS BIGINT) AS n_samples,
       CAST(coalesce(list_sum(list_transform(string_split_regex(chunk, ''),
                                             x -> ascii(x) * ascii(x))), 0)
            AS BIGINT) AS sum_sq,
       CAST(coalesce(list_max(list_transform(string_split_regex(chunk, ''),
                                             x -> ascii(x))), 0)
            AS BIGINT) AS max_sample
FROM chunks
"""


QUERIES = {
    "mm_decode_meta": q_mm_decode_meta,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_resize_roundtrip": q_mm_resize_roundtrip,
    "mm_features_similarity": q_mm_features_similarity,
    "mm_audio_windows": q_mm_audio_windows,
}

ORACLES = {
    "mm_decode_meta": ORACLE_MM_DECODE_META,
    "mm_frame_sample": ORACLE_MM_FRAME_SAMPLE,
    "mm_resize_roundtrip": ORACLE_MM_RESIZE_ROUNDTRIP,
    "mm_features_similarity": ORACLE_MM_FEATURES_SIMILARITY,
    "mm_audio_windows": ORACLE_MM_AUDIO,
}
