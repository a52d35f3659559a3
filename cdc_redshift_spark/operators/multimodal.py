"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension (BASELINE.json): a training-data pipeline carries
media as ``binary`` columns with typed metadata, and decode /
feature-extract / resize / frame-sample run as Arrow-batched Pandas
functions over ``mapInPandas`` — Python is unavoidable here (codecs),
so the plumbing must be vectorized per batch, never per row.

No image/audio codec libraries exist in this container, so the real
codec calls are STUBBED: binaries in the deterministic ``IMG1`` fake
container format (below) decode for real; any other magic raises
``NotImplementedError`` pointing at the codec hook.  Everything
Spark-side — schemas, batch iteration, explode shapes, partitioning —
is real and oracle-tested.

IMG1 container layout (big-endian):
    bytes 0-3    magic  b"IMG1"
    bytes 4-7    width  (uint32)
    bytes 8-11   height (uint32)
    byte  12     channels (uint8)
    bytes 13-    payload (width-strided rows of sample bytes)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"IMG1"
HEADER_LEN = 13

#: Flat metadata columns produced by decode (flat > nested struct: Arrow
#: struct round-trips through pandas are slower and lose nullability).
DECODE_SCHEMA = (
    "media_type string, width int, height int, channels int, "
    "size_bytes bigint, sum_bytes bigint"
)


def pack_img1(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Build an IMG1 container (test/synth helper; codec-free)."""
    return MAGIC + struct.pack(">IIB", width, height, channels) + payload


def synth_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (doc_id, media binary) in IMG1 format, deterministic.

    width=(doc_id%64)+16, height=(doc_id%48)+16, channels=3, payload =
    the document text's UTF-8 bytes.  Runs as one mapInPandas pass —
    the same shape a real binary-ingest (S3 object fetch per row) has.
    """
    cols = docs.select("doc_id", F.col(text_col).alias("t"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = (pdf["doc_id"] % 64 + 16).astype("int64")
            h = (pdf["doc_id"] % 48 + 16).astype("int64")
            media = [
                pack_img1(int(wi), int(hi), 3, t.encode("utf-8"))
                for wi, hi, t in zip(w, h, pdf["t"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    return cols.mapInPandas(build, "doc_id bigint, media binary")


def _require_img1(buf: bytes) -> tuple[int, int, int, bytes]:
    if buf[:4] != MAGIC:
        raise NotImplementedError(
            "real media decode requires a codec library (PIL/ffmpeg) not "
            "present in this environment; only the IMG1 fake container "
            "decodes here — plug a codec into decode_media/resize_media"
        )
    w, h, c = struct.unpack(">IIB", buf[4:HEADER_LEN])
    return w, h, c, buf[HEADER_LEN:]


def decode_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """binary → typed metadata + byte stats (the 'decode' stage).

    Arrow-batched: one numpy pass per batch.  Keeps all other columns.
    """
    other = [c for c in df.columns if c != media_col]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: pdf[c] for c in other}
            meta = [_require_img1(b) for b in pdf[media_col]]
            rows["media_type"] = ["img1"] * len(meta)
            rows["width"] = np.array([m[0] for m in meta], dtype="int32")
            rows["height"] = np.array([m[1] for m in meta], dtype="int32")
            rows["channels"] = np.array([m[2] for m in meta], dtype="int32")
            rows["size_bytes"] = np.array([len(m[3]) for m in meta], dtype="int64")
            rows["sum_bytes"] = np.array(
                [int(np.frombuffer(m[3], dtype=np.uint8).sum()) for m in meta],
                dtype="int64",
            )
            yield pd.DataFrame(rows)

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in df.select(*other).dtypes
    )
    return df.mapInPandas(decode, f"{out_schema}, {DECODE_SCHEMA}")


def resize_media(
    df: DataFrame, new_width: int, media_col: str = "media"
) -> DataFrame:
    """Deterministic 'resize': stride-subsample payload columns to
    ``new_width`` per row (nearest-neighbor along one axis).

    A real image resize plugs its codec in here; the Spark contract
    (binary in → binary out, batch-vectorized) is what's under test.
    """
    other = [c for c in df.columns if c != media_col]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf[media_col]:
                w, h, c, payload = _require_img1(buf)
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_rows = len(arr) // w if w else 0
                if n_rows == 0:
                    out.append(pack_img1(new_width, h, c, b""))
                    continue
                grid = arr[: n_rows * w].reshape(n_rows, w)
                idx = (np.arange(new_width) * w // new_width).clip(0, w - 1)
                out.append(pack_img1(new_width, h, c, grid[:, idx].tobytes()))
            res = {c: pdf[c] for c in other}
            res[media_col] = out
            yield pd.DataFrame(res)

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in df.select(*other).dtypes
    )
    return df.mapInPandas(resize, f"{out_schema}, {media_col} binary")


def sample_frames(
    df: DataFrame,
    every_n: int = 1,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode a media binary into per-frame rows (video frame-sampling
    shape): frame = one width-strided payload row; keep every Nth.

    Output grows rows (flatMap): (id, frame_idx, frame binary,
    frame_sum) — mapInPandas yielding more rows than it consumes.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, sums = [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[media_col]):
                w, _h, _c, payload = _require_img1(buf)
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_rows = len(arr) // w if w else 0
                for fi in range(0, n_rows, every_n):
                    frame = arr[fi * w : (fi + 1) * w]
                    ids.append(i)
                    idxs.append(fi)
                    blobs.append(frame.tobytes())
                    sums.append(int(frame.sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(blobs, dtype=object),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        frames, f"{id_col} bigint, frame_idx bigint, frame binary, frame_sum bigint"
    )


def window_stats(
    df: DataFrame,
    window: int = 64,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio-style windowed signal statistics over the payload bytes:
    one row per fixed-size sample window (last window may be partial) —
    the frame/hop shape of audio feature extraction (RMS, energy),
    with integer-exact outputs (sum of squares, max) so cross-engine
    comparison needs no float tolerance.  A real audio pipeline plugs
    its PCM decode in where ``_require_img1`` unpacks the payload.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, sumsq, mx = [], [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[media_col]):
                _w, _h, _c, payload = _require_img1(buf)
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                for wi in range(0, max(len(arr), 1), window):
                    chunk = arr[wi : wi + window]
                    ids.append(i)
                    idxs.append(wi // window)
                    ns.append(int(len(chunk)))
                    sumsq.append(int((chunk * chunk).sum()) if len(chunk) else 0)
                    mx.append(int(chunk.max()) if len(chunk) else 0)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sum_sq": pd.Series(sumsq, dtype="int64"),
                    "max_sample": pd.Series(mx, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        stats,
        f"{id_col} bigint, win_idx bigint, n_samples bigint, "
        "sum_sq bigint, max_sample bigint",
    )


def extract_features(
    df: DataFrame, dim: int = 16, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """binary → fixed-dim float feature vector (byte histogram, L2-normed).

    The deterministic stand-in for an embedding model: output column
    ``features array<float>`` feeds straight into the similarity-search
    operators (operators/similarity.py).  One numpy histogram per row,
    Arrow-batched.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for buf in pdf[media_col]:
                _w, _h, _c, payload = _require_img1(buf)
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                v = hist.astype("float32")
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": vecs})

    return df.select(id_col, media_col).mapInPandas(
        feats, f"{id_col} bigint, features array<float>"
    )
