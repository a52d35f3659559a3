"""Streaming ingest dedup: a foreachBatch stage that admits only
never-seen documents, maintaining a persisted fingerprint index.

The streaming face of ``operators/dedup.incremental_exact_dedup`` —
the shape a 100 TB training-data ingest service actually runs: the
corpus index lives as a parquet table keyed on the fingerprint; each
micro-batch classifies its documents against the index with
batch-proportional work (one fingerprint scan of the batch + one
equi-join probe), appends the accepted documents to the corpus and
their fingerprints to the index.  The corpus itself is never re-read.

Crash consistency: the index append lands BEFORE the accepted-docs
append, so a failure between the two can only over-index (a fp whose
doc write was lost) — re-ingesting that doc classifies it
``dup_of_index`` instead of duplicating it in the corpus; an
at-least-once replay of a whole batch is likewise absorbed because
every fp it would admit is already indexed.  (Appending docs first
would instead admit duplicates on replay — the wrong failure mode for
a dedup stage.)

At scale, bucket both parquet tables by ``fp`` so the per-batch probe
join is co-located (see sinks/parquet_sink bucketing support).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from cdc_redshift_spark.operators.dedup import incremental_exact_dedup

_INDEX_SCHEMA = StructType([StructField("fp", StringType())])


def _read_parquet_or_empty(spark, path: str, schema):
    """Read an index dir; ONLY first-batch absence (PATH_NOT_FOUND)
    may fall back to an empty frame — any other read failure (corrupt
    footer, permissions) must raise, because an empty index would
    silently admit every duplicate in the batch."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e):
            return spark.createDataFrame([], schema)
        raise



class IngestDeduper:
    """``foreachBatch`` callable: admit new docs, grow the fp index.

    ``index_dir``: parquet dir of accepted fingerprints (created on
    first batch).  ``accepted_dir``: parquet dir the admitted
    ``(id, fp, text)`` rows append to.
    """

    def __init__(
        self,
        index_dir: str,
        accepted_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.index_dir = index_dir
        self.accepted_dir = accepted_dir
        self.id_col = id_col
        self.text_col = text_col

    def _read_index(self, spark) -> DataFrame:
        return _read_parquet_or_empty(spark, self.index_dir, _INDEX_SCHEMA)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # at-least-once sources can deliver the same row twice WITHIN a
        # micro-batch; without this the id joins below fan out and the
        # dedup stage itself would emit duplicates
        batch_df = batch_df.dropDuplicates([self.id_col])
        index = self._read_index(spark)
        cls = incremental_exact_dedup(
            index, batch_df, id_col=self.id_col, text_col=self.text_col
        )
        accepted = (
            cls.where(F.col("status") == "new")
            .select("id", "fp")
            .join(
                batch_df.select(
                    F.col(self.id_col).alias("id"),
                    F.col(self.text_col).alias("text"),
                ),
                "id",
            )
        )
        # pin the classification BEFORE the index append: `accepted`
        # reads the index lazily, and appending to a parquet dir while
        # a plan still scans it re-lists the new files
        accepted = accepted.localCheckpoint(eager=True)
        accepted.select("fp").write.mode("append").parquet(self.index_dir)
        accepted.write.mode("append").parquet(self.accepted_dir)


class NearDupIngestDeduper:
    """``foreachBatch`` near-duplicate ingest filter: admit only docs
    that are not MinHash-near-dups of the accepted corpus, maintaining
    a persisted SIGNATURE index (the streaming face of
    ``operators/dedup.incremental_minhash_pairs``).

    Per batch:

    1. sign the batch (one Arrow pass — the corpus is never
       re-shingled; its signatures live in ``index_dir``);
    2. probe batch signatures against the index + the batch itself
       (:func:`incremental_minhash_pairs`);
    3. REJECT batch docs with an index match; cluster the remaining
       batch-batch pairs (connected components) and keep the min-id
       representative per cluster;
    4. append survivors' signatures to the index and their rows to
       ``accepted_dir``.

    Semantics are greedy by arrival order (wave N's acceptances reject
    wave N+1's near-dups) — the standard ingest-dedup contract; the
    invariants "no two accepted docs are near-dups" and "every
    rejection has an accepted witness" are pytest-pinned
    (tests/test_ingest_dedup.py).  Index appends land before doc
    appends for the same replay-safety argument as
    :class:`IngestDeduper`: a replayed batch finds its own ids already
    in the index and rejects itself.

    At 100 TB: bucket the index by a band-key hash so the probe join
    is co-located; per-batch cost is the batch's band rows plus the
    buckets they hit (SCALE.md: flat probe wall as the index grows 4x).
    """

    def __init__(
        self,
        index_dir: str,
        accepted_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 32,
        bands: int = 4,
        jaccard_threshold: float = 0.9,
    ) -> None:
        self.index_dir = index_dir
        self.accepted_dir = accepted_dir
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.bands = bands
        self.jaccard_threshold = jaccard_threshold

    def _read_index(self, spark, batch_df: DataFrame) -> DataFrame:
        # the id type comes from the BATCH column — hardcoding long
        # would crash the first batch for string/int ids (later
        # batches read the real type from the persisted parquet)
        idt = batch_df.schema[self.id_col].dataType.simpleString()
        return _read_parquet_or_empty(
            spark,
            self.index_dir,
            f"id {idt}, sh array<long>, sig array<long>",
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from cdc_redshift_spark.operators.dedup import (
            connected_components,
            incremental_minhash_pairs,
            minhash_frames,
        )

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates([self.id_col]).localCheckpoint(
            eager=True
        )
        frames = minhash_frames(
            batch_df, self.id_col, self.text_col, k=self.k
        ).localCheckpoint(eager=True)
        index = self._read_index(spark, batch_df)
        pairs = incremental_minhash_pairs(
            index,
            frames,
            k=self.k,
            bands=self.bands,
            jaccard_threshold=self.jaccard_threshold,
        )
        hit_index = pairs.where(F.col("match_side") == "existing").select(
            F.col("batch_id").alias("id")
        )
        # a replayed doc carries an id ALREADY in the index; the pair
        # probe deliberately excludes match_id == batch_id, so replay
        # idempotence needs this explicit id-level rejection
        replayed = index.select("id")
        # survivors of the index probe; then one representative per
        # in-batch near-dup cluster (min id)
        alive = (
            frames.select("id")
            .join(hit_index, "id", "left_anti")
            .join(replayed, "id", "left_anti")
        )
        bb = (
            pairs.where(F.col("match_side") == "batch")
            .select(
                F.col("batch_id").alias("id_a"),
                F.col("match_id").alias("id_b"),
            )
            # edges between index-rejected docs must not elect them
            .join(alive.select(F.col("id").alias("id_a")), "id_a")
            .join(alive.select(F.col("id").alias("id_b")), "id_b")
        )
        comp = connected_components(alive, bb)
        keep = (
            comp.groupBy("cluster_id")
            .agg(F.min("id").alias("id"))
            .select("id")
        )
        accepted_frames = frames.join(keep, "id").localCheckpoint(eager=True)
        accepted_frames.write.mode("append").parquet(self.index_dir)
        accepted_frames.select("id").join(
            batch_df.select(
                F.col(self.id_col).alias("id"),
                F.col(self.text_col).alias("text"),
            ),
            "id",
        ).write.mode("append").parquet(self.accepted_dir)
