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
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(self.index_dir)
        except AnalysisException as e:
            # ONLY first-batch absence may fall back to an empty index;
            # any other read failure (corrupt footer, permissions)
            # must raise — an empty index here would silently admit
            # every duplicate in the batch
            if "PATH_NOT_FOUND" in str(e):
                return spark.createDataFrame([], _INDEX_SCHEMA)
            raise

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
