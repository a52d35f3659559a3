"""Streaming ANN (IVF) index maintenance: a coarse quantizer trained
OFFLINE (the fixed centroid list every real IVF deployment ships to its
ingest fleet) assigns each arriving vector to its home cell, and the
(id, cell, vector) rows land as ONE deterministic ``batch=<id>``
partition per micro-batch — the exactly-once ingest layout
(streaming/ingest.py): a foreachBatch retry overwrites the SAME
partition with the SAME rows, so replays can never duplicate index
entries, and the searchable index grows O(batch) per trigger without
ever rewriting history (the state is O(corpus); the
RollupMaintainer-style full-snapshot swap would be an O(history) write
per trigger).  :meth:`IvfIndexMaintainer.compact` folds old
partitions when the directory count grows, preserving the ``cell=``
sub-layout so directory pruning survives consolidation.

Because cell assignment is per-row against FIXED centroids, the
streamed index is BIT-IDENTICAL to batch ``ivf_assign`` over the same
rows — which is exactly what the gated query's oracle certifies.

Searches run against the index as of any moment: ``topk`` quantizes
the query to its ``n_probe`` closest cells driver-side (numpy over the
same rounded-cosine ranking the assignment UDF uses) and scans only
those cells' members.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.similarity import (
    _cells_udf,
    cosine_topk_query,
)


class IvfIndexMaintainer:
    """Maintains a cell-partitioned vector index from append
    micro-batches.

    ``cents``: (n_cells, dim) float64 centroid matrix — the offline-
    trained coarse quantizer (e.g. ``operators.similarity._centroids``
    seeds, optionally ``kmeans_refine``-d on a bootstrap corpus).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        cents: np.ndarray,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        cents = np.asarray(cents, dtype=np.float64)
        if cents.ndim != 2 or cents.shape[0] == 0:
            raise ValueError(
                f"centroid matrix must be (n_cells, dim), got {cents.shape}"
            )
        self.spark = spark
        self.path = path
        self.cents = cents
        self.id_col = id_col
        self.vec_col = vec_col
        os.makedirs(path, exist_ok=True)

    def update(self, batch: DataFrame, batch_id: int) -> None:
        """Assign one micro-batch and land it as the ``batch=<id>``
        partition, sub-partitioned by ``cell`` —
        ``batch=<id>/cell=<c>/`` — so a probe's
        ``cell IN (...)`` predicate prunes DIRECTORIES, not rows.
        Deterministic overwrite: a replay writes the same rows to the
        same directory — idempotent by construction."""
        # NULL vectors carry no geometry and would abort the Arrow
        # cell-assignment batch (the similarity.py r15 NULL contract)
        assign = batch.where(F.col(self.vec_col).isNotNull()).select(
            F.col(self.id_col).alias("id"),
            F.col(self.vec_col).alias("v"),
            F.element_at(
                _cells_udf(self.cents, 1)(F.col(self.vec_col)), 1
            ).alias("cell"),
        )
        assign.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(self.path, f"batch={batch_id}")
        )

    def compact(self, upto_batch: int) -> dict:
        """Fold old ``batch=<id>`` partitions via the shared
        exactly-once compaction, PRESERVING the ``cell=`` sub-layout
        (so pruning survives consolidation)."""
        from cdc_redshift_spark.streaming.ingest import compact_batches

        return compact_batches(
            self.spark, self.path, upto_batch, partition_cols=["cell"]
        )

    def index(self) -> DataFrame:
        """(id, cell, v, batch) over every landed partition."""
        return self.spark.read.option("basePath", self.path).parquet(
            self.path
        )

    def topk(
        self, query_vec: list[float], k: int = 10, n_probe: int = 2
    ) -> DataFrame:
        """Top-k by rounded cosine among the ``n_probe`` closest
        cells' members — the query quantizes driver-side with the SAME
        (sim desc, cell asc) ranking the assignment UDF uses, then the
        scan prunes to those cell partitions."""
        q = np.asarray(query_vec, dtype=np.float64)
        C = self.cents
        sim = np.round(
            (C @ q)
            / (np.sqrt((C * C).sum(axis=1)) * np.sqrt((q * q).sum())),
            6,
        )
        order = np.lexsort((np.arange(C.shape[0]), -sim))
        cells = [int(c) + 1 for c in order[:n_probe]]
        cand = self.index().where(F.col("cell").isin(cells))
        return cosine_topk_query(
            cand.select(
                F.col("id").alias(self.id_col),
                F.col("v").alias(self.vec_col),
            ),
            query_vec,
            k=k,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )
