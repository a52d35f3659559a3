"""Local Parquet sink with versioned snapshots and native merge.

Plays the role Redshift plays for the reference (stage + postactions
merge — SURVEY §2.2), but runs the merge in Spark so it's testable
without a warehouse.  Each ``apply_changeset`` writes a new immutable
snapshot version and flips a pointer file — the same
write-new-then-swap discipline as Delta/Iceberg commits, minus the
format (those libs aren't available in this environment).

Layout:
    root/<db>/<table>/v<N>/part-*.parquet
    root/<db>/<table>/_LATEST        # contains "N"

Scale notes: a full-snapshot rewrite per batch is O(table) — fine for
tests, wrong at 100 TB.  ``partition_cols`` (default ``ts_date``, the
reference's Redshift sortkey — glue_docdb_redshift_cdc.py:180) enables
the partition-pruned variant: only partitions containing changed keys
are rewritten, so cost is O(touched partitions), the same contract a
Delta MERGE gives.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.plans.merge import apply_changeset as merge_apply
from cdc_redshift_spark.sinks.base import Sink


class ParquetSink(Sink):
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keys: Sequence[str] = ("key",),
        ts_col: str = "ts_ms",
        tiebreak_col: str = "offset",
        partition_cols: Sequence[str] = (),
    ):
        self.spark = spark
        self.root = root
        self.keys = list(keys)
        self.ts_col = ts_col
        self.tiebreak_col = tiebreak_col
        self.partition_cols = list(partition_cols)
        os.makedirs(root, exist_ok=True)

    # -- catalog -----------------------------------------------------------
    def _dir(self, db: str, table: str) -> str:
        return os.path.join(self.root, db, table)

    def _latest_version(self, db: str, table: str) -> int | None:
        ptr = os.path.join(self._dir(db, table), "_LATEST")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip())

    def table_exists(self, db: str, table: str) -> bool:
        return self._latest_version(db, table) is not None

    def read_table(
        self,
        spark: SparkSession,
        db: str,
        table: str,
        include_tombstones: bool = False,
    ) -> DataFrame | None:
        """Current state.  Delete tombstones (op='delete') are stored so
        late events for deleted keys can't resurrect them across
        micro-batches; readers see them filtered unless asked."""
        v = self._latest_version(db, table)
        if v is None:
            return None
        df = spark.read.parquet(os.path.join(self._dir(db, table), f"v{v}"))
        if not include_tombstones and "op" in df.columns:
            df = df.where(F.col("op") != "delete")
        return df

    def list_tables(self) -> list[tuple[str, str]]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for db in sorted(os.listdir(self.root)):
            dbdir = os.path.join(self.root, db)
            if not os.path.isdir(dbdir):
                continue
            for table in sorted(os.listdir(dbdir)):
                if self.table_exists(db, table):
                    out.append((db, table))
        return out

    # -- merge -------------------------------------------------------------
    def apply_changeset(self, db: str, table: str, changes: DataFrame) -> None:
        """Merge one table's deduped ChangeSet slice into the snapshot."""
        target = self.read_table(self.spark, db, table, include_tombstones=True)
        new_state = merge_apply(
            target,
            changes,
            keys=self.keys,
            ts_col=self.ts_col,
            tiebreak_col=self.tiebreak_col,
            keep_tombstones=True,
        )
        self._commit(db, table, new_state)

    def expire_tombstones(self, db: str, table: str, before_ts_ms: int) -> None:
        """Compact away tombstones older than the lateness horizon.

        At scale tombstones accumulate one row per deleted key; once no
        event older than ``before_ts_ms`` can still arrive, they are
        dead weight and a periodic compaction drops them.
        """
        cur = self.read_table(self.spark, db, table, include_tombstones=True)
        if cur is None:
            return
        keep = cur.where(
            (F.col("op") != "delete") | (F.col(self.ts_col) >= F.lit(before_ts_ms))
        )
        self._commit(db, table, keep)

    def overwrite(self, db: str, table: str, state: DataFrame) -> None:
        """Direct snapshot write (initial loads / oracle comparisons)."""
        self._commit(db, table, state)

    def _commit(self, db: str, table: str, state: DataFrame) -> None:
        d = self._dir(db, table)
        v = (self._latest_version(db, table) or 0) + 1
        path = os.path.join(d, f"v{v}")
        writer = state.write.mode("overwrite")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(d, "_LATEST"))  # atomic pointer flip
