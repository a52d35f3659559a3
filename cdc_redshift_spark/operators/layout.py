"""File-layout clustering for data-skipping reads (z-order-lite).

Parquet files and row groups carry min/max statistics per column, but a
hash-partitioned write scatters every key range across every file, so
the stats prune NOTHING — a point lookup still opens the whole table.
Range-clustering fixes the layout: ``repartitionByRange`` assigns each
output file a disjoint slice of the cluster key's value space and
``sortWithinPartitions`` tightens row-group stats inside each file.
After that, any engine that reads parquet statistics (Spark's scan
row-group filtering, DuckDB zone maps, Redshift Spectrum, Trino) skips
every file whose [min, max] misses the predicate — the poor man's
sort/cluster key, no table format required.

At 100 TB this is the difference between a key-range merge probe
reading the whole table and reading one file: ``ParquetSink``'s
``cluster_keys`` applies it to every snapshot it commits.

For multi-column locality beyond lexicographic (true Z-ordering),
cluster on an interleaved bit key computed from the columns; the
single-column/lexicographic form here covers the dominant cases (merge
keys, event time).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster(
    df: DataFrame, cols: Sequence[str], num_files: int | None = None
) -> DataFrame:
    """Range-cluster ``df`` on ``cols``: each output partition (→ file)
    covers a disjoint range, rows sorted within.  One range shuffle —
    the sort is partition-local, never global.

    Without ``num_files`` the partition count is left to Spark: an
    EXPLICIT count is exempt from AQE coalescing, so passing one by
    default would fragment every small snapshot into shuffle-partition
    many tiny files; with AQE on, small inputs coalesce naturally."""
    if num_files is not None:
        parted = df.repartitionByRange(num_files, *[F.col(c) for c in cols])
    else:
        parted = df.repartitionByRange(*[F.col(c) for c in cols])
    return parted.sortWithinPartitions(*cols)


def file_ranges(path: str, col: str) -> list[tuple]:
    """[(min, max)] of ``col`` per parquet data file under ``path`` —
    the statistics a skipping reader prunes on.  Test/evidence helper
    (driver-side, walks file footers only)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def pruned_fraction(ranges: list[tuple], lo, hi) -> float:
    """Fraction of files a [lo, hi] predicate can SKIP given their
    min/max ranges — the data-skipping effectiveness metric."""
    if not ranges:
        return 0.0
    hit = sum(1 for a, b in ranges if not (b < lo or a > hi))
    return 1.0 - hit / len(ranges)
