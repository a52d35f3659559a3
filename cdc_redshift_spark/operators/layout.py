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


def zorder_key(scaled: Sequence, bits: int) -> "F.Column":
    """Interleave the low ``bits`` bits of the scaled integer columns
    into one Morton (Z-order) key — pure Column bit arithmetic, stays
    in whole-stage codegen.  ``scaled[i]`` must already lie in
    ``[0, 2^bits)``."""
    n = len(scaled)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int | None = None,
    bits: int = 12,
) -> DataFrame:
    """TRUE multi-dimensional clustering: range-partition + sort on the
    Morton key of ``cols`` instead of their lexicographic order.

    Lexicographic :func:`cluster` gives perfect pruning on the FIRST
    column and none on the rest; the Z-order key gives useful min/max
    locality on EVERY column (each file covers a contiguous Z range ==
    a small hyper-rectangle stack), which is what a table queried by
    several independent predicates needs — the same trade Delta's
    ``ZORDER BY`` and Redshift's interleaved sortkeys make.

    ``cols`` must be numeric (cast dates to epoch days first).  Each
    column is affinely scaled to ``[0, 2^bits)`` using its observed
    min/max (one tiny driver-side agg — 2×len(cols) scalars); rows
    then shuffle ONCE on the key.  The key column is dropped before
    returning: parquet min/max stats on the ORIGINAL columns are what
    skipping readers prune on.
    """
    stats = df.agg(
        *[F.min(c).alias(f"lo{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"hi{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        lo = int(stats[f"lo{i}"])
        span = max(int(stats[f"hi{i}"]) - lo, 1)
        scaled.append(
            ((F.col(c).cast("long") - F.lit(lo)) * top / F.lit(span))
            .cast("long")
        )
    keyed = df.withColumn("__z", zorder_key(scaled, bits))
    if num_files is not None:
        parted = keyed.repartitionByRange(num_files, F.col("__z"))
    else:
        parted = keyed.repartitionByRange(F.col("__z"))
    return parted.sortWithinPartitions("__z").drop("__z")


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
