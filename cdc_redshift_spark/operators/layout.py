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


# ---------------------------------------------------------------------------
# Per-file Bloom index (point-lookup data skipping on unclustered keys)
# ---------------------------------------------------------------------------

#: Bloom geometry defaults: 16 Kibit / 5 hashes ≈ 0.1 % false-positive
#: rate at ~1k distinct keys per file (p = (1 - e^{-kn/m})^k).
BLOOM_M_BITS = 16384
BLOOM_K_HASHES = 5


def _bloom_h1_h2(key_str):
    """The two engine-stable 60-bit base hashes (double hashing à la
    Kirsch–Mitzenmacher 2006: pos_i = h1 + i·h2 mod m)."""
    from cdc_redshift_spark.operators.corpus import stable_hash60

    return (
        stable_hash60(key_str),
        stable_hash60(F.concat(F.lit("b:"), key_str)),
    )


def bloom_file_index(
    spark,
    path: str,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K_HASHES,
) -> DataFrame:
    """Build one Bloom filter PER DATA FILE of a parquet table:
    ``(file, words: array<long>)`` with ``m_bits/64`` words.

    Range/Z-order clustering (above) gives min/max skipping on the
    SORT key; a point lookup on any other high-cardinality column
    still opens every file.  This index closes that gap the way
    Delta's Bloom-filter index does, with no table format: build once
    per snapshot (one scan, one groupBy(file) aggregate — bit_or is a
    map-side-combining JVM aggregate, no UDF), persist the tiny index
    next to the snapshot, and let :func:`bloom_lookup_files` turn a
    point predicate into an explicit file list.  No false negatives
    by construction (every present key set its bits); false-positive
    files cost one wasted file read, bounded by the geometry.

    At 100 TB: the index is |files| rows × m_bits/8 bytes (16 KiB per
    file at defaults — a 2 GiB index for a 128k-file table), the
    build is a single pass, and it composes with the cluster layouts:
    cluster on the merge key, Bloom-index the secondary lookup keys.
    """
    n_words = m_bits // 64
    h1, h2 = _bloom_h1_h2(F.col(key_col).cast("string"))
    positions = F.transform(
        F.sequence(F.lit(0), F.lit(k_hashes - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m_bits)),
    )
    rows = (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"),
            F.explode(positions).alias("pos"),
        )
        .select(
            "file",
            (F.col("pos") / 64).cast("int").alias("widx"),
            # shiftleft needs a column shift amount -> SQL expr form
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("file", "widx")
        .agg(F.bit_or("bit").alias("word"))
    )
    wm = rows.groupBy("file").agg(
        F.map_from_arrays(
            F.collect_list("widx"), F.collect_list("word")
        ).alias("wm")
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("wm"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return wm.select("file", words.alias("words"))


def _py_hash60(s: str) -> int:
    """Python mirror of corpus.stable_hash60 (md5 hex prefix)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def bloom_lookup_files(
    index: DataFrame,
    key_value,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K_HASHES,
) -> list[str]:
    """Files that MAY contain ``key_value`` (no false negatives).
    The membership test is pure Column bit math over the index frame
    (tiny — one row per file); the returned list is what a reader
    passes to ``spark.read.parquet(*files)`` instead of scanning the
    table.  The collect is bounded by |matching files|."""
    s = str(key_value)
    h1, h2 = _py_hash60(s), _py_hash60("b:" + s)
    cond = None
    for i in range(k_hashes):
        pos = (h1 + i * h2) % m_bits
        mask = 1 << (pos % 64)
        if mask >= 1 << 63:  # two's-complement wrap for the sign bit
            mask -= 1 << 64
        bit_set = (
            F.element_at(F.col("words"), pos // 64 + 1)
            .bitwiseAND(F.lit(mask).cast("long"))
            != 0
        )
        cond = bit_set if cond is None else (cond & bit_set)
    return [r["file"] for r in index.where(cond).select("file").collect()]
