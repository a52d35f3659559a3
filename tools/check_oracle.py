"""Local replica of the driver's correctness gate.

Runs each queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet tables, compares row count, schema (column names), and
an order-insensitive value hash.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return "NULL"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    import hashlib

    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # plain session, like the driver's — catches any hidden dependency
    # on cdc_redshift_spark.session.get_spark's config
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("oracle-check")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only check, {len(srows)} rows")
            continue
        dres = con.execute(oracles[name])
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = table_hash(scols, [[r[c] for c in scols] for r in srows])
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{name}: {status} rows={len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_cols else f'{scols} vs {dcols}'} hash={'ok' if ok_hash else 'MISMATCH'}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_cols and ok_count:
                # show first differing rows for debugging
                sset = {tuple(norm_cell(r[c]) for c in sorted(scols)) for r in srows}
                dset = {
                    tuple(norm_cell(r[dcols.index(c)]) for c in sorted(dcols))
                    for r in drows
                }
                for x in list(sset - dset)[:3]:
                    print("  spark-only:", x)
                for x in list(dset - sset)[:3]:
                    print("  duck-only: ", x)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
