"""Local replica of the driver's correctness gate.

Runs each queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet tables, compares row count, schema (column names), and
an order-insensitive value hash.  Usage:

    python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes the per-query results as the
LOCALGATE_r{N}.json artifact shape (committed per round so the judge
can distinguish "driver didn't run it" from "builder didn't check it").
"""

from __future__ import annotations

import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import decimal
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return "NULL"
    # The driver's hasher is TYPE-SENSITIVE: Decimal("5") != 5 even
    # though str() collides.  Tag decimals so the local gate catches
    # the same mismatch (root cause of the r9 sketch_join_size red row:
    # an uncast DECIMAL(38,0) oracle output vs Spark BIGINT).
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
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
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only check, {len(srows)} rows")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": "no oracle (rows-only)",
            }
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
        results[name] = {
            "rows_match": ok_count, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(srows),
            "oracle_rows": len(drows), "err": None,
        }
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
    if json_out is not None:
        import json as _json

        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_green": sum(
                1 for v in results.values() if v["hash_match"] is True
            ),
            "tool": "tools/check_oracle.py"
            + ("" if not only else " (filtered)"),
            "queries": results,
        }
        with open(json_out, "w") as f:
            _json.dump(summary, f, indent=1)
        print(f"wrote {json_out} ({len(results)} queries)")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
