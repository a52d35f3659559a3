"""Oracle final-SELECT dtype sweep (PARITY.md dtype-parity rule).

The driver's value hasher is type-sensitive: a DuckDB DECIMAL(38,0)
output hashes differently from Spark's BIGINT even when every value is
numerically identical (round-9 `sketch_join_size` red row).  This tool
binds every ``oracle_sql()`` query on DuckDB (schema only — no
execution) and flags output columns whose DuckDB type cannot map 1:1
onto a Spark collect() Python type:

- DECIMAL / HUGEINT / UHUGEINT  -> Python Decimal/int128; Spark emits
  Decimal only for DecimalType columns, which no query here uses.
  Fix: CAST(... AS BIGINT/DOUBLE) in the final SELECT.
- unsigned ints (UTINYINT..UBIGINT) -> same class of surprise.
- TIME / INTERVAL               -> no Spark-side equivalent in use.

Usage: python tools/check_dtypes.py [sf_dir]
Exits 1 if any oracle output column is flagged.
"""

from __future__ import annotations

import re
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FLAGGED = re.compile(
    r"DECIMAL|HUGEINT|UHUGEINT|UTINYINT|USMALLINT|UINTEGER|UBIGINT"
    r"|\bTIME\b|INTERVAL",
    re.IGNORECASE,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    bad = []
    oracles = entrymod.oracle_sql()
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)  # binds + plans; schema without execution
            hits = [
                (c, str(ty))
                for c, ty in zip(rel.columns, rel.types)
                if FLAGGED.search(str(ty))
            ]
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, [("<bind error>", str(exc)[:200])]))
            continue
        if hits:
            bad.append((name, hits))

    for name, hits in bad:
        for col, ty in hits:
            print(f"FLAG {name}: {col} -> {ty}")
    print(f"swept {len(oracles)} oracles, flagged {len(bad)}")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
