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

import os
import re
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from check_oracle import TABLES  # noqa: E402 — one list, two tools

FLAGGED = re.compile(
    r"DECIMAL|HUGEINT|UHUGEINT|UTINYINT|USMALLINT|UINTEGER|UBIGINT"
    r"|INTERVAL",
    re.IGNORECASE,
)


def _is_flagged(ty: str) -> bool:
    # the bare TIME / TIMETZ types have no Spark collect() equivalent,
    # but "TIMESTAMP WITH TIME ZONE" does — match TIME only as the
    # leading type word, which TIMESTAMP* never is
    t = ty.strip().upper()
    if t == "TIME" or t.startswith(("TIME(", "TIME ")):
        return True
    return bool(FLAGGED.search(t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
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
                if _is_flagged(str(ty))
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
