"""Data-quality profiling: one-pass column statistics.

A corpus/warehouse hygiene primitive the reference lacks entirely —
per column: row count, null count, distinct count.  Everything is a
single `agg` over the table (one aggregation job; distinct counts are
exact, so Spark plans one expand + hash-aggregate — at 100 TB swap
`count_distinct` for `approx_count_distinct` if a sketch suffices),
then the one result row is unpivoted to long format with `stack`, so
the operator's output is a small (n_cols)-row DataFrame regardless of
table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column."""
    cols = list(cols or df.columns)
    if not cols:
        raise ValueError("profile() needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    row = df.agg(*aggs)

    def q(name: str) -> str:  # SQL string literal
        return "'" + name.replace("'", "''") + "'"

    def bq(name: str) -> str:  # backquoted identifier
        return "`" + name.replace("`", "``") + "`"

    stack_args = ", ".join(
        f"{q(c)}, {bq('__nulls_' + c)}, {bq('__dist_' + c)}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, n_distinct)",
        "__rows AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct")
