"""Query library: every entry in ``__spark_entry__.queries()`` lives here.

Each module exposes ``QUERIES: dict[str, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL equivalents; omitted keys get
the driver's weaker rows-only check).
"""

from __future__ import annotations


def all_queries():
    from cdc_redshift_spark.queries import (
        analytics,
        cdc,
        corpus_q,
        dedup_q,
        multimodal_q,
        similarity,
        streaming_q,
        temporal_q,
        text_q,
    )

    q: dict = {}
    o: dict = {}
    for mod in (
        cdc,
        analytics,
        text_q,
        dedup_q,
        corpus_q,
        similarity,
        multimodal_q,
        streaming_q,
        temporal_q,
    ):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
