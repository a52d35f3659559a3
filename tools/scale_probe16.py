#!/usr/bin/env python
"""16x scale probes for the two heavies with only 4x evidence
(VERDICT r8 #8, carried r7 #6): `dedup_containment` and
`docs_substring_dedup`.  The r6 simjoin knee appeared at 8x, so 4x
curves alone cannot certify the shape.

Protocol = the round-7 probe protocol (SCALE.md): sf0.1 documents
(5k docs) replicated DISJOINTLY — ids shifted by 10M per replica and
every token suffixed with a per-replica tag, so cross-replica shingle
matches are impossible and per-replica candidate density stays at the
fixture's level (replica count scales corpus size, not dup density —
the honest "more data, same data distribution" axis).  Warmed
codegen (one 1x run first), min-of-2, measured at 1x / 4x / 16x.

Prints one JSON line per (operator, scale) measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_redshift_spark.session import get_spark
from cdc_redshift_spark.sources.tables import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(s) for s in os.environ.get("SCALE_STEPS", "1,4,16").split(",")]


def replicate_disjoint(docs, n):
    """n disjoint copies: ids shifted, every token tagged per replica
    (distinct shingle vocabularies -> zero cross-replica candidates)."""
    parts = []
    for i in range(n):
        p = docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{i}").alias("text")
            if i
            else F.col("text"),
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from cdc_redshift_spark.operators.simjoin import containment_join
    from cdc_redshift_spark.operators.spandedup import (
        duplicated_spans,
        strip_spans,
    )
    from cdc_redshift_spark.queries.dedup_q import (
        CONTAIN_N,
        CONTAIN_TAU,
        SPAN_N,
    )

    spark = get_spark("scale_probe16")
    docs = load_table(spark, SF, "documents")

    # warm the codegen/Arrow paths once at 1x (excluded, as bench.py's
    # warmup always is)
    force(containment_join(docs, tau=CONTAIN_TAU, n=CONTAIN_N))
    force(strip_spans(docs, duplicated_spans(docs, n=SPAN_N)))

    for scale in SCALES:
        corpus = replicate_disjoint(docs, scale).persist()
        n_docs = corpus.count()

        t = timed(lambda: force(containment_join(corpus, tau=CONTAIN_TAU, n=CONTAIN_N)))
        print(
            json.dumps(
                {
                    "op": "dedup_containment",
                    "scale": scale,
                    "docs": n_docs,
                    "sec": t,
                }
            ),
            flush=True,
        )

        def span_pipeline():
            spans = duplicated_spans(corpus, n=SPAN_N).localCheckpoint(
                eager=False
            )
            force(strip_spans(corpus, spans))

        t = timed(span_pipeline)
        print(
            json.dumps(
                {
                    "op": "docs_substring_dedup",
                    "scale": scale,
                    "docs": n_docs,
                    "sec": t,
                }
            ),
            flush=True,
        )
        corpus.unpersist()


if __name__ == "__main__":
    main()
