#!/usr/bin/env python
"""History-independence probe for the round-13 streaming drift faces
(`cdc_stream_emb_drift`, `cdc_stream_token_drift`).

The 100 TB claim these entries make: a maintained drift monitor's
per-trigger cost is O(batch) + O(state cells), never O(history) — the
batch face rescans everything per run, the streaming face must not.
Protocol: feed the maintainer a fixed-size micro-batch repeatedly
(disjoint replicas — vec_id/doc_id shifted, labels/sources tagged per
replica so state CELLS also grow, the worst case for the store), and
compare the wall of an EARLY trigger against the wall of a LATE
trigger with N× more accumulated history behind it.  Flat = the
monitor rides the micro-batch economics; growing = it is secretly a
batch job.

Also times the scoring read (state -> report) at 1× vs N× state
cells.  Prints one JSON line per measurement.

Run ALONE (concurrent Spark work distorts trigger walls —
SCALE.md methodology note, round 11/12).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_redshift_spark.session import get_spark
from cdc_redshift_spark.sources.tables import load_table
from cdc_redshift_spark.streaming.rollup import RollupMaintainer

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_TRIGGERS = max(1, int(os.environ.get("PROBE_TRIGGERS", "12")))


def emit(**kw):
    print(json.dumps(kw), flush=True)


SETTLE = os.environ.get("PROBE_SETTLE", "0") == "1"


def settle(spark):
    # the round-12 bench diagnosis: CPython reference cycles hold
    # py4j handles on finished job state, deferring ContextCleaner;
    # collect Python first, then ask the JVM
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def probe_emb(spark):
    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", "label", "embedding"
    ).localCheckpoint(eager=True)
    base_rows = emb.count()

    def shape(i):
        # replica i: labels shifted into a disjoint range so state
        # CELLS grow with history (new labels x dim x half rows),
        # vec_ids shifted for disjointness
        return emb.select(
            F.lit(1).alias("sign"),
            (F.col("label") + i * 1000).alias("label"),
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("pos", "x"),
        ).withColumn("__half", F.lit("cur" if i % 2 else "ref"))

    tmp = tempfile.mkdtemp(prefix="probe_emb_drift_")
    try:
        m = RollupMaintainer(
            spark, tmp, prepare=lambda r: r, time_col=None, bucket=None,
            dims=["label", "pos", "__half"], measures={"sum_x": "x"},
        )
        walls = []
        for i in range(N_TRIGGERS):
            if SETTLE:
                settle(spark)
            walls.append(timed(lambda i=i: m.update(shape(i), i)))
            if i in (0, 1, N_TRIGGERS // 2, N_TRIGGERS - 1):
                emit(op="emb_drift_stream", axis="trigger_wall_s",
                     trigger=i, batch_rows=base_rows, value=walls[-1])
        state = m.current().localCheckpoint(eager=True)
        cells = state.count()
        score = timed(lambda: state.groupBy("label", "pos").agg(
            F.max(F.when(F.col("__half") == "ref",
                         F.col("sum_x") / F.col("n"))).alias("m_ref"),
            F.max(F.when(F.col("__half") == "cur",
                         F.col("sum_x") / F.col("n"))).alias("m_cur"),
        ).groupBy("label").agg(
            F.sum(F.col("m_ref") * F.col("m_cur")).alias("dot")
        ).write.format("noop").mode("overwrite").save())
        early = min(walls[1:3]) if len(walls) > 1 else walls[0]
        emit(op="emb_drift_stream", axis="summary",
             early_wall_s=round(early, 3),
             late_wall_s=round(walls[-1], 3),
             late_over_early=round(walls[-1] / max(early, 1e-9), 2),
             state_cells=cells, score_wall_s=score)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def probe_token(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    ).localCheckpoint(eager=True)
    base_rows = docs.count()

    def shape(i):
        # replica i: sources tagged (state cells grow).  Cells here
        # are RAW TOKENS — strictly heavier than the real query's
        # vocab-bounded cells (sources x (V+1)): every replica adds
        # its full distinct-token load to the store.  If the trigger
        # wall stays flat under this, the bounded real shape is
        # safely inside.
        return docs.select(
            F.lit(1).alias("sign"),
            F.concat(F.col("source"), F.lit(f"#r{i}")).alias("source"),
            F.explode(
                F.split(F.trim(F.col("text")), r"\s+")
            ).alias("cell"),
        ).withColumn("__half", F.lit("cur" if i % 2 else "ref"))

    tmp = tempfile.mkdtemp(prefix="probe_tok_drift_")
    try:
        m = RollupMaintainer(
            spark, tmp, prepare=lambda r: r, time_col=None, bucket=None,
            dims=["source", "cell", "__half"], measures={},
        )
        walls = []
        for i in range(N_TRIGGERS):
            if SETTLE:
                settle(spark)
            walls.append(timed(lambda i=i: m.update(shape(i), i)))
            if i in (0, 1, N_TRIGGERS // 2, N_TRIGGERS - 1):
                emit(op="token_drift_stream", axis="trigger_wall_s",
                     trigger=i, batch_docs=base_rows, value=walls[-1])
        state = m.current().localCheckpoint(eager=True)
        cells = state.count()
        score = timed(lambda: state.groupBy("source", "cell").agg(
            F.sum(F.when(F.col("__half") == "ref", F.col("n"))).alias("cr"),
            F.sum(F.when(F.col("__half") == "cur", F.col("n"))).alias("cc"),
        ).groupBy("source").agg(
            F.sum("cr").alias("nr"), F.sum("cc").alias("nc")
        ).write.format("noop").mode("overwrite").save())
        early = min(walls[1:3]) if len(walls) > 1 else walls[0]
        emit(op="token_drift_stream", axis="summary",
             early_wall_s=round(early, 3),
             late_wall_s=round(walls[-1], 3),
             late_over_early=round(walls[-1] / max(early, 1e-9), 2),
             state_cells=cells, score_wall_s=score)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    spark = get_spark()
    which = os.environ.get("PROBE_OPS", "emb,token")
    if "emb" in which:
        probe_emb(spark)
    if "token" in which:
        probe_token(spark)


if __name__ == "__main__":
    main()
