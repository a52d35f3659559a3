#!/usr/bin/env python
"""History-independence probe for the round-14 streaming privacy faces
(`cdc_stream_k_anonymity`, `cdc_stream_l_diversity`,
`cdc_stream_t_closeness`).

The 100 TB claim: a continuous privacy audit's per-trigger cost is
O(batch) + O(state cells), never O(history) — the batch audit rescans
the table per run, the maintained one must not.  Protocol (the drift
triad's, tools/probe_stream_drift_scale.py): feed the maintainer a
fixed-size micro-batch repeatedly, each replica's QI values shifted
into a disjoint range so state CELLS also grow (worst case for the
store), and compare EARLY vs LATE trigger walls with N× more history
behind the late one.  Also times the scoring read (state → all three
verdicts through the SHARED scorers) at full accumulated state.

Run ALONE.  PROBE_SETTLE=1 applies the round-12 settle discipline
(python gc then JVM gc between triggers — without it walls grow from
py4j-handle pileup, not operator cost; SCALE.md round-13)."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_redshift_spark.operators.quality import (
    k_anonymity_score,
    l_diversity_score,
    t_closeness_score,
)
from cdc_redshift_spark.session import get_spark
from cdc_redshift_spark.sources.tables import load_table
from cdc_redshift_spark.streaming.rollup import RollupMaintainer

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_TRIGGERS = max(1, int(os.environ.get("PROBE_TRIGGERS", "12")))
SETTLE = os.environ.get("PROBE_SETTLE", "0") == "1"


def emit(**kw):
    print(json.dumps(kw), flush=True)


def settle(spark):
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("probe_privacy_scale")
    cust = (
        load_table(spark, SF, "customer")
        .select(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
        )
        .localCheckpoint(eager=True)
    )
    base_rows = cust.count()

    def shape(i):
        # replica i: nations shifted into a disjoint range so the
        # (QI, value) cell count grows linearly with history — a
        # trigger must still fold only ITS batch's deltas into the
        # buckets those cells hash to
        return cust.select(
            F.lit(1).alias("sign"),
            (F.col("nation") + i * 1000).alias("nation"),
            "segment",
            "bal_band",
        )

    tmp = tempfile.mkdtemp(prefix="probe_privacy_")
    try:
        m = RollupMaintainer(
            spark, tmp, prepare=lambda r: r, time_col=None, bucket=None,
            dims=["nation", "segment", "bal_band"], measures={},
        )
        walls = []
        for i in range(N_TRIGGERS):
            if SETTLE:
                settle(spark)
            walls.append(timed(lambda i=i: m.update(shape(i), i)))
            if i in (0, 1, N_TRIGGERS // 2, N_TRIGGERS - 1):
                emit(op="privacy_stream", axis="trigger_wall_s",
                     trigger=i, batch_rows=base_rows, value=walls[-1])
        state = m.current().localCheckpoint(eager=True)
        cells = state.count()
        # all three verdicts off the SAME maintained cells, through
        # the shared scorers the gated faces use
        score = timed(lambda: (
            k_anonymity_score(state, k=5)
            .write.format("noop").mode("overwrite").save(),
            l_diversity_score(state, ["nation", "bal_band"], l=3,
                              count_col="n")
            .write.format("noop").mode("overwrite").save(),
            t_closeness_score(state, ["nation", "bal_band"], t=0.3,
                              count_col="n", value_col="segment")
            .write.format("noop").mode("overwrite").save(),
        ))
        early = min(walls[1:3]) if len(walls) > 1 else walls[0]
        emit(op="privacy_stream", axis="summary",
             early_wall_s=round(early, 3),
             late_wall_s=round(walls[-1], 3),
             late_over_early=round(walls[-1] / max(early, 1e-9), 2),
             state_cells=cells, triad_score_wall_s=score)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
