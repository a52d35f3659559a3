"""CDC apply-path steady-state probe (VERDICT r9 #4).

Two questions, answered in isolation (fresh session, min-of-3,
outside the bench suite's accumulated-JVM-state noise):

1. the steady-state CDC apply rate (cdc_apply_batch: parse ->
   normalize -> LWW -> merge) and full pg replay wall at sf0.1 —
   pinned after the round-9 stats-carry change put the _flip sidecar
   copy on every commit;
2. the carry's cost: mean per-commit wall over N micro-batch
   apply_changeset commits with the analyze-carry ENABLED (default
   limit 64, sidecar inflated with a key sketch — the worst case)
   vs DISABLED (analyze_carry_limit=0).

Usage: python tools/probe_apply_steady.py [sf_dir]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("apply-steady-probe")
        .getOrCreate()
    )

    from cdc_redshift_spark.dedup import latest_per_key
    from cdc_redshift_spark.normalize import pg_changeset
    from cdc_redshift_spark.plans.merge import apply_changeset
    from cdc_redshift_spark.queries.cdc import synth_pg_changelog
    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink
    from cdc_redshift_spark.sources.tables import load_table

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict = {"sf_dir": sf_dir}

    # -- 1. isolated apply rate (min-of-3, input persisted) ----------
    raw = synth_pg_changelog(spark, sf_dir).persist()
    n = raw.count()

    def run_apply():
        ch = latest_per_key(
            pg_changeset(raw, offset_col="offset"),
            keys=("db", "table", "key"),
        )
        force(apply_changeset(None, ch, keys=("db", "table", "key")))

    run_apply()  # JIT warm
    best = float("inf")
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        run_apply()
        best = min(best, time.perf_counter() - t0)
    out["cdc_events"] = n
    out["cdc_apply_batch_s_min3"] = round(best, 3)
    out["cdc_rec_per_s_isolated"] = round(n / best, 1)
    raw.unpersist()

    # -- 2. analyze-carry A/B over micro-batch commits ---------------
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("v"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.col("o_orderkey").alias("offset"),
        F.lit("insert").alias("op"),
    )
    micro = (
        base.where(F.pmod(F.col("k"), F.lit(100)) == 7)
        .withColumn("v", F.lit("U"))
        .withColumn("op", F.lit("update"))
        .withColumn("ts_ms", F.lit(2).cast("long"))
    ).persist()
    n_micro = micro.count()
    out["ab_micro_rows"] = n_micro
    N_COMMITS = 12

    for label, kw in (
        ("carry_on", {}),
        ("carry_off", {"analyze_carry_limit": 0}),
    ):
        root = tempfile.mkdtemp(prefix=f"probe_carry_{label}_")
        try:
            sink = ParquetSink(spark, root, keys=("k",), **kw)
            sink.overwrite("d", "t", base)
            # worst-case sidecar: stats + key sketch (~hundreds of KB)
            sink.analyze("d", "t", approx=True, key_sketch=True)
            sz = os.path.getsize(
                os.path.join(
                    root, "d", "t",
                    f"v{sink._latest_version('d', 't')}", "_ANALYZE",
                )
            )
            # keyed per label like the other A/B outputs — a single
            # key would silently report only the last run's size if
            # the two configs ever diverge
            out[f"ab_{label}_analyze_sidecar_bytes"] = sz
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            for i in range(N_COMMITS):
                sink.apply_changeset(
                    "d", "t",
                    micro.withColumn(
                        "ts_ms", F.lit(10 + i).cast("long")
                    ),
                )
            wall = time.perf_counter() - t0
            out[f"ab_{label}_s_per_commit"] = round(wall / N_COMMITS, 4)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    micro.unpersist()
    on, off = out["ab_carry_on_s_per_commit"], out["ab_carry_off_s_per_commit"]
    out["ab_carry_overhead_pct"] = round(100.0 * (on - off) / off, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
