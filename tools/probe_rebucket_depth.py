"""Re-bucket depth probe (VERDICT r11 #3 done-criterion).

Does the streaming maintainers' depth flat-line HOLD ACROSS a live
bucket-geometry migration?  In isolation (fresh session, outside the
bench suite's accumulated-JVM-state noise):

For each synthetic SCD2 history depth (15k / 150k / 1.5M rows,
the same ladder as the round-11 100x probe), seed a 64-bucket store,
run 6 five-literal-key micro triggers (steady = mean of 3..6), then
``rebucket(128)`` (full read -> rewrite at n' -> sub-versioned
token), then 6 more triggers.  Reports per depth: pre/post steady
s/trigger, their ratio (the flat-line-across-migration claim), the
migration's one-off wall (O(state) by design — amortized O(1)/byte
by the geometric growth rule in ``maybe_rebucket``), and the
touched-bucket counts before and after (the prune must re-engage on
the migrated layout).

Usage: python tools/probe_rebucket_depth.py [depths_csv]
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
    depths = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "3,30,300").split(",")
    ]  # unit: thousands of base keys; history = 5 versions per key
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_redshift_spark.streaming.scd2 import Scd2Maintainer

    out = {}
    for kk in depths:
        n_keys = kk * 1000
        # 5 closed versions per key: a realistic grown history
        seed = (
            spark.range(n_keys)
            .select(F.col("id").alias("k"))
            .crossJoin(spark.range(5).select(F.col("id").alias("ver")))
            .select(
                "k",
                F.concat(F.lit("v"), F.col("ver")).alias("attr"),
                (F.col("ver") + 1).cast("long").alias("ts"),
                F.col("ver").alias("seq"),
                F.lit("update").alias("op"),
            )
        )
        micro_rows = [(int(k), "m", 0, "update") for k in range(5)]

        def micro(i):
            return spark.createDataFrame(
                [
                    (k, f"{a}{i}", 100 + i, s)
                    for (k, a, s, _o) in micro_rows
                ],
                "k long, attr string, ts long, seq long",
            ).withColumn("op", F.lit("update"))

        root = tempfile.mkdtemp(prefix=f"probe_rebucket_{kk}k_")
        try:
            m = Scd2Maintainer(
                spark, root, keys=["k"], ts_col="ts",
                attrs=["attr"], tiebreak=["seq"],
            )
            m.update(seed, 0)
            hist_rows = m.current().count()
            touched_pre = len(m.touched_buckets(micro(1)))

            def walls(start, n=6):
                ws = []
                for i in range(start, start + n):
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.perf_counter()
                    m.update(micro(i), i)
                    ws.append(time.perf_counter() - t0)
                return ws

            pre = walls(1)
            t0 = time.perf_counter()
            m.rebucket(128)
            mig_s = time.perf_counter() - t0
            touched_post = len(m.touched_buckets(micro(7)))
            post = walls(7)
            steady = lambda ws: round(sum(ws[2:]) / len(ws[2:]), 3)
            out[f"{kk}k"] = {
                "hist_rows": hist_rows,
                "pre_s": steady(pre),
                "post_s": steady(post),
                "ratio": round(steady(post) / max(steady(pre), 1e-9), 2),
                "migration_s": round(mig_s, 3),
                "touched_pre_of_64": touched_pre,
                "touched_post_of_128": touched_post,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
