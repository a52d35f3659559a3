"""CPU-time profile of several bench entries in one session.

Wall clock on this sandbox swings 40x with co-tenant load (measured,
round-15-opt), so optimization targeting uses executor CPU seconds —
contention-inflatable but far more stable than wall.  Runs each named
query ``iters`` times through the noop sink, then groups the REST
API's per-stage executorCpuTime/RunTime by job description.

Usage: python tools/profile_suite.py q1,q2,... [sf_dir] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
UI_PORT = int(os.environ.get("PROFILE_UI_PORT", "4049"))


def main() -> None:
    names = sys.argv[1].split(",")
    from cdc_redshift_spark.session import get_spark

    spark = get_spark(
        "profile_suite",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        },
    )
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    walls: dict[str, list[float]] = defaultdict(list)
    for i in range(ITERS):
        for name in names:
            import gc

            gc.collect()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"{name}#i{i}")
            load = open("/proc/loadavg").read().split()[0]
            t0 = time.perf_counter()
            qs[name](spark, SF).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            walls[name].append(dt)
            print(f"iter{i} {name}: {dt}s (load {load})", file=sys.stderr, flush=True)
            spark.sparkContext.setJobDescription(None)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    agg: dict[tuple[str, str], dict] = defaultdict(lambda: defaultdict(float))
    for s in stages:
        desc = s.get("description") or ""
        if "#i" not in desc:
            continue
        qname, it = desc.rsplit("#i", 1)
        a = agg[(qname, it)]
        a["cpu_s"] += (s.get("executorCpuTime") or 0) / 1e9
        a["run_s"] += (s.get("executorRunTime") or 0) / 1e3
        a["shRd_MB"] += (s.get("shuffleReadBytes") or 0) / 1e6
        a["shWr_MB"] += (s.get("shuffleWriteBytes") or 0) / 1e6
        a["in_MB"] += (s.get("inputBytes") or 0) / 1e6
        a["stages"] += 1
    print(f"{'query':<36}{'iter':>4} {'wall_s':>8} {'cpu_s':>9} {'run_s':>9} "
          f"{'shWr_MB':>8} {'in_MB':>8} {'stages':>6}")
    for (qname, it), a in sorted(agg.items()):
        w = walls[qname][int(it)] if int(it) < len(walls[qname]) else -1
        print(f"{qname:<36}{it:>4} {w:>8.2f} {a['cpu_s']:>9.1f} {a['run_s']:>9.1f} "
              f"{a['shWr_MB']:>8.1f} {a['in_MB']:>8.1f} {int(a['stages']):>6}")


if __name__ == "__main__":
    main()
