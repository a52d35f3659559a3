"""Salted-execution skew probe in the NO-BROADCAST regime (VERDICT r13 #1).

``plan_salted_exec`` driver-certifies the composed flag → confirm →
salted-execution path's SEMANTICS, but at fixture scale its physical
plan degenerates to a BroadcastHashJoin — the regime the mitigation
exists for (neither side broadcasts, the hot key concentrates in one
shuffle task) had no artifact.  This probe builds that regime
explicitly and pins the straggler flattening:

- hot-key fixture: one key carries ~50% of the fact rows, the rest
  spread uniformly over ``N_DIM`` keys;
- ``spark.sql.autoBroadcastJoinThreshold=-1`` so the dim side CANNOT
  broadcast (the at-scale posture ``join_plan(broadcast_threshold=0)``
  models);
- per-task durations read from the Spark UI REST API
  (``/stages/{id}/{attempt}/taskSummary``) — the skew metric is
  **max-task / median-task executorRunTime within the join stage**
  (the stage with the largest max), the straggler ratio a cluster
  scheduler actually sees.

Three legs over the identical fixture:

  A. unsalted, AQE off            — the untreated straggler
  B. unsalted, AQE skew-join on   — Spark's own runtime mitigation
                                    (first line of defense; the native
                                    salt exists for shapes AQE doesn't
                                    cover: joins feeding same-key aggs,
                                    streaming micro-batches, pre-AQE
                                    engines)
  C. salted_join(factor=32), AQE off — the planner's native escape
                                    hatch (operators/joins.salted_join,
                                    the path apply_join_plan takes)

Row identity (count + pair checksum) is asserted equal across legs —
the mitigation may only move rows between tasks, never change results.

Results land in SCALE.md round-14.  Run isolated (no concurrent Spark).

Usage: python tools/probe_salted_skew.py [--rows 8000000] [--factor 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

UI = "http://localhost:4040/api/v1"


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=30) as r:
        return json.loads(r.read())


def app_id() -> str:
    return _get("/applications")[0]["id"]


def completed_stage_keys(app: str) -> set[tuple[int, int]]:
    return {
        (s["stageId"], s["attemptId"])
        for s in _get(f"/applications/{app}/stages?status=complete")
    }


def straggler_ratio(app: str, before: set[tuple[int, int]]) -> dict:
    """Among stages completed since ``before``, find the one with the
    largest max task executorRunTime; return its max/median ratio."""
    worst = None
    for sid, att in completed_stage_keys(app) - before:
        try:
            summ = _get(
                f"/applications/{app}/stages/{sid}/{att}/taskSummary"
                f"?quantiles=0.0,0.5,1.0"
            )
        except Exception:
            continue  # tiny stages may have no task summary yet
        run = summ.get("executorRunTime")
        if not run:
            continue
        mx, med = run[2], run[1]
        if worst is None or mx > worst["max_task_ms"]:
            worst = {
                "stage": sid,
                "max_task_ms": round(mx, 1),
                "median_task_ms": round(med, 1),
                "ratio": round(mx / max(med, 1e-9), 2),
            }
    return worst or {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--factor", type=int, default=32)
    ap.add_argument("--n-dim", type=int, default=200_000)
    args = ap.parse_args()

    from cdc_redshift_spark.operators.joins import salted_join
    from cdc_redshift_spark.session import get_spark

    spark = get_spark(
        "probe_salted_skew",
        extra_conf={
            "spark.ui.enabled": "true",
            # the regime this path exists for: nothing broadcasts
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    app = app_id()

    half = args.rows // 2
    # fact: one hot key ("hot") with 50% of rows, the rest uniform over
    # n_dim keys; a discriminator column drives deterministic salting
    fact = (
        spark.range(args.rows)
        .select(
            F.when(F.col("id") < half, F.lit("hot"))
            .otherwise(
                F.concat(
                    F.lit("k"), (F.col("id") % args.n_dim).cast("string")
                )
            )
            .alias("k"),
            F.col("id").alias("disc"),
        )
        .localCheckpoint(eager=True)  # pin: legs must join IDENTICAL input
    )
    dim = (
        spark.range(args.n_dim + 1)
        .select(
            F.when(F.col("id") == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") - 1).cast("string")))
            .alias("k"),
            (F.col("id") * 7).alias("payload"),
        )
        .localCheckpoint(eager=True)
    )

    def run_leg(name: str, aqe: bool, salted: bool) -> dict:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(aqe).lower()
        )
        before = completed_stage_keys(app)
        t0 = time.perf_counter()
        j = (
            salted_join(fact, dim, ["k"], factor=args.factor,
                        discriminator="disc")
            if salted
            else fact.join(dim, "k")
        )
        # checksum certifies the PAIRING (disc x payload), not just the
        # cardinality.  The 40-step chained-hash fold is the per-row
        # work that makes the JOIN stage the unambiguous straggler
        # stage (without it the uniform checkpoint-scan stages carry
        # the largest max task and dilute the skew signal) — it stands
        # in for the downstream per-row cost a real pipeline attaches
        # to joined rows, and stays whole-stage-codegen.
        row = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "bit_xor(aggregate(sequence(1, 40),"
                " xxhash64(k, disc, payload),"
                " (acc, i) -> xxhash64(acc, i)))"
            ).alias("chk"),
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        time.sleep(1.0)  # let the UI store flush task metrics
        out = {
            "leg": name,
            "wall_s": wall,
            "n": row["n"],
            "chk": row["chk"],
            **straggler_ratio(app, before),
        }
        print(json.dumps(out), flush=True)
        return out

    # JIT warmup at 1/100 scale (not measured)
    fact.limit(args.rows // 100).join(dim, "k").agg(
        F.count(F.lit(1)),
        F.expr(
            "bit_xor(aggregate(sequence(1, 40),"
            " xxhash64(k, disc, payload), (acc, i) -> xxhash64(acc, i)))"
        ),
    ).collect()

    a = run_leg("unsalted_aqe_off", aqe=False, salted=False)
    b = run_leg("unsalted_aqe_skewjoin", aqe=True, salted=False)
    c = run_leg("salted_f%d_aqe_off" % args.factor, aqe=False, salted=True)

    assert a["n"] == b["n"] == c["n"], "row identity broken"
    assert a["chk"] == b["chk"] == c["chk"], "pair checksum broken"
    print(
        json.dumps(
            {
                "fixture_rows": args.rows,
                "hot_share": 0.5,
                "salt_factor": args.factor,
                "skew_ratio_unsalted": a.get("ratio"),
                "skew_ratio_aqe": b.get("ratio"),
                "skew_ratio_salted": c.get("ratio"),
                "identity": "count+checksum equal across legs",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
