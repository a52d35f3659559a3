"""Dump `.explain("formatted")` for named queries to plans/r<N>/.

Usage: python tools/dump_named_plans.py [--rdir rNN] <suffix> <query> [query ...]

Writes plans/<rdir>/<query>_<suffix>.txt (rdir defaults to r15 for
byte-stable regeneration of the committed r15 evidence).  Queries whose
gated form localCheckpoints (simjoin/containment/incremental-minhash)
are dumped via their eager=False lazy form, which has the identical
logical plan (the dump_plans.py convention).

EAGER evidence mode (VERDICT r15 #6): a suffix starting with ``eager``
instead RUNS the gated eager form with the operators' PLAN_CAPTURE hook
armed and writes the plan captured AFTER the materializing action — the
runtime plan in which the persist barriers (InMemoryRelation) and the
single array_intersect evaluation are actually visible.  Supported
names there: dedup_simjoin, dedup_containment, dedup_incremental_minhash,
dedup_minhash_lsh.word (the bench sub-entry).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    args = sys.argv[1:]
    rdir = "r15"
    if args and args[0] == "--rdir":
        rdir = args[1]
        args = args[2:]
    suffix, names = args[0], args[1:]
    from cdc_redshift_spark.session import get_spark

    spark = get_spark("plan-dump-named", master="local[4]", shuffle_partitions=4)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def lazy_simjoin(sp, sf_dir):
        from cdc_redshift_spark.operators.simjoin import jaccard_similarity_join
        from cdc_redshift_spark.queries.dedup_q import SIMJOIN_TAU
        from cdc_redshift_spark.sources.tables import load_table

        return jaccard_similarity_join(
            load_table(sp, sf_dir, "documents"), tau=SIMJOIN_TAU, eager=False
        )

    def lazy_containment(sp, sf_dir):
        from cdc_redshift_spark.operators.simjoin import containment_join
        from cdc_redshift_spark.queries.dedup_q import (
            CONTAIN_N,
            CONTAIN_TAU,
        )
        from cdc_redshift_spark.sources.tables import load_table

        return containment_join(
            load_table(sp, sf_dir, "documents"),
            tau=CONTAIN_TAU,
            n=CONTAIN_N,
            eager=False,
        )

    def lazy_inc_minhash(sp, sf_dir):
        from pyspark.sql import functions as F

        from cdc_redshift_spark.operators.dedup import (
            incremental_minhash_pairs,
            minhash_frames,
        )
        from cdc_redshift_spark.queries.dedup_q import (
            INC_BATCH_MOD,
            INC_MH_BANDS,
            INC_MH_K,
            INC_MH_THRESHOLD,
        )
        from cdc_redshift_spark.sources.tables import load_table

        docs = load_table(sp, sf_dir, "documents")
        ex = docs.where(F.col("doc_id") % INC_BATCH_MOD != 0)
        ba = docs.where(F.col("doc_id") % INC_BATCH_MOD == 0)
        return incremental_minhash_pairs(
            minhash_frames(ex, k=INC_MH_K),
            minhash_frames(ba, k=INC_MH_K),
            k=INC_MH_K,
            bands=INC_MH_BANDS,
            jaccard_threshold=INC_MH_THRESHOLD,
            eager=False,
        )

    overrides = {
        "dedup_simjoin": lazy_simjoin,
        "dedup_containment": lazy_containment,
        "dedup_incremental_minhash": lazy_inc_minhash,
    }
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rdir,
    )
    os.makedirs(outdir, exist_ok=True)

    if suffix.startswith("eager"):
        import cdc_redshift_spark.operators.simjoin as sjmod
        from pyspark.sql import functions as F

        from cdc_redshift_spark.operators.dedup import minhash_lsh_pairs
        from cdc_redshift_spark.queries.dedup_q import (
            MINHASH_BUCKET_CAP,
            WORD_N,
            WORD_THRESHOLD,
        )
        from cdc_redshift_spark.sources.tables import load_table

        def lsh_word(sp, sf_dir):
            return minhash_lsh_pairs(
                load_table(sp, sf_dir, "documents"),
                k=32,
                bands=8,
                n=WORD_N,
                jaccard_threshold=WORD_THRESHOLD,
                unit="word",
                max_bucket_size=MINHASH_BUCKET_CAP,
            )

        eager_extra = {"dedup_minhash_lsh.word": lsh_word}
        sjmod.PLAN_CAPTURE = cap = []
        try:
            for name in names:
                cap.clear()
                builder = (
                    eager_extra[name] if name in eager_extra else qs[name]
                )
                builder(spark, SF)
                text = "\n\n".join(
                    f"== PLAN_CAPTURE: {label} (post-action, eager path) ==\n{plan}"
                    for label, plan in cap
                )
                path = os.path.join(outdir, f"{name}_{suffix}.txt")
                with open(path, "w") as f:
                    f.write(text)
                print(f"wrote {path} ({len(text.splitlines())} lines)")
        finally:
            sjmod.PLAN_CAPTURE = None
        spark.stop()
        return

    for name in names:
        df = overrides.get(name, qs[name])(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
