"""Dump `.explain("formatted")` for named queries to plans/r15/.

Usage: python tools/dump_named_plans.py <suffix> <query> [query ...]

Writes plans/r15/<query>_<suffix>.txt.  Queries whose gated form
localCheckpoints (simjoin/containment/incremental-minhash) are dumped
via their eager=False lazy form, which has the identical logical plan
(the dump_plans.py convention).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
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
        "r15",
    )
    os.makedirs(outdir, exist_ok=True)
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
