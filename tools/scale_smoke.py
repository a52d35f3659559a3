"""Scale smoke: measure hot-operator wall time on 10x-scaled corpora.

Synthesizes larger inputs by replicating the sf0.1 tables with id
offsets (documents exactly — keeping the shingle vocabulary and the
bitmap verify path — and vectors/events perturbed), then times:

  - dedup_minhash_lsh on 5k -> 20k docs (threshold 0.9 bounds the
    emitted pair list; exact replicas make bucket sizes grow linearly,
    so verify work grows QUADRATICALLY — the worst case)
  - rh_lsh_topk on 2k -> 8k vectors
  - CDC apply batch on 221k -> ~900k events

Prints one JSON line per measurement. Not part of bench.py: this is
the scaling-evidence artifact behind SCALE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_redshift_spark.session import get_spark
from cdc_redshift_spark.sources.tables import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "4"))


def replicate_docs(docs, n):
    parts = []
    for i in range(n):
        # exact replication: keeps the shingle vocabulary (and thus the
        # bitmap verify path) unchanged; replica groups become exact-dup
        # clusters, so bucket sizes grow linearly and verify work grows
        # quadratically — the honest worst case for template-heavy data
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"), "text"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_emb(emb, n):
    parts = []
    for i in range(n):
        shift = F.lit(0.01 * (i + 1))
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding", lambda x, j: x + shift * F.cos(j.cast("double") + F.lit(float(i)))
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    spark = get_spark("scale_smoke")
    from cdc_redshift_spark.operators.dedup import minhash_lsh_pairs
    from cdc_redshift_spark.operators.similarity import rh_lsh_topk

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")

    # warm the Python/Arrow worker pool + JIT outside any timed window
    minhash_lsh_pairs(docs.limit(200), jaccard_threshold=0.9).count()
    rh_lsh_topk(emb.limit(200), k=3, n_planes=4, n_tables=8, dim=64).count()

    for scale, d in ((1, docs), (REPLICAS, replicate_docs(docs, REPLICAS))):
        d = d.persist()
        n = d.count()
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(d, jaccard_threshold=0.9)
        npairs = pairs.count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "dedup_minhash_lsh", "docs": n, "pairs": npairs, "sec": wall}), flush=True)
        # capped variant: replica groups are exactly the template-heavy
        # worst case the bucket cap exists for — worst-bucket verify is
        # bounded at cap² so wall should grow ~linearly, not 4.8x
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(d, jaccard_threshold=0.9, max_bucket_size=128)
        npairs = pairs.count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "dedup_minhash_lsh_cap128", "docs": n, "pairs": npairs, "sec": wall}), flush=True)
        d.unpersist()

    for scale, e in ((1, emb), (REPLICAS, replicate_emb(emb, REPLICAS))):
        e = e.persist()
        n = e.count()
        t0 = time.perf_counter()
        out = rh_lsh_topk(e, k=3, n_planes=4, n_tables=8, dim=64)
        nrows = out.count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "rh_lsh_topk", "vectors": n, "rows": nrows, "sec": wall}), flush=True)
        e.unpersist()

    # round-4 operators ------------------------------------------------
    from cdc_redshift_spark.functions.text import winnow_fingerprints_df
    from cdc_redshift_spark.operators.similarity import pq_codebooks, pq_encode
    from cdc_redshift_spark.operators.temporal import asof_join

    # winnowing: replicas keep per-doc cost constant -> expect linear
    for scale, d in ((1, docs), (REPLICAS, replicate_docs(docs, REPLICAS))):
        d = d.persist()
        n = d.count()
        t0 = time.perf_counter()
        nrows = winnow_fingerprints_df(d, id_col="doc_id").count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "winnow_fingerprints", "docs": n, "rows": nrows, "sec": wall}), flush=True)
        d.unpersist()

    # PQ encode: fixed codebook, linear scan -> expect linear
    books = pq_codebooks(emb, n_sub=8, ks=16)
    for scale, e in ((1, emb), (REPLICAS, replicate_emb(emb, REPLICAS))):
        e = e.persist()
        n = e.count()
        t0 = time.perf_counter()
        nrows = pq_encode(e, books).count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "pq_encode", "vectors": n, "rows": nrows, "sec": wall}), flush=True)
        e.unpersist()

    # as-of join: replicas shift user_id, so keys scale and per-key
    # window size stays constant -> expect ~linear
    ev = load_table(spark, SF, "events").withColumn(
        "e_us", F.expr("ts_ns div 1000")
    ).select("event_id", "user_id", "event_type", "value", "e_us")
    ev_parts = [
        ev.select(
            (F.col("event_id") + i * 100_000_000).alias("event_id"),
            (F.col("user_id") + i * 1_000_000).alias("user_id"),
            "event_type", "value", "e_us",
        )
        for i in range(REPLICAS)
    ]
    big_ev = ev_parts[0]
    for p in ev_parts[1:]:
        big_ev = big_ev.unionByName(p)
    for tag, E in (("1x", ev), (f"{REPLICAS}x", big_ev)):
        E = E.persist()
        n = E.count()
        purchases = E.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "e_us", "value"
        )
        clicks = E.filter(F.col("event_type") == "click").select(
            "user_id", F.col("e_us").alias("c_us"),
            F.col("event_id").alias("click_id"),
        )
        t0 = time.perf_counter()
        nrows = asof_join(
            purchases, clicks, on=["user_id"], left_ts="e_us",
            right_ts="c_us", payload=["click_id"], tiebreak="click_id",
        ).count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "asof_join", "events": n, "rows": nrows, "sec": wall}), flush=True)
        E.unpersist()

    # hot-key as-of: 90% of events on ONE user — the window-skew worst
    # case.  Unsalted, every hot-key row lands in one window task;
    # salt_bucket_len splits the hot key's timeline across tasks.  The
    # informative signal is the salted wall staying bounded as the hot
    # key grows (the unsalted wall is measured alongside for contrast).
    hot = big_ev.withColumn(
        "user_id",
        F.when(F.rand(seed=7) < 0.9, F.lit(1)).otherwise(F.col("user_id")),
    ).persist()
    n = hot.count()
    h_purch = hot.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "e_us", "value"
    )
    h_clicks = hot.filter(F.col("event_type") == "click").select(
        "user_id", F.col("e_us").alias("c_us"),
        F.col("event_id").alias("click_id"),
    )
    span_us = hot.agg(
        (F.max("e_us") - F.min("e_us")).alias("s")
    ).collect()[0]["s"]
    bucket = max(1, int(span_us) // 256)  # ~256 time slices per key
    for tag, kw in (("unsalted", {}), ("salted", {"salt_bucket_len": bucket})):
        t0 = time.perf_counter()
        nrows = asof_join(
            h_purch, h_clicks, on=["user_id"], left_ts="e_us",
            right_ts="c_us", payload=["click_id"], tiebreak="click_id", **kw,
        ).count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": f"asof_join_hotkey_{tag}", "events": n, "rows": nrows, "sec": wall}), flush=True)
    hot.unpersist()

    # CDC apply at 10x: union the synth changelog with offset/key shifts
    from cdc_redshift_spark.dedup import latest_per_key
    from cdc_redshift_spark.normalize import pg_changeset
    from cdc_redshift_spark.plans.merge import apply_changeset
    from cdc_redshift_spark.queries.cdc import synth_pg_changelog

    raw1 = synth_pg_changelog(spark, SF)
    # warm the parse→dedup→merge codegen on a slice OUTSIDE the timed
    # window (same policy as bench.py: whole-stage-codegen compilation
    # of the wide JSON path costs seconds and is not the operator)
    warm = latest_per_key(
        pg_changeset(raw1.limit(2000), offset_col="offset"),
        keys=("db", "table", "key"),
    )
    apply_changeset(None, warm, keys=("db", "table", "key")).write.format(
        "noop"
    ).mode("overwrite").save()
    parts = []
    for i in range(REPLICAS):
        parts.append(
            raw1.select(
                F.regexp_replace("value", '"id":', f'"id":{i}00').alias("value"),
                (F.col("offset") + i * 100_000_000).alias("offset"),
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    for tag, r in (("1x", raw1), (f"{REPLICAS}x", big)):
        r = r.persist()
        n = r.count()
        t0 = time.perf_counter()
        ch = latest_per_key(pg_changeset(r, offset_col="offset"), keys=("db", "table", "key"))
        apply_changeset(None, ch, keys=("db", "table", "key")).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "cdc_apply_batch", "events": n, "sec": wall, "rec_per_s": round(n / wall)}), flush=True)
        r.unpersist()

    # incremental rollup maintenance: THE claim is that applying a
    # fixed-size changeset costs ~the changeset, not the base table.
    # Base events replicated 1x -> Rx with a CONSTANT ~15k-row
    # changeset; the stored rollup is materialized to parquet first
    # (as it would be in production).  Expect: full recompute grows
    # with R, incremental stays ~flat (its delta fold touches only
    # the changeset; the merge touches only group rows).
    import tempfile

    from cdc_redshift_spark.operators.incremental import (
        apply_rollup_delta,
        rollup_delta,
    )

    ev0 = load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    changes = ev0.filter(F.col("event_id") % 100 == 0).select(
        F.when(F.col("event_id") % 200 == 0, "delete")
        .otherwise("insert")
        .alias("op"),
        "ts", "event_type", "v",
    ).persist()
    n_changes = changes.count()
    for scale in (1, REPLICAS):
        base_parts = [
            ev0.select(
                (F.col("event_id") + i * 100_000_000).alias("event_id"),
                "ts", "event_type", "v",
            )
            for i in range(scale)
        ]
        base = base_parts[0]
        for p in base_parts[1:]:
            base = base.unionByName(p)
        base = base.persist()
        n_base = base.count()
        rollup0 = base.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        with tempfile.TemporaryDirectory() as tmp:
            rollup0.write.mode("overwrite").parquet(f"{tmp}/rollup")
            stored = spark.read.parquet(f"{tmp}/rollup")
            t0 = time.perf_counter()
            d = rollup_delta(
                changes, time_col="ts", bucket="hour",
                dims=["event_type"], measures={"sum_v": "v"},
            )
            apply_rollup_delta(
                stored, d, dims=["event_type"], measures=["sum_v"]
            ).write.format("noop").mode("overwrite").save()
            incr_wall = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            base.groupBy(
                F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type"
            ).agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
            ).write.format("noop").mode("overwrite").save()
            full_wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "op": "incremental_rollup", "base_events": n_base,
            "changeset": n_changes, "incremental_sec": incr_wall,
            "full_recompute_sec": full_wall,
        }), flush=True)
        base.unpersist()
    changes.unpersist()


    # round-5 operators ------------------------------------------------
    # prefix-filtered similarity join: replicas get per-replica vowel
    # permutations (F.translate), so replica vocabularies are disjoint
    # -> input grows 4x, qualifying pairs grow ~4x, and the candidate
    # join must stay ~linear (prefix tokens never cross replicas)
    from cdc_redshift_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_frames,
    )
    from cdc_redshift_spark.operators.simjoin import jaccard_similarity_join

    VOWELS = "aeiou"
    PERMS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio", "eaiou", "aieou", "aeoiu"]
    # vowel permutation leaves vowel-free tokens (numbers, consonant-only
    # words) shared across replicas, so disjointness is approximate —
    # good enough for the linearity probe on this prose-like fixture,
    # but replica counts beyond the distinct permutations would create
    # EXACT duplicates and invalidate the measurement outright
    if REPLICAS > len(PERMS):
        raise ValueError(
            f"SCALE_REPLICAS={REPLICAS} exceeds the {len(PERMS)} distinct "
            "vowel permutations; replicas would exactly duplicate"
        )

    def translated_docs(docs, n):
        parts = []
        for i in range(n):
            parts.append(
                docs.select(
                    (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                    F.translate("text", VOWELS, PERMS[i % len(PERMS)]).alias(
                        "text"
                    ),
                )
            )
        out = parts[0]
        for q in parts[1:]:
            out = out.unionByName(q)
        return out

    jaccard_similarity_join(docs.limit(200), tau=0.9).count()  # warm
    for scale in (1, REPLICAS):
        d = translated_docs(docs, scale).persist()
        n = d.count()
        t0 = time.perf_counter()
        npairs = jaccard_similarity_join(d, tau=0.9).count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "jaccard_simjoin", "docs": n, "pairs": npairs, "sec": wall}), flush=True)
        d.unpersist()

    # incremental minhash: FIXED 500-doc batch probed against a growing
    # signed index -> per-batch wall should grow far slower than the
    # index (the whole point of indexing: batch cost, not corpus cost)
    batch = docs.limit(500).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
    )
    bf = minhash_frames(batch).persist()
    bf.count()
    for scale in (1, REPLICAS):
        idx = minhash_frames(translated_docs(docs, scale)).persist()
        n = idx.count()
        t0 = time.perf_counter()
        # bands=4 (r=8): the banding for a 0.9 threshold — the default
        # 8x4 is tuned for ~0.5-0.6 and floods the candidate set with
        # sub-threshold pairs on a template-heavy corpus (measured
        # 836k candidates -> 12k for the same 541 survivors)
        npairs = incremental_minhash_pairs(
            idx, bf, bands=4, jaccard_threshold=0.9
        ).count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "incremental_minhash_batch500", "index_docs": n, "pairs": npairs, "sec": wall}), flush=True)
        idx.unpersist()
    bf.unpersist()

    # streaming ingest dedup: 3 waves through the persisted-index
    # foreachBatch stage; rate = docs/s including index read+append.
    # Wave cost must track the WAVE, not the accumulated corpus.
    import shutil as _sh
    import tempfile as _tf

    from cdc_redshift_spark.streaming.ingest import IngestDeduper

    for scale in (1, REPLICAS):
        d = translated_docs(docs, scale).persist()
        n = d.count()
        root = _tf.mkdtemp(prefix="scale_ingest_")
        dd = IngestDeduper(root + "/idx", root + "/acc")
        t0 = time.perf_counter()
        for w in range(3):
            dd(d.where((F.col("doc_id") % 3) == w), w)
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "ingest_dedup_3waves", "docs": n, "sec": wall, "docs_per_s": int(n / wall)}), flush=True)
        _sh.rmtree(root, ignore_errors=True)
        d.unpersist()

    # round-6 second pass ----------------------------------------------
    # SCD2: a CONSTANT ~3k-change batch applied to a history built over
    # 1x -> Rx events.  scd2_apply must stay far under the full rebuild
    # (its only shuffle is the batch window; the history side is a
    # broadcast-cut projection, no sort), and the gap must WIDEN with R.
    from cdc_redshift_spark.operators.incremental import (
        scd2_apply,
        scd2_history,
    )

    ev_ch = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value",
        F.when(F.pmod(F.col("event_id"), F.lit(7)) == 0, F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
    )
    kw = dict(keys=["user_id"], ts_col="ts",
              attrs=["event_type", "value"], tiebreak=["event_id"])
    batch = ev_ch.where(F.col("event_id") % 64 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 365 DAYS")
    ).persist()
    n_batch = batch.count()
    # 16x, not REPLICAS: below ~1M history rows Tungsten's window sort
    # rebuilds faster than the broadcast-close scan costs (measured
    # 0.4-0.5 s either way at 86k rows) — the apply-vs-rebuild gap
    # only becomes visible past the in-memory sort knee, same honest
    # crossover story as the salted-window family (SCALE.md)
    for scale in (1, max(16, REPLICAS)):
        parts = [
            ev_ch.select(
                (F.col("user_id") + i * 1_000_000).alias("user_id"),
                "ts", "event_id", "event_type", "value", "op",
            )
            for i in range(scale)
        ]
        big = parts[0]
        for q in parts[1:]:
            big = big.unionByName(q)
        hist = scd2_history(big, **kw).persist()
        n_hist = hist.count()
        t0 = time.perf_counter()
        scd2_apply(hist, batch, **kw).write.format("noop").mode(
            "overwrite"
        ).save()
        apply_wall = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        scd2_history(big.unionByName(batch.select(*big.columns)), **kw).write.format(
            "noop"
        ).mode("overwrite").save()
        rebuild_wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "op": "scd2_apply_batch", "history_rows": n_hist,
            "batch": n_batch, "apply_sec": apply_wall,
            "full_rebuild_sec": rebuild_wall,
        }), flush=True)
        hist.unpersist()
    batch.unpersist()

    # join-view IVM: CONSTANT delta against a 1x -> Rx fact table
    # stored bucket-partitioned by key (the 100 TB layout), with the
    # delta confined to ONE bucket.  Maintenance reads only the
    # touched bucket's files (partition pruning via the delta's
    # bucket set — a bounded collect, |delta buckets| values) plus
    # the tiny stored view; full recompute scans and joins the whole
    # fact.  Expect: maintain flat, recompute growing with R.
    import tempfile as _ivm_tf

    from cdc_redshift_spark.operators.incremental import (
        apply_view_delta,
        join_view_delta,
    )

    N_BUCKETS = 64
    o0 = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_orderstatus"
    )
    c0 = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    cols = ["custkey", "o_orderstatus", "c_mktsegment"]
    # the delta is on the DIM side (customer deletes), all in bucket 0
    # -> part2's fact scan (L_new x dR) prunes to 1/64 of the files;
    # part1 (dL x R_old) is an empty broadcast
    d_c = c0.where(F.pmod(F.col("custkey"), F.lit(N_BUCKETS)) == 0).select(
        "custkey", "c_mktsegment", F.lit(-1).alias("sign")
    ).persist()
    n_delta = d_c.count()
    d_o = o0.limit(0).select(
        "custkey", "o_orderstatus", F.lit(1).alias("sign")
    )
    touched = sorted(
        r[0]
        for r in d_c.select(
            F.pmod(F.col("custkey"), F.lit(N_BUCKETS)).alias("b")
        ).distinct().collect()
    )  # bounded: <= N_BUCKETS values
    for scale in (1, REPLICAS, 4 * REPLICAS):
        parts = [
            o0.select(
                "custkey",
                (F.col("o_orderkey") + i * 100_000_000).alias("o_orderkey"),
                "o_orderstatus",
            )
            for i in range(scale)
        ]
        fact = parts[0]
        for q in parts[1:]:
            fact = fact.unionByName(q)
        with _ivm_tf.TemporaryDirectory() as tmp:
            fact.withColumn(
                "bucket", F.pmod(F.col("custkey"), F.lit(N_BUCKETS))
            ).write.partitionBy("bucket").mode("overwrite").parquet(
                f"{tmp}/fact"
            )
            stored_fact = spark.read.parquet(f"{tmp}/fact")
            view0 = (
                stored_fact.join(c0, "custkey")
                .groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            view0.write.mode("overwrite").parquet(f"{tmp}/view")
            stored_view = spark.read.parquet(f"{tmp}/view")
            n_fact = stored_fact.count()
            t0 = time.perf_counter()
            pruned = stored_fact.where(
                F.col("bucket").isin(*touched)
            ).select("custkey", "o_orderstatus")
            delta = join_view_delta(
                d_o, pruned, d_c, c0, on=["custkey"], cols=cols
            )
            apply_view_delta(stored_view, delta, cols).write.format(
                "noop"
            ).mode("overwrite").save()
            maint_wall = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            stored_fact.join(c0, "custkey").groupBy(*cols).agg(
                F.count(F.lit(1)).alias("cnt")
            ).write.format("noop").mode("overwrite").save()
            full_wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "op": "join_view_ivm", "fact_rows": n_fact, "delta": n_delta,
            "touched_buckets": len(touched), "n_buckets": N_BUCKETS,
            "maintain_sec": maint_wall, "full_recompute_sec": full_wall,
        }), flush=True)
    d_c.unpersist()

    # BM25: corpus 1x -> Rx (vowel-permuted replicas keep term stats
    # non-degenerate); wall must grow ~linearly — the tf shuffle
    # carries only matching postings, df and stats stay tiny.
    from cdc_redshift_spark.operators.corpus import bm25_topk

    for scale in (1, REPLICAS):
        d = translated_docs(docs, scale).persist()
        n = d.count()
        t0 = time.perf_counter()
        bm25_topk(d, ["merge", "spark", "stream", "window"], k=25).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"op": "bm25_topk", "docs": n, "sec": wall}), flush=True)
        d.unpersist()

    round7_sections(spark, docs)


def round7_sections(spark, docs):
    # round-7 operators ------------------------------------------------
    # (1) Bloom index maintenance on a pruned commit: touching 1 of 32
    # partitions must pay ~1/32 of a full index rebuild (r6 VERDICT:
    # the old path re-scanned the whole snapshot per commit).
    import tempfile as _tf
    import shutil as _shutil

    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink

    # table 1x -> Rx with a CONSTANT one-key commit: the forced full
    # index rebuild must grow with the table, the pruned commit's
    # index maintenance must stay ~flat (it scans 1/32 partitions).
    orders_base = load_table(spark, SF, "orders")
    for scale in (1, REPLICAS):
        o_parts = [
            orders_base.select(
                (F.col("o_orderkey") + i * 100_000_000).alias("k"),
                F.pmod(F.col("o_orderkey"), F.lit(32)).cast("string").alias("p"),
                F.col("o_custkey").alias("aux"),
                F.lit("insert").alias("op"),
                F.lit(1).cast("long").alias("ts_ms"),
                (F.col("o_orderkey") + i * 100_000_000).alias("offset"),
            )
            for i in range(scale)
        ]
        orders_ch = o_parts[0]
        for q in o_parts[1:]:
            orders_ch = orders_ch.unionByName(q)
        orders_ch = orders_ch.persist()
        n_orders = orders_ch.count()
        broot = _tf.mkdtemp(prefix="bloom_scale_")
        try:
            sink = ParquetSink(
                spark, broot, keys=("k",), partition_cols=("p",),
                bloom_index_cols=("aux",),
            )
            sink.apply_changeset("d", "t", orders_ch)
            one = orders_ch.where(F.col("k") == 7).withColumn(
                "ts_ms", F.lit(2).cast("long")
            )
            t0 = time.perf_counter()
            sink.apply_changeset("d", "t", one)  # pruned: 1/32 partitions
            pruned_commit = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            sink._build_bloom("d", "t", sink._latest_version("d", "t"))
            full_rebuild = round(time.perf_counter() - t0, 2)
            print(json.dumps({
                "op": "bloom_pruned_commit", "rows": n_orders,
                "partitions": 32,
                "pruned_commit_sec": pruned_commit,
                "forced_full_index_rebuild_sec": full_rebuild,
            }), flush=True)
        finally:
            _shutil.rmtree(broot, ignore_errors=True)
        orders_ch.unpersist()

    # (2) Ingest-layout compaction: 32 per-batch partitions fold to 1;
    # the per-batch probe read (the hot path) gets faster, and the
    # directory count — the 100 TB file-listing bottleneck — collapses.
    from cdc_redshift_spark.streaming.ingest import compact_batches

    iroot = _tf.mkdtemp(prefix="compact_scale_")
    try:
        fps = docs.select(F.md5("text").alias("fp")).limit(500).persist()
        fps.count()
        for i in range(32):
            fps.coalesce(2).write.mode("overwrite").parquet(
                f"{iroot}/batch={i}"
            )
        fps.unpersist()

        def probe_wall():
            t0 = time.perf_counter()
            spark.read.parquet(iroot).where(F.col("batch") < 32).count()
            return round(time.perf_counter() - t0, 3)

        before_dirs = len(os.listdir(iroot))
        before = min(probe_wall(), probe_wall())
        t0 = time.perf_counter()
        stats = compact_batches(spark, iroot, upto_batch=32)
        compact_sec = round(time.perf_counter() - t0, 2)
        after = min(probe_wall(), probe_wall())
        after_dirs = len(
            [d for d in os.listdir(iroot) if d.startswith("batch=")]
        )
        print(json.dumps({
            "op": "ingest_compaction", "rows": stats["rows"],
            "dirs_before": before_dirs, "dirs_after": after_dirs,
            "probe_before_sec": before, "probe_after_sec": after,
            "compact_sec": compact_sec,
        }), flush=True)
    finally:
        _shutil.rmtree(iroot, ignore_errors=True)

    # (3) SCD2 late repair is batch-proportional: rebuilding 20 keys
    # of the full user history must cost far less than the full
    # rebuild (broadcast semi-join prunes the changelog window).
    from cdc_redshift_spark.operators.incremental import (
        scd2_history,
        scd2_rebuild_keys,
    )

    # changelog 1x -> Rx with a CONSTANT 20-key repair: full rebuild
    # must grow with the log, repair must stay ~flat (broadcast
    # semi-join prunes the window to the touched keys).
    ev7 = load_table(spark, SF, "events")
    kw7 = dict(keys=["user_id"], ts_col="ts",
               attrs=["event_type", "value"], tiebreak=["event_id"])
    for scale in (1, REPLICAS):
        c_parts = [
            ev7.select(
                (F.col("user_id") + i * 10_000_000).alias("user_id"),
                "ts",
                (F.col("event_id") + i * 100_000_000).alias("event_id"),
                "event_type", "value",
                F.when(F.pmod(F.col("event_id"), F.lit(7)) == 0, "delete")
                .otherwise("update").alias("op"),
            )
            for i in range(scale)
        ]
        ch7 = c_parts[0]
        for q in c_parts[1:]:
            ch7 = ch7.unionByName(q)
        ch7 = ch7.persist()
        n_ch = ch7.count()
        sroot = _tf.mkdtemp(prefix="scd2_scale_")
        try:
            scd2_history(ch7, **kw7).write.mode("overwrite").parquet(
                f"{sroot}/hist"
            )
            stored = spark.read.parquet(f"{sroot}/hist")
            rk = ch7.select("user_id").distinct().limit(20)
            t0 = time.perf_counter()
            scd2_rebuild_keys(
                stored, ch7, ["user_id"], "ts", ["event_type", "value"],
                rk, tiebreak=["event_id"],
            ).write.format("noop").mode("overwrite").save()
            repair_sec = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            scd2_history(ch7, **kw7).write.format("noop").mode(
                "overwrite"
            ).save()
            full_sec = round(time.perf_counter() - t0, 2)
            print(json.dumps({
                "op": "scd2_late_repair", "changes": n_ch,
                "rebuilt_keys": 20, "repair_sec": repair_sec,
                "full_rebuild_sec": full_sec,
            }), flush=True)
        finally:
            _shutil.rmtree(sroot, ignore_errors=True)
        ch7.unpersist()

    # (4) PageRank: disjoint replica subgraphs -> per-iteration cost
    # must grow ~linearly with edges (each round is one key-partitioned
    # join + one groupBy; no global state).
    from cdc_redshift_spark.operators.graph import pagerank

    o7 = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    l7 = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    e1 = (
        o7.join(l7, o7["o_orderkey"] == l7["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    for scale in (1, REPLICAS):
        parts = [
            e1.select(
                F.concat(F.lit(f"r{i}_"), F.col("src")).alias("src"),
                F.concat(F.lit(f"r{i}_"), F.col("dst")).alias("dst"),
            )
            for i in range(scale)
        ]
        eN = parts[0]
        for q in parts[1:]:
            eN = eN.unionByName(q)
        eN = eN.persist()
        n_e = eN.count()
        t0 = time.perf_counter()
        pagerank(eN, iterations=3).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps(
            {"op": "pagerank_3iter", "edges": n_e, "sec": wall}
        ), flush=True)
        eN.unpersist()


if __name__ == "__main__":
    import sys as _sys

    if "--r7" in _sys.argv:  # rerun just the round-7 sections
        _sp = get_spark("scale_smoke_r7")
        round7_sections(_sp, load_table(_sp, SF, "documents"))
    else:
        main()
