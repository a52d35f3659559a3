"""Tests for the retraction stream (normalize.normalize_pg_retractions)
and the streaming RollupMaintainer: image expansion per op, null-image
handling, batch-split invariance, replay idempotence, and pipeline
integration via on_raw_batch."""

import json

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.normalize import pg_retraction_stream
from cdc_redshift_spark.streaming.rollup import RollupMaintainer


def _env(op, before, after, ts=1000, off=0):
    return (
        json.dumps(
            {
                "before": json.dumps(before) if before else None,
                "after": json.dumps(after) if after else None,
                "source": {"db": "d", "table": "t", "ts_ms": ts},
                "op": op,
                "ts_ms": ts,
            }
        ),
        off,
    )


def _raw(spark, rows):
    return spark.createDataFrame(rows, "value string, offset long")


def test_retraction_expansion(spark):
    rows = [
        _env("c", None, {"id": 1, "v": 10}, off=0),
        _env("u", {"id": 1, "v": 10}, {"id": 1, "v": 12}, off=1),
        _env("d", {"id": 1, "v": 12}, None, off=2),
        _env("r", None, {"id": 2, "v": 5}, off=3),
    ]
    out = pg_retraction_stream(_raw(spark, rows), offset_col="offset")
    got = [
        (r["op"], r["sign"], json.loads(r["payload"])["v"])
        for r in out.orderBy("offset", "sign").collect()
    ]
    assert got == [
        ("insert", 1, 10),
        ("update", -1, 10),
        ("update", 1, 12),
        ("delete", -1, 12),
        ("load", 1, 5),
    ]


def test_null_before_on_update_modes(spark):
    """Without REPLICA IDENTITY FULL the update's before is NULL:
    the default raises (degraded mode must be loud); 'drop' removes
    the whole update; 'keep_after' keeps only the +1 image."""
    rows = [
        _env("u", None, {"id": 1, "v": 9}, off=0),
        _env("c", None, {"id": 2, "v": 3}, off=1),
    ]
    raw = _raw(spark, rows)
    with pytest.raises(Exception, match="REPLICA IDENTITY"):
        pg_retraction_stream(raw, offset_col="offset").collect()
    drop = pg_retraction_stream(
        raw, offset_col="offset", on_missing_before="drop"
    )
    assert [(r["op"], r["sign"]) for r in drop.collect()] == [("insert", 1)]
    keep = pg_retraction_stream(
        raw, offset_col="offset", on_missing_before="keep_after"
    )
    assert sorted((r["op"], r["sign"]) for r in keep.collect()) == [
        ("insert", 1),
        ("update", 1),
    ]


def test_delete_null_before_contributes_nothing(spark):
    rows = [_env("d", None, None, off=0)]
    out = pg_retraction_stream(_raw(spark, rows), offset_col="offset")
    assert out.count() == 0


def _prepare(r):
    return r.select(
        "sign",
        F.get_json_object("payload", "$.k").alias("k"),
        F.get_json_object("payload", "$.v").cast("decimal(18,4)").alias("v"),
    )


def _mk(spark, tmp):
    return RollupMaintainer(
        spark,
        str(tmp),
        _prepare,
        time_col=None,
        bucket=None,
        dims=["k"],
        measures={"sv": "v"},
    )


def _hist(spark):
    rows = [
        _env("c", None, {"k": "a", "v": 1}, off=0),
        _env("c", None, {"k": "a", "v": 2}, off=1),
        _env("c", None, {"k": "b", "v": 4}, off=2),
        _env("u", {"k": "a", "v": 2}, {"k": "b", "v": 8}, off=3),
        _env("d", {"k": "a", "v": 1}, None, off=4),
    ]
    return _raw(spark, rows)


def _state(m):
    cur = m.current()
    return {
        r["k"]: (r["n"], float(r["sv"])) for r in cur.collect()
    }


def test_maintainer_final_state(spark, tmp_path):
    m = _mk(spark, tmp_path / "r1")
    m.update(pg_retraction_stream(_hist(spark), offset_col="offset"), 0)
    # final rows: none under 'a' (one deleted, one moved), b: 4 + 8
    assert _state(m) == {"b": (2, 12.0)}


def test_maintainer_batch_split_invariance(spark, tmp_path):
    raw = _hist(spark)
    m = _mk(spark, tmp_path / "r2")
    m.update(
        pg_retraction_stream(
            raw.filter(F.col("offset") < 3), offset_col="offset"
        ),
        0,
    )
    mid = _state(m)
    assert mid == {"a": (2, 3.0), "b": (1, 4.0)}
    m.update(
        pg_retraction_stream(
            raw.filter(F.col("offset") >= 3), offset_col="offset"
        ),
        1,
    )
    assert _state(m) == {"b": (2, 12.0)}


def test_maintainer_replay_is_noop(spark, tmp_path):
    raw = _hist(spark)
    m = _mk(spark, tmp_path / "r3")
    b0 = pg_retraction_stream(raw, offset_col="offset")
    assert m.update(b0, 0) is True
    assert m.update(b0, 0) is False  # same batch id → skipped
    assert _state(m) == {"b": (2, 12.0)}
    assert m.committed_batch() == 0


def test_retractions_before_inserts_converge(spark, tmp_path):
    """The regression the offset-parity gate split exposed: a batch
    carrying ONLY retractions (deletes/update-befores) applied before
    the batch carrying the matching inserts must leave negative
    in-flight groups in the stored rollup — dropping them loses the
    retraction and over-counts after convergence."""
    raw = _hist(spark)
    m = _mk(spark, tmp_path / "r5")
    # batch 0: the delete and the update (retracts 'a' rows not yet seen)
    m.update(
        pg_retraction_stream(
            raw.filter(F.col("offset") >= 3), offset_col="offset"
        ),
        0,
    )
    mid = _state(m)
    assert mid["a"] == (-2, -3.0)  # in-flight retraction survives
    # batch 1: the original inserts arrive; state must converge exactly
    m.update(
        pg_retraction_stream(
            raw.filter(F.col("offset") < 3), offset_col="offset"
        ),
        1,
    )
    assert _state(m) == {"b": (2, 12.0)}


def test_pipeline_on_raw_batch_drives_maintainer(spark, tmp_path):
    """End-to-end: CdcPipeline applies table state while on_raw_batch
    maintains the rollup from the same batches."""
    from cdc_redshift_spark.normalize import pg_changeset
    from cdc_redshift_spark.sinks.parquet_sink import ParquetSink
    from cdc_redshift_spark.streaming.pipeline import CdcPipeline

    m = _mk(spark, tmp_path / "r4")
    sink = ParquetSink(spark, str(tmp_path / "sink"), keys=("key",))
    pipe = CdcPipeline(
        lambda raw: pg_changeset(raw, key_path="$.k", offset_col="offset"),
        sink,
        on_raw_batch=lambda bid, raw: m.update(
            pg_retraction_stream(raw, offset_col="offset"), bid
        ),
    )
    raw = _hist(spark)
    pipe.process_batch(raw.filter(F.col("offset") < 3), 0)
    pipe.process_batch(raw.filter(F.col("offset") >= 3), 1)
    assert _state(m) == {"b": (2, 12.0)}
    assert m.committed_batch() == 1
    assert pipe.stats.batches == 2


def test_maintainer_version_retention_bounded(spark, tmp_path):
    """A continuous stream commits one snapshot version per batch;
    keep_versions pruning on every commit must bound the on-disk
    version count (VERDICT r6 #8 — unbounded versions otherwise)."""
    import os

    m = _mk(spark, tmp_path / "r")
    for i in range(12):
        m.update(
            pg_retraction_stream(
                _raw(spark, [_env("c", None, {"k": f"k{i}", "v": 1}, off=i)])
            ),
            i,
        )
    vdirs = [
        d
        for d in os.listdir(tmp_path / "r")
        if d.startswith("v") and d[1:].isdigit()
    ]
    assert len(vdirs) <= m.keep_versions, vdirs
    assert m.committed_batch() == 11
    # latest state intact after pruning
    assert len(_state(m)) == 12


def test_rollup_maintainer_untouched_buckets_hard_linked(spark, tmp_path):
    """Round-11 bounded-IO certificate for the rollup maintainer: a
    batch touching ONE group rewrites only that group's hash bucket;
    every other bucket's files carry the SAME INODES forward
    (hard-linked, never re-read) — matters once the rollup grain is
    high-cardinality and the state grows with data."""
    import os

    from cdc_redshift_spark.streaming.snapshots import BUCKET_COL

    seed = [
        _env("c", None, {"k": f"k{i}", "v": i}, off=i) for i in range(40)
    ]
    m = RollupMaintainer(
        spark, str(tmp_path / "ru"), _prepare, time_col=None, bucket=None,
        dims=["k"], measures={"sv": "v"}, n_buckets=8,
    )
    assert m.update(pg_retraction_stream(_raw(spark, seed), offset_col="offset"), 0)

    def inodes(v):
        vdir = tmp_path / "ru" / f"v{v}"
        return {
            d: {
                fn: os.stat(vdir / d / fn).st_ino
                for fn in os.listdir(vdir / d)
                if not fn.startswith((".", "_"))
            }
            for d in os.listdir(vdir)
            if d.startswith(f"{BUCKET_COL}=")
        }

    v0 = inodes(0)
    assert len(v0) > 1
    b1 = [_env("c", None, {"k": "k0", "v": 100}, off=100)]
    d1 = pg_retraction_stream(_raw(spark, b1), offset_col="offset")
    assert m.update(d1, 1)
    v1 = inodes(1)
    from cdc_redshift_spark.operators.incremental import rollup_delta_signed
    touched = m.touched_buckets(
        rollup_delta_signed(_prepare(d1), time_col=None, bucket=None,
                            dims=["k"], measures={"sv": "v"})
    )
    assert len(touched) == 1
    tdir = f"{BUCKET_COL}={touched[0]}"
    for d, files in v0.items():
        if d == tdir:
            continue
        assert v1[d] == files, f"untouched bucket {d} was rewritten"
    got = {(r.k, str(r.sv)) for r in m.current().collect()}
    assert ("k0", "100.0000") in got and len(got) == 40


def test_rollup_maintainer_survives_state_emptying_batch(spark, tmp_path):
    """Review r11 regression: a batch retracting EVERY group produced
    a bucketed version holding only _SUCCESS (a partitionBy write of
    an empty frame emits no schema file), wedging current() and every
    later update() with UNABLE_TO_INFER_SCHEMA.  The store must
    survive the empty state — and keep accepting batches after it."""
    seed = [
        _env("c", None, {"k": f"k{i}", "v": i + 1}, off=i) for i in range(6)
    ]
    m = RollupMaintainer(
        spark, str(tmp_path / "ru"), _prepare, time_col=None, bucket=None,
        dims=["k"], measures={"sv": "v"}, n_buckets=8,
    )
    assert m.update(pg_retraction_stream(_raw(spark, seed), offset_col="offset"), 0)
    wipe = [
        _env("d", {"k": f"k{i}", "v": i + 1}, None, off=100 + i)
        for i in range(6)
    ]
    assert m.update(pg_retraction_stream(_raw(spark, wipe), offset_col="offset"), 1)
    assert m.current().count() == 0  # readable, not wedged
    back = [_env("c", None, {"k": "x", "v": 7}, off=200)]
    assert m.update(pg_retraction_stream(_raw(spark, back), offset_col="offset"), 2)
    got = {(r.k, str(r.sv)) for r in m.current().collect()}
    assert got == {("x", "7.0000")}
    # and the store re-bucketed itself after the empty (unbucketed)
    # fallback version — the bound is back for the next triggers
    assert m._bucketed_on_disk()


# -- pruned-commit equivalence property ------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# random signed rows over a small key domain: retraction-ahead-of-
# insert transients, groups crossing zero, and keys confined to a few
# of the 8 buckets all occur naturally
signed_batches = st.lists(
    st.lists(
        st.tuples(
            st.sampled_from([1, -1]),                   # sign
            st.sampled_from(["a", "b", "c", "d"]),      # group key
            st.integers(min_value=1, max_value=3),      # measure
        ),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=3,
)


@given(batches=signed_batches)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rollup_pruned_commits_equal_unbucketed(spark, tmp_path_factory, batches):
    """The bucketed store's pruned commit path is semantics-free: for
    ANY signed batch sequence, a maintainer committing through pruned
    bucket reads + hard-links (n_buckets=8) ends with the identical
    stored state to one doing full rewrites (n_buckets=0) — including
    negative transient groups and groups that cancel to zero."""
    states = []
    for n_buckets in (0, 8):
        tmp = tmp_path_factory.mktemp(f"ru_eq_{n_buckets}")
        m = RollupMaintainer(
            spark, str(tmp), lambda r: r, time_col=None, bucket=None,
            dims=["k"], measures={"sum_v": "v"}, n_buckets=n_buckets,
        )
        for i, b in enumerate(batches):
            df = spark.createDataFrame(
                [(s, k, float(v)) for s, k, v in b],
                "sign int, k string, v double",
            )
            m.update(df, i)
        cur = m.current()
        states.append(
            sorted(
                (r["k"], r["n"], float(r["sum_v"]))
                for r in (cur.collect() if cur is not None else [])
            )
        )
    assert states[0] == states[1]
