"""Conditional MERGE INTO builder (plans/merge.merge_into): Delta
clause-order semantics, per-branch defaults, ambiguity guard."""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.plans.merge import merge_into


def _frames(spark):
    t = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, status string, v long",
    )
    s = spark.createDataFrame(
        [(1, "del", None), (2, "upd", 25), (3, "upd", 5), (9, "ins", 90)],
        "k long, op string, v long",
    )
    return t, s


def test_merge_clause_order_and_defaults(spark):
    t, s = _frames(spark)
    out = (
        merge_into(t, s, ["k"])
        .when_matched_delete(condition="s.op = 'del'")
        .when_matched_update(
            set={"v": "s.v", "status": "'U'"},
            condition="s.v > t.v",
        )
        .when_not_matched_insert(
            values={"k": "s.k", "status": "'N'", "v": "s.v"},
            condition="s.op = 'ins'",
        )
        .execute()
    )
    rows = {r.k: (r.status, r.v) for r in out.collect()}
    # k=1 deleted; k=2 updated (25 > 20); k=3 kept (5 < 30, no clause
    # matched -> keep); k=9 inserted with the mapped values
    assert rows == {2: ("U", 25), 3: ("c", 30), 9: ("N", 90)}


def test_merge_partial_insert_values_null_unmapped(spark):
    """Delta insert semantics: a values dict populates EXACTLY the
    mapped columns; unmapped target columns are NULL even when a
    same-named source column exists."""
    t, s = _frames(spark)
    out = (
        merge_into(t, s, ["k"])
        .when_not_matched_insert(
            values={"k": "s.k", "status": "'N'"}, condition="s.op = 'ins'"
        )
        .execute()
    )
    rows = {r.k: (r.status, r.v) for r in out.collect()}
    assert rows[9] == ("N", None)  # v NOT copied from source


def test_merge_by_source_clauses(spark):
    t, s = _frames(spark)
    s2 = s.where(F.col("k") == 2)  # only k=2 in source
    out = (
        merge_into(t, s2, ["k"])
        .when_matched_update(set={"v": "s.v"})
        .when_not_matched_by_source_delete(condition="t.v >= 30")
        .when_not_matched_by_source_update(set={"status": "'STALE'"})
        .execute()
    )
    rows = {r.k: (r.status, r.v) for r in out.collect()}
    # k=1 unmatched, v=10 < 30 -> falls to second clause -> STALE
    # k=2 matched update; k=3 unmatched, v=30 -> deleted
    assert rows == {1: ("STALE", 10), 2: ("b", 25)}


def test_merge_first_true_clause_wins(spark):
    t, s = _frames(spark)
    out = (
        merge_into(t, s, ["k"])
        .when_matched_update(set={"v": F.lit(111)})  # unconditional FIRST
        .when_matched_delete()  # never reached
        .execute()
    )
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: 111, 2: 111, 3: 111}


def test_merge_duplicate_source_raises(spark):
    t, _ = _frames(spark)
    dup = spark.createDataFrame(
        [(1, "upd", 5), (1, "upd", 6)], "k long, op string, v long"
    )
    b = merge_into(t, dup, ["k"]).when_matched_update(set={"v": "s.v"})
    with pytest.raises(ValueError, match="multiple rows per key"):
        b.execute()
    # opt-out skips the check (caller-deduped contract)
    merge_into(t, dup.limit(1), ["k"], check_duplicate_source=False)\
        .when_matched_update(set={"v": "s.v"}).execute()


def test_merge_no_clauses_raises(spark):
    t, s = _frames(spark)
    with pytest.raises(ValueError, match="no WHEN clauses"):
        merge_into(t, s, ["k"]).execute()


def test_merge_insert_missing_target_col_is_typed_null(spark):
    t = spark.createDataFrame([(1, "a", 10)], "k long, status string, v long")
    s = spark.createDataFrame([(5, "x")], "k long, extra string")
    out = (
        merge_into(t, s, ["k"])
        .when_not_matched_insert()
        .execute()
    )
    rows = {r.k: (r.status, r.v) for r in out.collect()}
    assert rows == {1: ("a", 10), 5: (None, None)}


def test_merge_survives_marker_named_columns(spark):
    """r15 review hunt: a table legitimately carrying __t / __s /
    __act columns must not have them overwritten by the builder's
    internal markers (the _broadcast_apply '__m' discipline, applied
    to merge_into)."""
    t = spark.createDataFrame(
        [(1, "a", True), (2, "b", False)], "k int, v string, __act boolean"
    )
    s = spark.createDataFrame(
        [(2, "B", True), (3, "C", False)], "k int, v string, __act boolean"
    )
    out = (
        merge_into(t, s, keys=["k"])
        .when_matched_update({"v": "s.v", "__act": "s.__act"})
        .when_not_matched_insert()
        .execute()
    )
    got = {r.k: (r.v, r["__act"]) for r in out.collect()}
    assert got == {1: ("a", True), 2: ("B", True), 3: ("C", False)}
