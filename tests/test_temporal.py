"""Unit tests for operators/temporal.py: as-of join and interval join.

Each operator is checked against a brute-force reference computed with
plain joins/filters on the same tiny frame, plus edge cases the query
gate can't isolate (exact-tie match, tolerance cutoff, no-match NULLs,
interval cell boundaries).
"""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.temporal import asof_join, interval_join


@pytest.fixture(scope="module")
def trades(spark):
    # (key, ts, trade_id)
    rows = [
        ("A", 10, 1),
        ("A", 20, 2),
        ("A", 20, 3),  # tie at ts=20 -> max trade_id must win
        ("A", 35, 4),
        ("B", 5, 5),
    ]
    return spark.createDataFrame(rows, "k string, ts long, trade_id long")


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, px)
    rows = [
        ("A", 5, 100.0),
        ("A", 20, 101.0),  # exactly simultaneous with trades 2/3
        ("A", 30, 102.0),
        ("C", 1, 999.0),
    ]
    return spark.createDataFrame(rows, "k string, ts long, px double")


def _asof(trades, quotes, **kw):
    out = asof_join(
        trades,
        quotes.select("k", F.col("ts").alias("qts"), "px"),
        on=["k"],
        left_ts="ts",
        right_ts="qts",
        payload=["px"],
        **kw,
    )
    return {
        r["trade_id"]: (r["qts_m"], r["px_m"])
        for r in out.collect()
    }


def test_asof_backward_basic(trades, quotes):
    got = _asof(trades, quotes)
    assert got[1] == (5, 100.0)  # newest quote <= 10 is ts=5
    assert got[2] == (20, 101.0)  # simultaneous quote matches
    assert got[3] == (20, 101.0)
    assert got[4] == (30, 102.0)
    assert got[5] == (None, None)  # key B has no quotes -> NULL match


def test_asof_tolerance(trades, quotes):
    got = _asof(trades, quotes, tolerance=5)
    assert got[1] == (5, 100.0)  # gap 5 <= 5 kept
    assert got[2] == (20, 101.0)  # gap 0
    assert got[4] == (30, 102.0)  # gap 5
    # re-run with a tighter tolerance: gap 5 matches dropped
    got2 = _asof(trades, quotes, tolerance=4)
    assert got2[1] == (None, None)
    assert got2[2] == (20, 101.0)


def test_asof_right_tie_deterministic(spark, trades):
    # two quotes at the same (k, ts): the max-tiebreak row must win
    q = spark.createDataFrame(
        [("A", 20, 1.0, 10), ("A", 20, 2.0, 11), ("A", 20, 1.5, 9)],
        "k string, qts long, px double, qid long",
    )
    out = asof_join(
        trades,
        q,
        on=["k"],
        left_ts="ts",
        right_ts="qts",
        payload=["px", "qid"],
        tiebreak="qid",
    )
    by_trade = {r["trade_id"]: (r["px_m"], r["qid_m"]) for r in out.collect()}
    assert by_trade[4] == (2.0, 11)  # qid=11 is max at ts=20
    assert by_trade[1] == (None, None)  # ts=10 predates all quotes


def test_asof_string_tiebreak_native_type(spark, trades):
    """Non-numeric tiebreaks must work in their native type (a long
    cast would NULL them out and silently lose determinism)."""
    q = spark.createDataFrame(
        [("A", 20, 1.0, "uuid-a"), ("A", 20, 2.0, "uuid-z"), ("A", 20, 1.5, "uuid-m")],
        "k string, qts long, px double, qid string",
    )
    out = asof_join(
        trades, q, on=["k"], left_ts="ts", right_ts="qts",
        payload=["px", "qid"], tiebreak="qid",
    )
    by_trade = {r["trade_id"]: (r["px_m"], r["qid_m"]) for r in out.collect()}
    assert by_trade[4] == (2.0, "uuid-z")  # max string tiebreak wins


def test_interval_join_rejects_bad_cell(spark, trades):
    facts = spark.createDataFrame([(1, 5)], "fid long, fts long")
    ivs = spark.createDataFrame([(1, 0, 10)], "iid long, s long, e long")
    with pytest.raises(ValueError):
        interval_join(facts, ivs, "fts", "s", "e", cell=0)


def test_asof_matches_bruteforce(spark, trades, quotes):
    """Cross-check the window plan against a brute-force join+argmax."""
    q = quotes.select("k", F.col("ts").alias("qts"), "px")
    brute = (
        trades.join(q, "k", "left")
        .filter((F.col("qts") <= F.col("ts")) | F.col("qts").isNull())
        .groupBy("trade_id")
        .agg(F.max("qts").alias("qts_m"))
    )
    got = _asof(trades, quotes)
    for r in brute.collect():
        assert got[r["trade_id"]][0] == r["qts_m"]
    # trades with no qualifying quote at all must still be present
    assert set(got) == {1, 2, 3, 4, 5}


@pytest.mark.parametrize("cell", [1, 3, 7, 100])
def test_interval_join_matches_bruteforce(spark, cell):
    """Bucketed plan == brute-force inequality join, for cells smaller,
    comparable to, and larger than the interval lengths."""
    facts = spark.createDataFrame(
        [(i, 3 * i) for i in range(40)], "fid long, fts long"
    )
    ivs = spark.createDataFrame(
        [(100, 0, 10), (101, 10, 20), (102, 55, 55), (103, 90, 200)],
        "iid long, s long, e long",
    )
    got = {
        (r["fid"], r["iid"])
        for r in interval_join(facts, ivs, "fts", "s", "e", cell=cell).collect()
    }
    brute = {
        (r["fid"], r["iid"])
        for r in facts.crossJoin(ivs)
        .filter((F.col("fts") >= F.col("s")) & (F.col("fts") <= F.col("e")))
        .collect()
    }
    assert got == brute
    # inclusive bounds: the point interval [55, 55] matches iff some
    # fact lands exactly on 55 (none does here: facts are multiples of 3)
    assert any(i == 102 for _, i in got) == any(
        3 * f == 55 for f in range(40)
    )


def test_asof_null_timestamps(spark, trades):
    """NULL right_ts rows must never match (they'd otherwise be carried
    forward from the NULLS FIRST region); NULL left_ts rows match
    nothing."""
    q = spark.createDataFrame(
        [("A", None, 666.0), ("A", 15, 1.0)], "k string, qts long, px double"
    )
    t = trades.unionByName(
        spark.createDataFrame([("A", None, 99)], "k string, ts long, trade_id long")
    )
    out = asof_join(
        t, q, on=["k"], left_ts="ts", right_ts="qts", payload=["px"]
    )
    got = {r["trade_id"]: (r["qts_m"], r["px_m"]) for r in out.collect()}
    assert got[1] == (None, None)  # ts=10 predates qts=15; null row ignored
    assert got[2] == (15, 1.0)
    assert got[99] == (None, None)  # null left ts matches nothing
    assert 666.0 not in {v for _, v in got.values()}


def test_interval_join_negative_timestamps(spark):
    """Pre-epoch (negative) integer timestamps: Spark `div` truncates
    toward zero rather than flooring, but BOTH sides use the same div,
    and div is monotonic, so a qualifying fact's cell always lies in
    the interval's exploded cell range — pinned here."""
    facts = spark.createDataFrame(
        [(i, t) for i, t in enumerate(range(-25, 26, 5))], "fid long, fts long"
    )
    ivs = spark.createDataFrame(
        [(1, -22, -3), (2, -7, 8), (3, -30, 30)], "iid long, s long, e long"
    )
    got = {
        (r["fid"], r["iid"])
        for r in interval_join(facts, ivs, "fts", "s", "e", cell=10).collect()
    }
    brute = {
        (r["fid"], r["iid"])
        for r in facts.crossJoin(ivs)
        .filter((F.col("fts") >= F.col("s")) & (F.col("fts") <= F.col("e")))
        .collect()
    }
    assert got == brute


def test_asof_forward(spark, trades, quotes):
    """direction='forward': earliest quote at-or-after each trade."""
    q = quotes.select("k", F.col("ts").alias("qts"), "px")
    out = asof_join(
        trades, q, on=["k"], left_ts="ts", right_ts="qts",
        payload=["px"], direction="forward",
    )
    got = {r["trade_id"]: (r["qts_m"], r["px_m"]) for r in out.collect()}
    assert got[1] == (20, 101.0)  # earliest quote >= 10
    assert got[2] == (20, 101.0)  # simultaneous quote matches
    assert got[4] == (None, None)  # nothing after ts=35
    assert got[5] == (None, None)  # key B has no quotes
    # timestamps surface un-negated
    assert all(r["ts"] >= 0 for r in out.collect())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_random_bruteforce(spark, seed):
    """Randomized inputs (duplicate timestamps, unmatched keys, ties)
    against a pure-Python reference reducer."""
    import numpy as np

    rng = np.random.RandomState(seed)
    trades = [
        (int(rng.randint(0, 4)), int(rng.randint(0, 50)), i)
        for i in range(40)
    ]
    quotes = [
        (int(rng.randint(0, 5)), int(rng.randint(0, 50)), float(i), 1000 + i)
        for i in range(30)
    ]
    tdf = spark.createDataFrame(trades, "k long, ts long, trade_id long")
    qdf = spark.createDataFrame(quotes, "k long, qts long, px double, qid long")
    out = asof_join(
        tdf, qdf, on=["k"], left_ts="ts", right_ts="qts",
        payload=["px", "qid"], tiebreak="qid",
    )
    got = {r["trade_id"]: (r["qts_m"], r["qid_m"]) for r in out.collect()}
    for k, ts, tid in trades:
        cand = [(qts, qid, px) for (qk, qts, px, qid) in quotes
                if qk == k and qts <= ts]
        want = max(cand)[:2] if cand else (None, None)
        assert got[tid] == want, (seed, tid)


def test_interval_join_no_duplicate_pairs(spark):
    """A pair qualifying in a long interval appears exactly once even
    when the interval spans many cells."""
    facts = spark.createDataFrame([(1, 50)], "fid long, fts long")
    ivs = spark.createDataFrame([(9, 0, 1000)], "iid long, s long, e long")
    rows = interval_join(facts, ivs, "fts", "s", "e", cell=10).collect()
    assert len(rows) == 1


# ---------------------------------------------------------------------------
# salted (time-sliced) as-of: identical results to the unsalted plan
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bucket", [1, 7, 10, 1000])
def test_asof_salted_equals_unsalted(trades, quotes, bucket):
    """Every bucket width — smaller than gaps (cross-bucket carry
    exercised), aligned, and larger than the whole range (single
    bucket) — must reproduce the unsalted join exactly."""
    base = _asof(trades, quotes)
    assert _asof(trades, quotes, salt_bucket_len=bucket) == base


@pytest.mark.parametrize("bucket", [3, 50])
def test_asof_salted_tolerance_and_forward(trades, quotes, bucket):
    for kw in (
        {"tolerance": 10},
        {"direction": "forward"},
        {"tolerance": 5, "direction": "forward"},
    ):
        assert _asof(trades, quotes, salt_bucket_len=bucket, **kw) == _asof(
            trades, quotes, **kw
        ), kw


def test_asof_salted_tiebreak(spark, trades):
    """Right-side ts tie straddling phase 2's max_by: the max-tiebreak
    row must win in salted form too."""
    q = spark.createDataFrame(
        [("A", 20, 1.0, 1), ("A", 20, 2.0, 9), ("A", 4, 0.5, 3)],
        "k string, qts long, px double, seq long",
    )
    for kw in ({}, {"salt_bucket_len": 6}):
        out = asof_join(
            trades, q, on=["k"], left_ts="ts", right_ts="qts",
            payload=["px"], tiebreak="seq", **kw,
        )
        got = {r["trade_id"]: r["px_m"] for r in out.collect()}
        assert got[2] == 2.0 and got[3] == 2.0 and got[4] == 2.0, kw


def test_asof_salted_rejects_bad_bucket(trades, quotes):
    with pytest.raises(ValueError):
        _asof(trades, quotes, salt_bucket_len=0)


def test_latest_per_key_salted_equals_plain(spark):
    from cdc_redshift_spark.dedup import latest_per_key

    rows = [
        ("k1", ts, off, f"v{ts}-{off}")
        for ts in range(0, 50, 7)
        for off in range(3)
    ] + [("k2", 10, 0, "x"), ("k3", 1, 5, "y"), ("k3", 1, 6, "z")]
    df = spark.createDataFrame(rows, "key string, ts_ms long, offset long, v string")
    plain = {
        (r["key"], r["ts_ms"], r["offset"], r["v"])
        for r in latest_per_key(df, keys=("key",)).collect()
    }
    for salt in (2, 8):
        salted = {
            (r["key"], r["ts_ms"], r["offset"], r["v"])
            for r in latest_per_key(df, keys=("key",), salt=salt).collect()
        }
        assert salted == plain, salt
    with pytest.raises(ValueError):
        latest_per_key(df, keys=("key",), salt=1)


def test_session_transitions_gap_and_pairing(spark):
    """Transitions never cross the gap boundary, pairs follow (ts, id)
    order, and single-event sessions emit nothing."""
    from cdc_redshift_spark.operators.temporal import session_transitions

    m = 60 * 1_000_000_000  # one minute in ns
    rows = [
        # user 1, session 1: a -> b -> c (2 transitions)
        (1, 1, 0 * m, "a"),
        (2, 1, 1 * m, "b"),
        (3, 1, 2 * m, "c"),
        # 31-min gap -> session 2: d alone (0 transitions)
        (4, 1, 33 * m, "d"),
        # user 2: tie on ts broken by event_id: x(5) -> y(6)
        (5, 2, 0 * m, "x"),
        (6, 2, 0 * m, "y"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, event_type string"
    )
    got = sorted(
        (r.user_id, r.session_id, r.path)
        for r in session_transitions(df).collect()
    )
    assert got == [(1, 1, "a>b"), (1, 1, "b>c"), (2, 1, "x>y")]


def test_time_weighted_avg_step_semantics(spark):
    """TWAP weights by holding time: a value held 59 minutes dominates
    one held 1 minute regardless of observation count; the last value
    clips at the bucket end; same-ts ties get zero weight."""
    from cdc_redshift_spark.operators.temporal import time_weighted_avg

    m = 60 * 1_000_000_000
    h = 60 * m
    rows = [
        # user 1, hour 0: 10.0 held 0:00-0:54, then 100.0 held 0:54-1:00
        (1, 1, 0 * m, 10.0),
        (2, 1, 54 * m, 100.0),
        # user 2, hour 0: tie at t=0 (first gets 0 weight), then clip
        (3, 2, 0 * m, 500.0),
        (4, 2, 0 * m, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, value double"
    )
    got = {
        (r.user_id, r.bucket_us): (r.twap, r.n_obs)
        for r in time_weighted_avg(df).collect()
    }
    # user 1: (10*54 + 100*6)/60 = 19.0 — a plain AVG would say 55.0
    assert got[(1, 0)] == (19.0, 2)
    # user 2: 500 has zero hold; 20 holds the whole hour
    assert got[(2, 0)] == (20.0, 2)


def test_time_weighted_avg_guards_and_zero_weight(spark):
    import pytest as _pytest

    from cdc_redshift_spark.operators.temporal import time_weighted_avg

    df = spark.createDataFrame(
        [(1, 1, 3_600_000_000_000 - 500, 7.0)],
        "event_id long, user_id long, ts_ns long, value double",
    )
    with _pytest.raises(ValueError, match="bucket_ns must be"):
        time_weighted_avg(df, bucket_ns=0)
    # sole observation inside the bucket's last microsecond: total hold
    # rounds to 0 us — row KEPT with twap NULL, never silently dropped
    rows = time_weighted_avg(df).collect()
    assert len(rows) == 1 and rows[0].twap is None and rows[0].n_obs == 1


def test_asof_salted_keeps_null_ts_left_rows(spark):
    """r15 review hunt: the salted plan's phase-3 INNER equi-join on
    the bucket id silently dropped left rows with NULL ts (NULL bucket
    never equi-matches), while the unsalted window keeps them with a
    NULL match — the documented salted==unsalted contract."""
    from cdc_redshift_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("a", 100, "x"), ("a", None, "y"), ("b", 50, "z")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("a", 90, 1.0), ("b", 10, 2.0)], "k string, rts long, v double"
    )
    kw = dict(on=["k"], left_ts="ts", right_ts="rts", payload=["v"])
    plain = asof_join(left, right, **kw)
    salted = asof_join(left, right, salt_bucket_len=20, **kw)
    want = {("a", 100, 1.0), ("a", None, None), ("b", 50, 2.0)}
    got_plain = {(r.k, r.ts, r.v_m) for r in plain.collect()}
    got_salted = {(r.k, r.ts, r.v_m) for r in salted.collect()}
    assert got_plain == want
    assert got_salted == want  # pre-fix: NULL-ts row missing
