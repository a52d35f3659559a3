"""Property-based equivalence of the salted (skew-mitigation) operator
forms vs their plain forms.

The salted variants exist for hot keys a single window task can't hold
(SCALE.md); their contract is EXACT result equality with the unsalted
plan on every input.  Hypothesis drives adversarial shapes — timestamp
ties straddling bucket boundaries, keys entirely inside one bucket,
empty right sides, duplicate rows — that the example-based tests in
test_temporal.py can't enumerate.

Spark round-trips are slow, so examples are capped and deadline
disabled — the value is the interleavings, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_redshift_spark.dedup import latest_per_key
from cdc_redshift_spark.operators.temporal import asof_join

# small domains make ties/collisions common
asof_rows = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(
            st.sampled_from(["a", "b"]), st.integers(min_value=-20, max_value=20)
        ),
        min_size=1,
        max_size=10,
    ),
    st.lists(  # right: (key, ts, px, seq)
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=0,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=30),  # salt_bucket_len
)


@settings(
    # 10 examples x 3 direction/tolerance variants x 2 forms = 60
    # plan-builds per run; this was the suite's single most expensive
    # test at 25 examples (184 s — each example is Catalyst-planning
    # bound, ~1.2 s per asof_join build+collect) and the driver's
    # pytest budget is the binding constraint (round 16).  The
    # property (salted == unsalted for every direction/tolerance) is
    # example-count-insensitive; 10 random draws still cover the
    # empty-right / single-key / tie cases the strategy generates.
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=asof_rows)
def test_asof_salted_equals_unsalted_property(spark, data):
    lrows, rrows, bucket = data
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
        "k string, ts long, lid long",
    )
    right = spark.createDataFrame(
        rrows or [("zzz", 0, 0, 0)], "k string, qts long, px long, seq long"
    )
    kw = dict(
        on=["k"], left_ts="ts", right_ts="qts", payload=["px"], tiebreak="seq"
    )
    for extra in ({}, {"direction": "forward"}, {"tolerance": 5}):
        plain = {
            (r["lid"], r["qts_m"], r["px_m"])
            for r in asof_join(left, right, **kw, **extra).collect()
        }
        salted = {
            (r["lid"], r["qts_m"], r["px_m"])
            for r in asof_join(
                left, right, **kw, **extra, salt_bucket_len=bucket
            ).collect()
        }
        assert salted == plain, (extra, bucket)


lww_rows = st.tuples(
    st.lists(  # (key, ts, offset)
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=9),  # salt
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=lww_rows)
def test_latest_per_key_salted_property(spark, data):
    rows, salt = data
    df = spark.createDataFrame(
        [(k, t, o, f"{k}:{t}:{o}") for k, t, o in rows],
        "key long, ts_ms long, offset long, v string",
    )
    plain = {
        (r["key"], r["ts_ms"], r["offset"])
        for r in latest_per_key(df, keys=("key",)).collect()
    }
    salted = {
        (r["key"], r["ts_ms"], r["offset"])
        for r in latest_per_key(df, keys=("key",), salt=salt).collect()
    }
    assert salted == plain


cap_rows = st.tuples(
    st.lists(  # (id, source)
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.sampled_from(["web", "books", "code"]),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=6),  # cap
    st.integers(min_value=2, max_value=5),  # salt
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=cap_rows)
def test_source_cap_salted_property(spark, data):
    from cdc_redshift_spark.operators.corpus import source_cap

    rows, cap, salt = data
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plain = {r["doc_id"] for r in source_cap(df, cap=cap).collect()}
    salted = {r["doc_id"] for r in source_cap(df, cap=cap, salt=salt).collect()}
    assert salted == plain
    # per-source cardinality respects the cap
    from collections import Counter

    by_src = Counter(s for _, s in rows)
    kept_by_src = Counter(
        r["source"] for r in source_cap(df, cap=cap).collect()
    )
    for s, n in by_src.items():
        assert kept_by_src[s] == min(n, cap)


ij_rows = st.tuples(
    st.lists(  # facts: ts
        st.integers(min_value=-30, max_value=30), min_size=1, max_size=15
    ),
    st.lists(  # intervals: (start, length)
        st.tuples(
            st.integers(min_value=-30, max_value=30),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=0,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=15),  # cell
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=ij_rows)
def test_interval_join_bruteforce_property(spark, data):
    """Random facts/intervals (negative timestamps included — the
    floor-division cells must stay contiguous there) against the
    brute-force pair set."""
    from cdc_redshift_spark.operators.temporal import interval_join

    fts, ivs, cell = data
    facts = spark.createDataFrame(
        [(i, t) for i, t in enumerate(fts)], "fid long, fts long"
    )
    intervals = spark.createDataFrame(
        [(j, s, s + ln) for j, (s, ln) in enumerate(ivs)] or [(99, 1, 0)],
        "iid long, s long, e long",
    )
    got = {
        (r["fid"], r["iid"])
        for r in interval_join(facts, intervals, "fts", "s", "e", cell).collect()
    }
    want = {
        (i, j)
        for i, t in enumerate(fts)
        for j, (s, ln) in enumerate(ivs)
        if s <= t <= s + ln
    }
    assert got == want
