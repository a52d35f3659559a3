"""Property-based invariants of the round-7 quality/layout operators.

Each operator's CONTRACT is stated as a property over adversarial
small inputs (ties, duplicates, constant groups, singleton groups)
that example tests can't enumerate.  Spark round-trips are slow, so
examples are capped and deadlines disabled — the value is the shapes.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# small domains make ties/duplicates/constant groups common
value_rows = st.lists(
    st.tuples(
        st.sampled_from([1, 2]),                       # key
        st.integers(min_value=-5, max_value=5),        # value (small: ties)
    ),
    min_size=1,
    max_size=24,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(rows)],
        "event_id long, user_id int, value double",
    )


@given(rows=value_rows)
@_SETTINGS
def test_winsorize_bounds_and_row_preservation(spark, rows):
    """winsorize never drops/adds rows, every clamped value lies in
    [lo, hi], and interior values are untouched."""
    from cdc_redshift_spark.operators.quality import winsorize

    out = winsorize(_df(spark, rows), "user_id", "value", p=0.1).collect()
    assert len(out) == len(rows)
    for r in out:
        assert r.lo <= r.value_w <= r.hi
        if r.lo < r.value < r.hi:
            assert r.value_w == round(r.value, 6)


@given(rows=value_rows)
@_SETTINGS
def test_robust_outliers_subset_and_guards(spark, rows):
    """Flagged rows are a subset of the input; groups under min_group
    or with MAD=0 never flag; every flagged row truly violates the
    Hampel bound recomputed in plain Python."""
    import statistics

    from cdc_redshift_spark.operators.quality import robust_outliers

    flagged = robust_outliers(
        _df(spark, rows), "user_id", "value", k=1.0, min_group=4
    ).collect()
    by_key: dict = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(float(v))
    ids = {(r.event_id) for r in flagged}
    assert len(ids) == len(flagged)  # no duplicated rows
    for r in flagged:
        vals = by_key[r.user_id]
        assert len(vals) >= 4
        med = statistics.median(vals)
        mad = statistics.median(sorted(abs(x - med) for x in vals))
        assert mad > 0
        assert abs(float(r.value) - med) > 1.0 * 1.4826 * mad


@given(rows=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=2, max_size=40),
       k=st.sampled_from([2, 4]))
@_SETTINGS
def test_equi_depth_partition_property(spark, rows, k):
    """The histogram partitions ALL rows (counts sum to n), bins are
    contiguous (consecutive lo/hi chain), and no bin exceeds the
    pigeonhole bound for duplicated data: count(bin) <= n/k + max
    single-value multiplicity."""
    from cdc_redshift_spark.operators.layout import equi_depth_histogram

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(rows)], "id long, v double"
    )
    hist = equi_depth_histogram(df, "v", k).collect()
    assert sum(r.n for r in hist) == len(rows)
    # contiguity holds between ADJACENT bin ids (GROUP BY emits only
    # observed bins; duplicated data can leave interior bins empty)
    for a, b in zip(hist, hist[1:]):
        if b.bin == a.bin + 1:
            assert a.hi == b.lo
    from collections import Counter

    max_mult = max(Counter(rows).values())
    for r in hist:
        assert r.n <= len(rows) / k + max_mult


@given(rows=st.lists(
    st.tuples(st.sampled_from([1, 2]),
              st.integers(min_value=0, max_value=8),
              st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=16))
@_SETTINGS
def test_session_transitions_count_identity(spark, rows):
    """Σ transitions == Σ (session length - 1): every in-session
    consecutive pair appears exactly once, none cross sessions."""
    from cdc_redshift_spark.operators.temporal import session_transitions

    m = 60 * 1_000_000_000
    df = spark.createDataFrame(
        [(i, k, t * m, ty) for i, (k, t, ty) in enumerate(rows)],
        "event_id long, user_id long, ts_ns long, event_type string",
    )
    gap = 3 * m
    got = session_transitions(df, gap_ns=gap).count()
    # python mirror: sessionize per user by the same gap rule
    by_key: dict = {}
    for i, (k, t, ty) in enumerate(rows):
        by_key.setdefault(k, []).append((t * m, i))
    want = 0
    for vals in by_key.values():
        vals.sort()
        prev = None
        run = 0
        for ts, _ in vals:
            if prev is not None and ts - prev <= gap:
                run += 1
            else:
                want += max(run, 0)
                run = 0
            prev = ts
        want += run
    assert got == want


# -- psi_drift properties --------------------------------------------------

psi_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                   # key
        st.integers(min_value=-5, max_value=5),        # value (small: ties)
        st.sampled_from([0, 100]),                     # epoch: 0=ref, 100=cur
    ),
    min_size=1,
    max_size=24,
)


def _psi_mirror(rows, bins=10, smooth=0.5):
    """Pure-Python recompute of psi_drift's contract: reference-half
    equal-width bins, edge clamping, Laplace smoothing, full grid;
    current-only keys take the degenerate lo = hi = 0 grid and are
    forced to drift."""
    import math
    from collections import defaultdict

    out = {}
    ref_vals = defaultdict(list)
    for k, v, e in rows:
        ref_vals[k]  # touch: EVERY key gets a row, current-only too
        if e <= 50:
            ref_vals[k].append(v)
    for k, rv in ref_vals.items():
        lo, hi = (min(rv), max(rv)) if rv else (0, 0)
        cells = {b: [0, 0] for b in range(bins)}
        for k2, v, e in rows:
            if k2 != k:
                continue
            if hi == lo:
                b = 0
            else:
                b = int(
                    min(
                        max(math.floor((v - lo) / ((hi - lo) / bins)), 0),
                        bins - 1,
                    )
                )
            cells[b][0 if e <= 50 else 1] += 1
        n_ref = sum(c[0] for c in cells.values())
        n_cur = sum(c[1] for c in cells.values())
        psi = 0.0
        for c_ref, c_cur in cells.values():
            p_r = (c_ref + smooth) / (n_ref + bins * smooth)
            p_c = (c_cur + smooth) / (n_cur + bins * smooth)
            psi += (p_c - p_r) * math.log(p_c / p_r)
        out[k] = (
            n_ref,
            n_cur,
            round(psi, 6),
            round(psi, 6) > 0.2 or n_ref == 0,
        )
    return out


@given(rows=psi_rows)
@_SETTINGS
def test_psi_nonnegative_and_matches_python_mirror(spark, rows):
    """PSI is a sum of (p_c - p_r)·ln(p_c/p_r) terms — each term is
    non-negative because both factors share a sign — and the Spark
    plan must reproduce the pure-Python recompute exactly at the 6-dp
    rounding (keys with no reference rows surface on the degenerate
    grid with drift forced; a key's current half may be empty)."""
    from cdc_redshift_spark.operators.quality import psi_drift

    df = spark.createDataFrame(
        [(k, float(v), e) for k, v, e in rows],
        "k string, v double, e long",
    )
    got = {
        r["k"]: (r["n_ref"], r["n_cur"], r["psi"], r["drift"])
        for r in psi_drift(df, "k", "v", "e").collect()
    }
    # epoch domain {0, 100} pins the midpoint split at 50 when both
    # epochs occur; a single-epoch input's midpoint equals that epoch,
    # so EVERY row is reference (e <= mid) whichever epoch it is
    if len({e for _, _, e in rows}) == 1:
        expect = _psi_mirror([(k, v, 0) for k, v, _ in rows])
    else:
        expect = _psi_mirror(rows)
    assert got == expect
    for _, _, psi, _drift in got.values():
        assert psi >= 0.0


# -- ordered t-closeness: prefix-sum EMD vs a reference mirror -----------

pii_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", None]),            # quasi-identifier
        st.sampled_from([1, 2, 3, None]),             # ordered sensitive
    ),
    min_size=1,
    max_size=20,
)


def _ref_ordered_emd(rows):
    """Pure-Python mirror of the paper formula: per class, EMD =
    sum_i |prefix_i(p - q)| / (m - 1) over the global value order,
    NULL sensitive values excluded, NULL QI a real class."""
    vals = sorted({v for _, v in rows if v is not None})
    m = len(vals)
    if m == 0:
        return {}
    tot = sum(1 for _, v in rows if v is not None)
    g = {v: sum(1 for _, x in rows if x == v) for v in vals}
    out = {}
    for q in {qi for qi, v in rows if v is not None}:
        cls = [v for qi, v in rows if qi == q and v is not None]
        n = len(cls)
        emd, cum = 0.0, 0.0
        for v in vals:
            cum += cls.count(v) / n - g[v] / tot
            emd += abs(cum)
        out[q] = (n, 0.0 if m == 1 else emd / (m - 1))
    return out


@given(rows=pii_rows)
@_SETTINGS
def test_t_closeness_ordered_matches_reference_mirror(spark, rows):
    """The operator's virtualized grid + window form must equal the
    literal paper formula on every adversarial shape — all-NULL
    classes absent, NULL-QI classes present, single-value orders
    scoring zero, classes missing interior values."""
    import pytest as _pt

    from cdc_redshift_spark.operators.quality import (
        t_closeness_ordered_report,
    )

    df = spark.createDataFrame(rows, "qi string, band int")
    got = {
        r["qi"]: (r["n"], r["emd"])
        for r in t_closeness_ordered_report(
            df, ["qi"], "band", t=0.2
        ).collect()
    }
    want = _ref_ordered_emd(rows)
    assert set(got) == set(want)
    for q, (n, emd) in want.items():
        assert got[q][0] == n
        assert got[q][1] == _pt.approx(round(emd, 6), abs=2e-6)
