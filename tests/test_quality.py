"""Unit tests for operators/quality.py: metric math on a frame with
known defects (nulls, dupes, out-of-range, orphans) and the edge cases
the gate query can't show (failing checks, null-key RI handling, empty
child)."""

import pytest
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.quality import (
    Check,
    accepted_values,
    check_suite,
    completeness,
    compliance,
    referential_integrity,
    uniqueness,
)


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", -5.0),   # out of range
        (2, "a", 20.0),   # duplicate id
        (None, "z", 30.0),  # null id, unaccepted status
    ]
    return spark.createDataFrame(rows, "id int, status string, amt double")


def _by_name(df):
    return {r["check_name"]: (r["metric"], r["passed"]) for r in df.collect()}


def test_check_suite_metrics(spark, dirty):
    out = _by_name(
        check_suite(
            dirty,
            [
                Check("complete", completeness("id"), 1.0, 1.0),
                Check("unique", uniqueness("id"), 1.0, 1.0),
                Check("status", accepted_values("status", ["a", "b"]), 1.0, 1.0),
                Check("amt_pos", compliance(F.col("amt") > 0), 0.5, 1.0),
            ],
        )
    )
    assert out["complete"] == (0.75, False)
    # 2 distinct non-null ids / 4 rows
    assert out["unique"] == (0.5, False)
    assert out["status"] == (0.75, False)
    assert out["amt_pos"] == (0.75, True)  # within [0.5, 1.0]


def test_compliance_counts_null_as_failing(spark):
    df = spark.createDataFrame([(1.0,), (None,)], "x double")
    out = _by_name(
        check_suite(df, [Check("pos", compliance(F.col("x") > 0), 1.0, 1.0)])
    )
    assert out["pos"] == (0.5, False)


def test_referential_integrity_orphans(spark, dirty):
    parent = spark.createDataFrame([(1,), (99,)], "pid int")
    out = _by_name(
        referential_integrity(dirty, "id", parent, "pid", name="ri")
    )
    # non-null child ids: 1, 2, 2 -> orphans 2, 2
    m, passed = out["ri"]
    assert m == pytest.approx(2 / 3)
    assert passed is False


def test_referential_integrity_tolerance_and_nulls(spark, dirty):
    parent = spark.createDataFrame([(1,), (2,)], "pid int")
    out = _by_name(
        referential_integrity(dirty, "id", parent, "pid", name="ri")
    )
    assert out["ri"] == (0.0, True)  # null child keys are excluded


def test_referential_integrity_empty_child(spark):
    child = spark.createDataFrame([], "k int")
    parent = spark.createDataFrame([(1,)], "pid int")
    out = _by_name(referential_integrity(child, "k", parent, "pid", name="ri"))
    assert out["ri"] == (0.0, True)


def test_suites_union_cleanly(spark, dirty):
    parent = spark.createDataFrame([(1,), (2,)], "pid int")
    suite = check_suite(
        dirty, [Check("complete", completeness("amt"), 1.0, 1.0)]
    ).unionByName(referential_integrity(dirty, "id", parent, "pid"))
    assert suite.count() == 2


def test_key_skew_report_math(spark):
    from cdc_redshift_spark.operators.quality import key_skew_report

    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 1 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    rep = key_skew_report(df, ["k"], top=2).collect()
    assert [(r["k"], r["n"]) for r in rep] == [("a", 6), ("b", 2)]
    # 4 keys, 10 rows -> mean 2.5; a: share .6, skew 2.4
    assert rep[0]["share"] == pytest.approx(0.6)
    assert rep[0]["skew_x"] == pytest.approx(2.4)


def test_key_skew_report_tie_order(spark):
    from cdc_redshift_spark.operators.quality import key_skew_report

    df = spark.createDataFrame([("b",), ("a",)], "k string")
    rep = key_skew_report(df, ["k"], top=2).collect()
    assert [r["k"] for r in rep] == ["a", "b"]  # key tiebreak is stable


# ---------------------------------------------------------------------------
# two-pass heavy hitters
# ---------------------------------------------------------------------------


def _hh_rows(df):
    return {(r[0], r["cnt"]) for r in df.collect()}


def test_heavy_hitters_exact_counts(spark):
    from cdc_redshift_spark.operators.quality import heavy_hitters

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [("d",)] * 5
    df = spark.createDataFrame(rows, "k string")
    # 20% of 100 rows -> a (50) and b (30) qualify; c (15), d (5) don't
    assert _hh_rows(heavy_hitters(df, "k", 0.2)) == {("a", 50), ("b", 30)}


def test_heavy_hitters_adversarial_spread(spark):
    """The heavy key is spread thin over many partitions amid unique
    noise keys — the worst case for a local screen; the MG pigeonhole
    guarantee must still recover it with its exact count."""
    from cdc_redshift_spark.operators.quality import heavy_hitters

    heavy = [("hot",)] * 120
    noise = [(f"n{i}",) for i in range(880)]
    # interleave so every partition sees mostly-unique keys
    rows = []
    hi, ni = iter(heavy), iter(noise)
    for i in range(1000):
        rows.append(next(hi) if i % 8 == 0 and len(rows) % 1000 < 960 else next(ni, ("pad",)))
    df = spark.createDataFrame(rows, "k string").repartition(16)
    out = _hh_rows(heavy_hitters(df, "k", 0.1))
    hot = [c for k, c in out if k == "hot"]
    assert hot and hot[0] == sum(1 for (k,) in rows if k == "hot")
    # nothing below the threshold sneaks in
    n_total = len(rows)
    assert all(c * 10 >= n_total for _, c in out)


def test_heavy_hitters_empty_and_validation(spark):
    import pytest

    from cdc_redshift_spark.operators.quality import heavy_hitters

    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters(empty, "k", 0.5).count() == 0
    with pytest.raises(ValueError, match="min_frac"):
        heavy_hitters(empty, "k", 0.0)


def test_heavy_hitters_null_key_group(spark):
    """A null-heavy key column surfaces as a NULL group with its exact
    count, matching the GROUP BY oracle's NULL group."""
    from cdc_redshift_spark.operators.quality import heavy_hitters

    rows = [(None,)] * 30 + [("a",)] * 40 + [(f"n{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    out = {(r["k"], r["cnt"]) for r in heavy_hitters(df, "k", 0.2).collect()}
    assert out == {("a", 40), (None, 30)}


def test_heavy_hitters_leaves_no_cached_rdds(spark):
    """ADVICE r6 low: the MG screen must not leak a cached RDD per
    call in a long-lived session."""
    from pyspark.sql import functions as F

    from cdc_redshift_spark.operators.quality import heavy_hitters

    df = spark.range(1000).select(
        F.when(F.col("id") % 3 == 0, F.lit("hot"))
        .otherwise(F.col("id").cast("string"))
        .alias("k")
    )
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    out = heavy_hitters(df, "k", 0.2).collect()
    assert [r["k"] for r in out] == ["hot"]
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after == before, f"heavy_hitters leaked {after - before} cached RDD(s)"


def test_robust_outliers_catches_masked_spike(spark):
    """The case MAD exists for: one huge spike inflates mean/stddev so
    the classic z-score misses a second, smaller anomaly — the robust
    rule flags both."""
    from cdc_redshift_spark.operators.quality import robust_outliers

    base = [(i, 1, float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 9, 10, 11])]
    rows = base + [(100, 1, 1000.0), (101, 1, 60.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id int, value double")
    got = {r.event_id for r in robust_outliers(df, "user_id", "value").collect()}
    assert got == {100, 101}
    # classic 3-sigma z-score would MISS the 60.0 row (masking)
    import statistics

    vals = [v for _, _, v in rows]
    mu, sd = statistics.mean(vals), statistics.pstdev(vals)
    assert abs(60.0 - mu) < 3 * sd


def test_robust_outliers_guards(spark):
    from cdc_redshift_spark.operators.quality import robust_outliers

    # group smaller than min_group never flags, whatever the spread
    small = spark.createDataFrame(
        [(i, 1, float(x)) for i, x in enumerate([1, 1, 1000])],
        "event_id long, user_id int, value double",
    )
    assert robust_outliers(small, "user_id", "value", min_group=8).count() == 0
    # majority-constant group (mad = 0) never flags
    const = spark.createDataFrame(
        [(i, 1, 5.0) for i in range(9)] + [(9, 1, 500.0)],
        "event_id long, user_id int, value double",
    )
    assert robust_outliers(const, "user_id", "value").count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_group"):
        robust_outliers(const, "user_id", "value", min_group=0)


def test_winsorize_clamps_tails_only(spark):
    from cdc_redshift_spark.operators.quality import winsorize

    vals = list(range(1, 101))  # 1..100 per key
    df = spark.createDataFrame(
        [(i, 1, float(v)) for i, v in enumerate(vals)],
        "event_id long, user_id int, value double",
    )
    out = {r.event_id: r for r in winsorize(df, "user_id", "value", p=0.05).collect()}
    # interpolated 5%/95% of 1..100: 5.95 and 95.05
    assert out[0].lo == 5.95 and out[0].hi == 95.05
    # tails clamp, interior passes through
    assert out[0].value_w == 5.95          # value 1
    assert out[99].value_w == 95.05        # value 100
    assert out[49].value_w == 50.0         # value 50 untouched
    import pytest as _pytest

    with _pytest.raises(ValueError, match="p must be"):
        winsorize(df, "user_id", "value", p=0.5)


def test_winsorize_null_passthrough(spark):
    """A NULL metric must stay NULL — Spark's greatest/least skip nulls,
    so an unguarded clamp silently turns missing into the lower bound."""
    from cdc_redshift_spark.operators.quality import winsorize

    rows = [(i, 1, float(v)) for i, v in enumerate(range(1, 100))]
    rows.append((1000, 1, None))
    df = spark.createDataFrame(
        rows, "event_id long, user_id int, value double"
    )
    out = {r.event_id: r for r in winsorize(df, "user_id", "value").collect()}
    assert out[1000].value_w is None and out[1000].value is None
    assert out[50].value_w is not None


# -- psi_drift -----------------------------------------------------------


def _psi_rows(spark, ref_vals, cur_vals, key="k"):
    """Build a frame whose early half (e=0) holds ref_vals and late
    half (e=100) holds cur_vals; midpoint split lands at e=50."""
    rows = [(key, float(v), 0) for v in ref_vals] + [
        (key, float(v), 100) for v in cur_vals
    ]
    return spark.createDataFrame(rows, "k string, v double, e long")


def test_psi_identical_halves_near_zero(spark):
    from cdc_redshift_spark.operators.quality import psi_drift

    vals = [float(x) for x in range(100)]
    out = psi_drift(
        _psi_rows(spark, vals, vals), "k", "v", "e"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_ref"] == 100 and r["n_cur"] == 100
    # identical histograms: every term is exactly 0 (p_cur == p_ref)
    assert r["psi"] == 0.0
    assert r["drift"] is False


def test_psi_shifted_distribution_flags(spark):
    from cdc_redshift_spark.operators.quality import psi_drift

    ref = [float(x) for x in range(100)]          # uniform 0..99
    cur = [90.0 + x / 10.0 for x in range(100)]   # collapsed to top decile
    r = psi_drift(_psi_rows(spark, ref, cur), "k", "v", "e").collect()[0]
    assert r["psi"] > 0.2
    assert r["drift"] is True


def test_psi_hand_computed_two_bins(spark):
    """Pin the exact smoothed formula on a case small enough to do by
    hand: bins=2, ref = [0,0,0,1] (3:1), cur = [0,1,1,1] (1:3)."""
    import math

    from cdc_redshift_spark.operators.quality import psi_drift

    r = psi_drift(
        _psi_rows(spark, [0, 0, 0, 1], [0, 1, 1, 1]), "k", "v", "e", bins=2
    ).collect()[0]
    # smoothing: p = (c + 0.5) / (4 + 1.0)
    expect = 0.0
    for c_ref, c_cur in ((3, 1), (1, 3)):
        p_r = (c_ref + 0.5) / 5.0
        p_c = (c_cur + 0.5) / 5.0
        expect += (p_c - p_r) * math.log(p_c / p_r)
    assert r["psi"] == pytest.approx(expect, abs=1e-6)


def test_psi_constant_ref_and_outside_values_clamp(spark):
    from cdc_redshift_spark.operators.quality import psi_drift

    # constant reference (hi == lo): everything bins to 0, including
    # current values far outside the reference range
    r = psi_drift(
        _psi_rows(spark, [5, 5, 5, 5], [999, -999, 5, 5]), "k", "v", "e"
    ).collect()[0]
    assert r["n_ref"] == 4 and r["n_cur"] == 4
    # same bin-0 mass on both sides -> identical histograms -> psi 0
    assert r["psi"] == 0.0


def test_psi_keys_missing_from_one_half_and_grid(spark):
    """A key with rows ONLY in the current half must SURFACE — no
    reference rows means no bin edges, so it takes the degenerate
    grid (bin 0), scores against the uniform smoothed reference, and
    is forced to drift = true (a monitoring consumer must see a
    brand-new key); a key with rows only in the reference half scores
    against an empty current half via the smoothed grid instead of
    dividing by zero."""
    from cdc_redshift_spark.operators.quality import psi_drift

    rows = (
        [("both", float(v), 0) for v in range(10)]
        + [("both", float(v), 100) for v in range(10)]
        + [("cur_only", 1.0, 100), ("cur_only", 2.0, 100)]
        + [("ref_only", 1.0, 0), ("ref_only", 2.0, 0)]
    )
    df = spark.createDataFrame(rows, "k string, v double, e long")
    out = {r["k"]: r for r in psi_drift(df, "k", "v", "e").collect()}
    assert set(out) == {"both", "cur_only", "ref_only"}
    assert out["ref_only"]["n_cur"] == 0
    assert out["ref_only"]["psi"] is not None
    co = out["cur_only"]
    assert co["n_ref"] == 0 and co["n_cur"] == 2
    # degenerate grid: both rows in bin 0; hand-compute the smoothed
    # score — p_ref uniform 0.5/5, p_cur = 2.5/7 at bin 0, 0.5/7 else
    import math

    expect = (2.5 / 7 - 0.1) * math.log((2.5 / 7) / 0.1) + 9 * (
        0.5 / 7 - 0.1
    ) * math.log((0.5 / 7) / 0.1)
    assert co["psi"] == pytest.approx(expect, abs=1e-6)
    assert co["drift"] is True


def test_psi_new_key_small_count_still_forced_drift(spark):
    """The n_ref = 0 forcing matters exactly when the smoothed PSI is
    SMALL: one current-only row scores ~0.165 < 0.2, so without the
    forcing a brand-new key with few rows would read as 'stable'."""
    from cdc_redshift_spark.operators.quality import psi_drift

    rows = [("old", float(v), 0) for v in range(10)] + [
        ("old", float(v), 100) for v in range(10)
    ] + [("new", 7.0, 100)]
    df = spark.createDataFrame(rows, "k string, v double, e long")
    r = {x["k"]: x for x in psi_drift(df, "k", "v", "e").collect()}["new"]
    assert r["n_ref"] == 0
    assert r["psi"] < 0.2
    assert r["drift"] is True


def test_psi_nan_values_excluded(spark):
    """A NaN value must not poison a key's reference min/max (NaN
    edges make every bin assignment NaN, and Spark and ANSI engines
    disagree on NaN ordering/equality): NaN rows are excluded up
    front, like NULLs."""
    from cdc_redshift_spark.operators.quality import psi_drift

    nan = float("nan")
    rows = [("k", 1.0, 0), ("k", nan, 0), ("k", 2.0, 0),
            ("k", 1.5, 100), ("k", nan, 100)]
    df = spark.createDataFrame(rows, "k string, v double, e long")
    r = psi_drift(df, "k", "v", "e").collect()[0]
    assert r["n_ref"] == 2 and r["n_cur"] == 1
    assert r["psi"] is not None and r["psi"] >= 0.0


def test_psi_null_values_excluded_and_validation(spark):
    from cdc_redshift_spark.operators.quality import psi_drift

    df = spark.createDataFrame(
        [("k", 1.0, 0), ("k", None, 0), ("k", 1.0, 100)],
        "k string, v double, e long",
    )
    r = psi_drift(df, "k", "v", "e").collect()[0]
    assert r["n_ref"] == 1 and r["n_cur"] == 1
    with pytest.raises(ValueError, match="bins"):
        psi_drift(df, "k", "v", "e", bins=1)


# -- l_diversity_violations ----------------------------------------------


def test_l_diversity_homogeneous_class_flagged(spark):
    """A class whose sensitive attribute is homogeneous must surface
    even when it is large enough to pass k-anonymity — that is the
    whole point of the second audit; a class at exactly l distinct
    values passes (strict < threshold)."""
    from cdc_redshift_spark.operators.quality import l_diversity_violations

    rows = (
        [("g1", f"p{i}", "flu") for i in range(6)]          # 6 rows, 1 value
        + [("g2", f"p{i}", ["flu", "cold", "none"][i % 3]) for i in range(6)]
    )
    df = spark.createDataFrame(rows, "qi string, pid string, diag string")
    out = {r["qi"]: r for r in l_diversity_violations(
        df, ["qi"], "diag", l=3
    ).collect()}
    assert set(out) == {"g1"}
    assert out["g1"]["n"] == 6 and out["g1"]["l_vals"] == 1


def test_l_diversity_null_sensitive_is_own_value(spark):
    """NULL sensitive values form one value of their own: an all-NULL
    class is homogeneous (flagged), and NULL + one real value counts
    as 2 distinct."""
    from cdc_redshift_spark.operators.quality import l_diversity_violations

    rows = [
        ("allnull", None), ("allnull", None),
        ("mixed", None), ("mixed", "flu"),
    ]
    df = spark.createDataFrame(rows, "qi string, diag string")
    out = {r["qi"]: r for r in l_diversity_violations(
        df, ["qi"], "diag", l=2
    ).collect()}
    assert set(out) == {"allnull"}
    assert out["allnull"]["l_vals"] == 1
    with pytest.raises(ValueError, match="l must be"):
        l_diversity_violations(df, ["qi"], "diag", l=1)


# -- t_closeness_report --------------------------------------------------


def test_t_closeness_hand_computed_and_absent_values(spark):
    """Hand-pinned TVD on a 2-value domain — global 8:2 over classes
    X = (5a) and Y = (3a, 2b): both sit at TVD 0.2.  X has NO b cell,
    so a correct result requires the absent-value algebra
    (sum_s |p_c - p_g| = 1 + sum_present(|p_c - p_g| - p_g)); a naive
    present-cells-only sum would report X at 0.1."""
    from cdc_redshift_spark.operators.quality import t_closeness_report

    rows = [("X", "a")] * 5 + [("Y", "a")] * 3 + [("Y", "b")] * 2
    df = spark.createDataFrame(rows, "qi string, diag string")
    out = {r["qi"]: r for r in t_closeness_report(
        df, ["qi"], "diag", t=0.15
    ).collect()}
    assert out["X"]["n"] == 5 and out["X"]["tvd"] == pytest.approx(0.2)
    assert out["Y"]["n"] == 5 and out["Y"]["tvd"] == pytest.approx(0.2)
    assert out["X"]["leaks"] is True and out["Y"]["leaks"] is True


def test_t_closeness_matching_class_is_zero_and_point_mass(spark):
    """A class distributed exactly like the table scores 0; a point
    mass on value s scores 1 - p_global(s) (the TV distance to the
    global mixture)."""
    from cdc_redshift_spark.operators.quality import t_closeness_report

    # global: 10 a, 10 b; M matches it exactly; P is all-a
    rows = (
        [("M", "a")] * 8 + [("M", "b")] * 8
        + [("P", "a")] * 2 + [("P", "b")] * 2
    )
    df = spark.createDataFrame(rows, "qi string, diag string")
    out = {r["qi"]: r for r in t_closeness_report(
        df, ["qi"], "diag"
    ).collect()}
    assert out["M"]["tvd"] == 0.0 and out["M"]["leaks"] is False
    rows2 = [("G", "a")] * 6 + [("G", "b")] * 2 + [("P", "a")] * 2
    df2 = spark.createDataFrame(rows2, "qi string, diag string")
    out2 = {r["qi"]: r for r in t_closeness_report(
        df2, ["qi"], "diag"
    ).collect()}
    # global p(a) = 8/10: point mass on a scores 1 - 0.8 = 0.2
    assert out2["P"]["tvd"] == pytest.approx(0.2)
    with pytest.raises(ValueError, match="t must be"):
        t_closeness_report(df2, ["qi"], "diag", t=1.0)


def test_t_closeness_null_sensitive_is_own_value(spark):
    """NULL sensitive values are one value of their own — they must
    survive the global-distribution join (eqNullSafe), not silently
    drop from the term sum.  Global: NULL 3/4, a 1/4.  Class X
    (all-NULL, would VANISH under a null-rejecting join) and class Y
    (a + NULL) both sit at TVD 0.25 by hand; the old equi-join bug
    would have dropped X and scored Y at 0.5."""
    from cdc_redshift_spark.operators.quality import t_closeness_report

    rows = [("X", None), ("X", None), ("Y", "a"), ("Y", None)]
    df = spark.createDataFrame(rows, "qi string, diag string")
    out = {r["qi"]: r for r in t_closeness_report(
        df, ["qi"], "diag", t=0.2
    ).collect()}
    assert set(out) == {"X", "Y"}
    assert out["X"]["n"] == 2 and out["X"]["tvd"] == pytest.approx(0.25)
    assert out["Y"]["n"] == 2 and out["Y"]["tvd"] == pytest.approx(0.25)
    assert out["X"]["leaks"] is True


def test_t_closeness_null_quasi_identifier_is_a_class(spark):
    """A NULL quasi-identifier is a real (linkable) class and must
    appear in the report — the class-total join is null-safe on every
    QI column.  Global: a 3/4, b 1/4; the NULL-QI class is a point
    mass on a (TVD 1 - 0.75 = 0.25), class Z splits evenly (0.25)."""
    from cdc_redshift_spark.operators.quality import t_closeness_report

    rows = [(None, "a"), (None, "a"), ("Z", "a"), ("Z", "b")]
    df = spark.createDataFrame(rows, "qi string, diag string")
    out = {r["qi"]: r for r in t_closeness_report(
        df, ["qi"], "diag", t=0.2
    ).collect()}
    assert set(out) == {None, "Z"}
    assert out[None]["n"] == 2 and out[None]["tvd"] == pytest.approx(0.25)
    assert out["Z"]["tvd"] == pytest.approx(0.25)


# -- k_anonymity_violations ----------------------------------------------


def test_k_anonymity_threshold_boundary(spark):
    from cdc_redshift_spark.operators.quality import k_anonymity_violations

    rows = (
        [("US", "A")] * 5     # exactly k: not a violation
        + [("US", "B")] * 4   # k-1: violation
        + [("DE", "A")] * 1   # singleton: violation
    )
    df = spark.createDataFrame(rows, "geo string, seg string")
    out = {
        (r["geo"], r["seg"]): r["n"]
        for r in k_anonymity_violations(df, ["geo", "seg"], k=5).collect()
    }
    assert out == {("US", "B"): 4, ("DE", "A"): 1}


def test_k_anonymity_null_class_counts(spark):
    from cdc_redshift_spark.operators.quality import k_anonymity_violations

    df = spark.createDataFrame(
        [("US",), (None,), (None,)], "geo string"
    )
    out = {
        r["geo"]: r["n"]
        for r in k_anonymity_violations(df, ["geo"], k=5).collect()
    }
    # nulls form their own (violating) class, not silently dropped
    assert out == {"US": 1, None: 2}


def test_k_anonymity_validation(spark):
    from cdc_redshift_spark.operators.quality import k_anonymity_violations

    df = spark.createDataFrame([("x",)], "geo string")
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_violations(df, ["geo"], k=1)


def test_k_anonymity_score_shared_and_mid_replay_safe(spark):
    """Round-14: the factored threshold scorer (shared by the batch
    audit and the streaming face) flags 0 < n < k only — a NEGATIVE
    in-flight group (a retraction applied ahead of its insert on a
    mid-replay maintained state) is NOT a violation, and n >= k
    passes."""
    from cdc_redshift_spark.operators.quality import k_anonymity_score

    counts = spark.createDataFrame(
        [("a", 1), ("b", 4), ("c", 5), ("d", -2), ("e", 0)],
        "geo string, n int",
    )
    got = sorted(
        r["geo"] for r in k_anonymity_score(counts, k=5).collect()
    )
    assert got == ["a", "b"]
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_score(counts, k=1)


def test_stream_k_anonymity_matches_batch_face_on_null_qi(
    spark, tmp_path
):
    """Two-face parity for the streaming privacy audit on an
    adversarial customer fixture: NULL nation / segment / acctbal QI
    values (each its own class, the conservative reading), tiny
    classes straddling the k=5 boundary, and the correction-wave
    arithmetic pin surviving NULL bands (a NULL band moves no
    weighted mass).  Oracle-backed: the DuckDB mirror's row set on
    the same fixture."""
    from cdc_redshift_spark.queries.streaming_q import (
        q_cdc_stream_k_anonymity,
    )
    from cdc_redshift_spark.queries.text_q import (
        ORACLE_K_ANONYMITY,
        q_pii_k_anonymity,
    )

    rows = []
    # class (0, 'A', 0): 6 members -> passes k=5
    rows += [(i, 0, "A", 100.0) for i in range(6)]
    # class (0, 'A', 1): 4 members -> violation
    rows += [(10 + i, 0, "A", 1100.0) for i in range(4)]
    # NULL-QI classes, each small -> violations
    rows += [(20, None, "A", 100.0), (21, None, "A", 100.0)]
    rows += [(30, 1, None, 200.0)]
    rows += [(40, 1, "B", None), (41, 1, "B", None), (42, 1, "B", None)]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_nationkey int, c_mktsegment string, "
        "c_acctbal double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    sf = str(tmp_path)
    # repr key: tuples with NULLs don't order under plain <
    batch = sorted(
        (tuple(r) for r in q_pii_k_anonymity(spark, sf).collect()),
        key=repr,
    )
    stream = sorted(
        (tuple(r) for r in q_cdc_stream_k_anonymity(spark, sf).collect()),
        key=repr,
    )
    assert stream == batch
    # the fixture really exercised the shapes
    assert (0, "A", 0, 6) not in batch  # the passing class is absent
    assert (0, "A", 1, 4) in batch
    assert any(r[0] is None for r in batch)  # NULL nation class
    assert any(r[1] is None for r in batch)  # NULL segment class
    assert any(r[2] is None for r in batch)  # NULL band class
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM read_parquet("
        f"'{tmp_path}/customer.parquet/*.parquet')"
    )
    oracle = sorted(
        (tuple(r) for r in con.execute(ORACLE_K_ANONYMITY).fetchall()),
        key=repr,
    )
    con.close()
    assert oracle == batch


def test_l_diversity_score_shared_and_mid_replay_safe(spark):
    """Round-14: the factored diversity scorer drops cells with
    count <= 0 before counting distinct values — a negative in-flight
    cell (mid-replay retraction) or an identically-zero residue must
    not count toward (or against) a class's diversity."""
    from cdc_redshift_spark.operators.quality import l_diversity_score

    cells = spark.createDataFrame(
        [
            ("a", "x", 3), ("a", "y", -1),  # y is in-flight: a is homogeneous
            ("b", "x", 2), ("b", "y", 1),   # genuinely diverse
            ("c", "x", 1), ("c", "y", 0),   # zero residue: c is homogeneous
        ],
        "geo string, sv string, c int",
    )
    got = {
        r["geo"]: (r["n"], r["l_vals"])
        for r in l_diversity_score(cells, ["geo"], l=2, count_col="c").collect()
    }
    assert got == {"a": (3, 1), "c": (1, 1)}
    with pytest.raises(ValueError, match="l must be"):
        l_diversity_score(cells, ["geo"], l=1, count_col="c")


def test_stream_l_diversity_matches_batch_face_on_null_sensitive(
    spark, tmp_path
):
    """Two-face parity for the streaming homogeneity audit on an
    adversarial fixture: NULL sensitive values (one value of their
    own — an all-missing class is still homogeneous), NULL QI values,
    and classes straddling l=3.  Oracle-backed via the DuckDB
    mirror."""
    from cdc_redshift_spark.queries.streaming_q import (
        q_cdc_stream_l_diversity,
    )
    from cdc_redshift_spark.queries.text_q import (
        ORACLE_L_DIVERSITY,
        q_pii_l_diversity,
    )

    rows = []
    # class (0, 0): 3 distinct segments -> passes l=3
    rows += [(1, 0, "A", 100.0), (2, 0, "B", 100.0), (3, 0, "C", 100.0)]
    # class (0, 1): homogeneous, 4 members -> violation
    rows += [(10 + i, 0, "A", 1100.0) for i in range(4)]
    # class (1, 0): everyone's segment missing -> 1 value, violation
    rows += [(20, 1, None, 100.0), (21, 1, None, 100.0)]
    # NULL QI class with 2 distinct values -> violation (l=3)
    rows += [(30, None, "A", 100.0), (31, None, "B", 100.0)]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_nationkey int, c_mktsegment string, "
        "c_acctbal double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    sf = str(tmp_path)
    batch = sorted(
        (tuple(r) for r in q_pii_l_diversity(spark, sf).collect()),
        key=repr,
    )
    stream = sorted(
        (tuple(r) for r in q_cdc_stream_l_diversity(spark, sf).collect()),
        key=repr,
    )
    assert stream == batch
    assert (0, 0, 3, 3) not in batch        # the diverse class is absent
    assert (0, 1, 4, 1) in batch            # homogeneous class flagged
    assert (1, 0, 2, 1) in batch            # all-NULL sensitive is 1 value
    assert any(r[0] is None for r in batch)  # NULL QI class present
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM read_parquet("
        f"'{tmp_path}/customer.parquet/*.parquet')"
    )
    oracle = sorted(
        (tuple(r) for r in con.execute(ORACLE_L_DIVERSITY).fetchall()),
        key=repr,
    )
    con.close()
    assert oracle == batch


def test_t_closeness_score_shared_and_mid_replay_safe(spark):
    """Round-14: the factored EMD scorer drops cells with count <= 0
    before any distribution math — a negative in-flight cell
    (mid-replay) or a zero residue must neither shift the global
    distribution nor create a phantom class."""
    from cdc_redshift_spark.operators.quality import (
        t_closeness_report,
        t_closeness_score,
    )

    rows = [(1, "g", "x"), (2, "g", "x"), (3, "g", "y"), (4, "h", "y")]
    df = spark.createDataFrame(rows, "id int, geo string, sv string")
    batch = sorted(
        tuple(r)
        for r in t_closeness_report(df, ["geo"], "sv", t=0.3).collect()
    )
    # the same distribution as maintained cells, plus junk that the
    # scorer must ignore: a negative in-flight cell and a zero residue
    cells = spark.createDataFrame(
        [
            ("g", "x", 2), ("g", "y", 1), ("h", "y", 1),
            ("i", "x", -1),  # in-flight retraction: no phantom class
            ("g", "z", 0),   # identically-zero residue: no term
        ],
        "geo string, sv string, c int",
    )
    streamed = sorted(
        tuple(r)
        for r in t_closeness_score(
            cells, ["geo"], t=0.3, count_col="c", value_col="sv"
        ).collect()
    )
    assert streamed == batch
    with pytest.raises(ValueError, match="t must be"):
        t_closeness_score(cells, ["geo"], t=1.5, count_col="c", value_col="sv")


def test_stream_t_closeness_matches_batch_face_on_null_qi(
    spark, tmp_path
):
    """Two-face parity for the streaming skewness audit on an
    adversarial fixture: NULL sensitive values and NULL QI classes
    (both kept by the null-safe joins), point-mass classes, and the
    phantom-cohort delete wave running over them.  Oracle-backed via
    the DuckDB mirror."""
    from cdc_redshift_spark.queries.streaming_q import (
        q_cdc_stream_t_closeness,
    )
    from cdc_redshift_spark.queries.text_q import (
        ORACLE_T_CLOSENESS,
        q_pii_t_closeness,
    )

    rows = []
    rows += [(1, 0, "A", 100.0), (2, 0, "B", 100.0), (3, 0, "A", 100.0)]
    rows += [(10, 0, "A", 1100.0)]            # point-mass class
    rows += [(20, 1, None, 100.0), (21, 1, "A", 100.0)]  # NULL sensitive
    rows += [(30, None, "B", 100.0)]          # NULL QI class
    rows += [(40, 1, "B", None)]              # NULL band class
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_nationkey int, c_mktsegment string, "
        "c_acctbal double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    sf = str(tmp_path)
    batch = sorted(
        (tuple(r) for r in q_pii_t_closeness(spark, sf).collect()),
        key=repr,
    )
    stream = sorted(
        (tuple(r) for r in q_cdc_stream_t_closeness(spark, sf).collect()),
        key=repr,
    )
    assert stream == batch
    assert any(r[0] is None for r in batch)   # NULL QI class reported
    assert any(r[1] is None for r in batch)   # NULL band class reported
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM read_parquet("
        f"'{tmp_path}/customer.parquet/*.parquet')"
    )
    oracle = sorted(
        (tuple(r) for r in con.execute(ORACLE_T_CLOSENESS).fetchall()),
        key=repr,
    )
    con.close()
    assert len(oracle) == len(batch)
    for o, b in zip(oracle, batch):
        assert o[:3] == b[:3]
        assert b[3] == pytest.approx(o[3], abs=1e-6)
        assert o[4] == b[4]


def test_psi_streamed_state_equals_batch(spark, tmp_path):
    """The streaming face (RollupMaintainer over the (key, bin, half)
    histogram grain, count-only measures) must score identically to
    the batch psi_drift — same shared bin/grid/score expressions,
    including across a batch split and a replayed batch id."""
    from cdc_redshift_spark.operators.quality import (
        psi_bin_expr,
        psi_drift,
        psi_grid,
        psi_score,
    )
    from cdc_redshift_spark.streaming.rollup import RollupMaintainer

    ref = [float(x) for x in range(40)]
    cur = [20.0 + x for x in range(40)]  # half the mass shifted right
    df = _psi_rows(spark, ref, cur)
    batch = {r["k"]: r for r in psi_drift(df, "k", "v", "e").collect()}

    stats = (
        df.where(F.col("e") <= 50)
        .groupBy(F.col("k").alias("__k"))
        .agg(F.min("v").alias("__lo"), F.max("v").alias("__hi"))
    )

    def shape(rows, half):
        return rows.join(
            F.broadcast(stats), rows["k"] == stats["__k"]
        ).select(
            F.lit(1).alias("sign"),
            "__k",
            psi_bin_expr(F.col("v"), F.col("__lo"), F.col("__hi"), 10).alias(
                "__b"
            ),
            F.lit(half).alias("__half"),
        )

    m = RollupMaintainer(
        spark, str(tmp_path / "psi"), lambda r: r, time_col=None,
        bucket=None, dims=["__k", "__b", "__half"], measures={},
    )
    early = df.where(F.col("e") <= 50)
    late = df.where(F.col("e") > 50)
    # deterministic value-parity split (limit() without orderBy could
    # pick different rows across the three separate plans)
    late_a = late.where(F.col("v") % 2 == 0)
    late_b = late.where(F.col("v") % 2 != 0)
    assert m.update(shape(early, "ref"), 0)
    assert m.update(shape(late_a, "cur"), 1)
    # replay of batch 1 must no-op, split remainder lands in batch 2
    assert not m.update(shape(late_a, "cur"), 1)
    assert m.update(shape(late_b, "cur"), 2)
    cells = m.current().groupBy("__k", "__b").agg(
        F.sum(F.when(F.col("__half") == "ref", F.col("n"))).alias("__cr"),
        F.sum(F.when(F.col("__half") == "cur", F.col("n"))).alias("__cc"),
    )
    full = psi_grid(stats.select("__k"), 10).join(
        cells, ["__k", "__b"], "left"
    ).select(
        "__k",
        "__b",
        F.coalesce("__cr", F.lit(0)).alias("__c_ref"),
        F.coalesce("__cc", F.lit(0)).alias("__c_cur"),
    )
    streamed = {r["k"]: r for r in psi_score(full, "k").collect()}
    assert set(streamed) == set(batch)
    for k in batch:
        assert streamed[k]["psi"] == batch[k]["psi"]
        assert streamed[k]["n_ref"] == batch[k]["n_ref"]
        assert streamed[k]["n_cur"] == batch[k]["n_cur"]


def test_rollup_count_only_grain_with_retraction(spark, tmp_path):
    """RollupMaintainer with measures={} (pure count grain): inserts
    accumulate n, a retraction decrements it, and a group reaching
    net zero vanishes from the stored state."""
    from cdc_redshift_spark.streaming.rollup import RollupMaintainer

    m = RollupMaintainer(
        spark, str(tmp_path / "cnt"), lambda r: r, time_col=None,
        bucket=None, dims=["g"], measures={},
    )
    ins = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "sign int, g string"
    )
    assert m.update(ins, 0)
    ret = spark.createDataFrame([(-1, "b")], "sign int, g string")
    assert m.update(ret, 1)
    state = {r["g"]: r["n"] for r in m.current().collect()}
    assert state == {"a": 2}


# -- emb_drift_score (shared batch/streaming back half) ------------------


def test_emb_drift_score_hand_computed(spark):
    """Hand-pinned: identical mean vectors score cosine 1; orthogonal
    ones score 0; a zero-norm half scores NULL (not a crash — ANSI
    x/0 guarded to the oracle's NULL semantics)."""
    from cdc_redshift_spark.operators.quality import emb_drift_score

    per_dim = spark.createDataFrame(
        [
            (1, 0, 1.0, 1.0), (1, 1, 2.0, 2.0),      # identical
            (2, 0, 1.0, 0.0), (2, 1, 0.0, 1.0),      # orthogonal
            (3, 0, 0.0, 1.0), (3, 1, 0.0, 2.0),      # zero-norm ref
        ],
        "label int, pos int, m_ref double, m_cur double",
    )
    counts = spark.createDataFrame(
        [(1, 4, 4), (2, 2, 2), (3, 3, 1)],
        "label int, n_ref int, n_cur int",
    )
    out = {r["label"]: r for r in emb_drift_score(per_dim, counts).collect()}
    assert out[1]["mean_cosine"] == pytest.approx(1.0)
    assert out[2]["mean_cosine"] == 0.0
    assert out[3]["mean_cosine"] is None
    assert out[1]["n_ref"] == 4 and out[3]["n_cur"] == 1


# -- t_closeness_ordered_report -------------------------------------------


def test_t_closeness_ordered_hand_computed(spark):
    """Hand-pinned prefix-sum EMD on a 3-value order.  Global counts
    (5, 3, 2) over values (1, 2, 3).  Class A = 4 rows at value 1:
    d = (.5, -.3, -.2), cum = (.5, .2, 0), EMD = .7/2 = 0.35 — the
    absent values 2 and 3 still move the prefix sum, which is why
    the grid must enumerate them.  Class B = (1, 3, 2) rows:
    cum = (-1/3, -2/15, 0), EMD = (7/15)/2 = 7/30."""
    from cdc_redshift_spark.operators.quality import (
        t_closeness_ordered_report,
    )

    rows = [("A", 1)] * 4 + (
        [("B", 1)] * 1 + [("B", 2)] * 3 + [("B", 3)] * 2
    )
    df = spark.createDataFrame(rows, "qi string, band int")
    out = {r["qi"]: r for r in t_closeness_ordered_report(
        df, ["qi"], "band", t=0.3
    ).collect()}
    assert out["A"]["n"] == 4 and out["A"]["emd"] == pytest.approx(0.35)
    assert out["B"]["n"] == 6 and out["B"]["emd"] == pytest.approx(
        7 / 30, abs=1e-6
    )
    assert out["A"]["leaks"] is True and out["B"]["leaks"] is False


def test_t_closeness_ordered_distinguishes_near_from_far(spark):
    """The reason the ordered form exists: against a uniform global
    over (1, 2, 3), a point mass on the EDGE value (far transport)
    must score higher than a point mass on the MIDDLE value (near
    transport) — the nominal TVD scores both 2/3 * 0.5 identically."""
    from cdc_redshift_spark.operators.quality import (
        t_closeness_ordered_report,
        t_closeness_report,
    )

    rows = (
        [("P1", 1)] * 2 + [("P2", 2)] * 2
        + [("R", 1)] * 2 + [("R", 2)] * 2 + [("R", 3)] * 4
    )
    df = spark.createDataFrame(rows, "qi string, band int")
    out = {r["qi"]: r for r in t_closeness_ordered_report(
        df, ["qi"], "band", t=0.4
    ).collect()}
    assert out["P1"]["emd"] == pytest.approx(0.5)       # edge mass
    assert out["P2"]["emd"] == pytest.approx(1 / 3, abs=1e-6)  # middle
    nom = {r["qi"]: r for r in t_closeness_report(
        df, ["qi"], "band"
    ).collect()}
    assert nom["P1"]["tvd"] == nom["P2"]["tvd"]  # nominal can't see it


def test_t_closeness_ordered_null_handling_and_edges(spark):
    """NULL sensitive values are EXCLUDED (no order position) — the
    documented opposite of the nominal stance; an all-NULL class
    does not appear; a NULL QI is still a real class; m == 1 scores
    zero for every class."""
    from cdc_redshift_spark.operators.quality import (
        t_closeness_ordered_report,
    )

    rows = [
        ("A", 1), ("A", None), ("allnull", None),
        (None, 1), (None, 3), ("A", 3),
    ]
    df = spark.createDataFrame(rows, "qi string, band int")
    out = {r["qi"]: r for r in t_closeness_ordered_report(
        df, ["qi"], "band", t=0.2
    ).collect()}
    assert set(out) == {"A", None}
    assert out["A"]["n"] == 2  # the NULL row is not counted
    assert out["A"]["emd"] == 0.0 and out[None]["emd"] == 0.0
    one = spark.createDataFrame([("X", 5), ("Y", 5)], "qi string, band int")
    res = {r["qi"]: r for r in t_closeness_ordered_report(
        one, ["qi"], "band", t=0.2
    ).collect()}
    assert res["X"]["emd"] == 0.0 and res["Y"]["emd"] == 0.0
    with pytest.raises(ValueError, match="t must be"):
        t_closeness_ordered_report(one, ["qi"], "band", t=0.0)
