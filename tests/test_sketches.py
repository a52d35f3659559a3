"""Unit tests for operators/sketches.py.

KMV: lossless mergeability (union of per-part minima == minima of the
union), exact-below-k behavior, and estimator accuracy bounds on a
corpus larger than k.  HLL: merge-of-parts equals whole-input sketch
estimate and the estimate lands within DataSketches' published error
for lgk=12 (<1 % typical; we assert 5 %)."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

from cdc_redshift_spark.operators.sketches import (
    hll_merge_estimate,
    hll_rollup,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def ids(spark):
    # 3 groups: g0 has 40 distinct ids (< k), g1/g2 have 3000 each,
    # overlapping ranges so dedup-under-merge is exercised; each id
    # appears twice to prove distinctness.
    df = spark.range(0, 3000).select(
        F.explode(
            F.array(F.lit("g1"), F.lit("g1"), F.lit("g2"), F.lit("g2"))
        ).alias("g"),
        (F.col("id") + F.when(F.expr("id % 2 = 0"), 0).otherwise(1500)).alias(
            "v"
        ),
        (F.col("id") % 4).alias("part"),
    )
    small = spark.range(0, 40).select(
        F.lit("g0").alias("g"), F.col("id").alias("v"), (F.col("id") % 4).alias("part")
    )
    return df.unionByName(small)


K = 128


def test_kmv_merge_is_lossless(spark, ids):
    """Merging per-part sketches == sketching the whole group."""
    per_part = kmv_sketch(ids, dims=["g", "part"], col="v", k=K)
    merged = kmv_merge(per_part, dims=["g"], k=K)
    whole = kmv_sketch(ids, dims=["g"], col="v", k=K)
    m = {r["g"]: list(r["kmv"]) for r in merged.collect()}
    w = {r["g"]: list(r["kmv"]) for r in whole.collect()}
    assert m == w


def test_kmv_exact_below_k(spark, ids):
    sk = kmv_sketch(ids.filter("g = 'g0'"), dims=["g"], col="v", k=K)
    out = sk.select("g", kmv_estimate(F.col("kmv"), K).alias("est")).collect()
    assert out[0]["est"] == 40.0  # fewer than k distinct -> exact


def test_kmv_estimate_within_bounds(spark, ids):
    """KMV relative error concentrates around 1/sqrt(k-2) (~9 % at
    k=128); assert a loose 3-sigma bound."""
    sk = kmv_sketch(ids, dims=["g"], col="v", k=K)
    ests = {
        r["g"]: r["est"]
        for r in sk.select(
            "g", kmv_estimate(F.col("kmv"), K).alias("est")
        ).collect()
    }
    # g1: ids 0..2998 even ids + odd ids shifted -> distinct count:
    truth = {
        "g1": ids.filter("g='g1'").select("v").distinct().count(),
        "g2": ids.filter("g='g2'").select("v").distinct().count(),
    }
    for g, t in truth.items():
        assert abs(ests[g] - t) / t < 0.27, (g, ests[g], t)


def test_hll_merge_equals_whole(spark, ids):
    per_part = hll_rollup(ids, dims=["g", "part"], col="v", lgk=12)
    merged = hll_merge_estimate(per_part, dims=["g"])
    whole = hll_rollup(ids, dims=["g"], col="v", lgk=12).withColumn(
        "n_est", F.hll_sketch_estimate("hll")
    )
    m = {r["g"]: r["n_est"] for r in merged.collect()}
    w = {r["g"]: r["n_est"] for r in whole.collect()}
    for g in w:
        assert m[g] == pytest.approx(w[g], rel=1e-9), g


def test_hll_estimate_accuracy(spark, ids):
    sk = hll_rollup(ids, dims=["g"], col="v", lgk=12).withColumn(
        "n_est", F.hll_sketch_estimate("hll")
    )
    ests = {r["g"]: r["n_est"] for r in sk.collect()}
    for g in ("g0", "g1", "g2"):
        t = ids.filter(F.col("g") == g).select("v").distinct().count()
        assert abs(ests[g] - t) / t < 0.05, (g, ests[g], t)


# ---- log-histogram quantile sketch ----------------------------------------


def test_hist_quantiles_within_error_bound(spark):
    from pyspark.sql import functions as F

    from cdc_redshift_spark.operators.sketches import (
        hist_merge,
        hist_quantiles,
        hist_sketch,
    )
    from cdc_redshift_spark.sources.tables import load_table

    od = load_table(spark, SF_DIR, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    sk = hist_sketch(od, dims=["o_orderpriority"], value=F.col("cents"))
    est = {
        (r.o_orderpriority, r.q): r.est
        for r in hist_quantiles(sk, dims=["o_orderpriority"]).collect()
    }
    # exact quantiles per group, same rank definition (ceil(num*n/den))
    rows = od.select("o_orderpriority", "cents").collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.o_orderpriority, []).append(r.cents)
    for pri, vals in groups.items():
        vals.sort()
        n = len(vals)
        for num, den, lbl in ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")):
            rank = (num * n + den - 1) // den
            exact = vals[rank - 1]
            got = est[(pri, lbl)]
            # bin spans [lo, lo*(1 + 1/(16+sub))) -> midpoint within
            # 1/(2*16) of any member, plus a hair for integer edges
            assert abs(got - exact) / exact <= 1 / 32 + 1e-9, (
                pri,
                lbl,
                got,
                exact,
            )


def test_hist_sketch_merge_is_lossless(spark):
    from pyspark.sql import functions as F

    from cdc_redshift_spark.operators.sketches import (
        hist_merge,
        hist_quantiles,
        hist_sketch,
    )
    from cdc_redshift_spark.sources.tables import load_table

    od = (
        load_table(spark, SF_DIR, "orders")
        .withColumn(
            "month",
            F.date_trunc("month", F.col("o_orderdate").cast("timestamp")),
        )
        .withColumn(
            "cents", F.round(F.col("o_totalprice") * 100).cast("long")
        )
    )
    direct = hist_quantiles(
        hist_sketch(od, dims=["o_orderpriority"], value=F.col("cents")),
        dims=["o_orderpriority"],
    )
    merged = hist_quantiles(
        hist_merge(
            hist_sketch(
                od, dims=["o_orderpriority", "month"], value=F.col("cents")
            ),
            dims=["o_orderpriority"],
        ),
        dims=["o_orderpriority"],
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


# ---- HLL register-level oracle (VERDICT r5 task #3) -----------------------
#
# The ESTIMATE is implementation-defined (composite/HIP refinements),
# but the REGISTER ARRAY is pure public spec: murmur3-128(seed 9001) →
# slot/CLZ → max.  Mirroring it in Python and comparing every serialized
# register byte certifies Spark's hll_sketch_agg at the same level a
# DuckDB value oracle certifies the other queries.


def test_hll_registers_match_pure_python_mirror(spark):
    from hll_register_mirror import hll8_registers, parse_hll8

    n, lgk = 10_000, 12
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    row = hll_rollup(df, dims=["g"], col="v", lgk=lgk).collect()[0]
    got_lgk, got = parse_hll8(bytes(row.hll))
    assert got_lgk == lgk
    want = hll8_registers((str(i) for i in range(n)), lgk=lgk)
    assert got == want  # every register byte


def test_hll_union_registers_are_elementwise_max(spark):
    """Merge certification at register level: union(a, b) registers ==
    elementwise max — the mergeability property the 100 TB rollup
    relies on, checked against the spec mirror on both inputs."""
    from hll_register_mirror import hll8_registers, parse_hll8

    n, lgk = 12_000, 12
    # overlapping halves
    a = spark.range(0, 8_000)
    b = spark.range(4_000, n)
    df = a.select(F.lit("a").alias("part"), F.col("id").cast("string").alias("v")).unionByName(
        b.select(F.lit("b").alias("part"), F.col("id").cast("string").alias("v"))
    ).withColumn("g", F.lit("g"))
    parts = hll_rollup(df, dims=["g", "part"], col="v", lgk=lgk)
    merged = parts.groupBy("g").agg(
        F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll")
    )
    _, got = parse_hll8(bytes(merged.collect()[0].hll))
    ra = hll8_registers((str(i) for i in range(0, 8_000)), lgk=lgk)
    rb = hll8_registers((str(i) for i in range(4_000, n)), lgk=lgk)
    assert got == [max(x, y) for x, y in zip(ra, rb)]


# ---- KMV set-intersection (round 6) ---------------------------------------


def test_kmv_intersect_exact_below_k(spark):
    from cdc_redshift_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_sketch,
    )

    # |A|=60, |B|=50, overlap 30 — everything below k=128: exact path
    a = spark.range(0, 60).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(30, 80).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    ka = kmv_sketch(a, ["g"], "v", k=128).withColumnRenamed("kmv", "ka")
    kb = kmv_sketch(b, ["g"], "v", k=128).withColumnRenamed("kmv", "kb")
    got = (
        ka.join(kb, "g")
        .select(kmv_intersect_estimate(F.col("ka"), F.col("kb"), 128).alias("e"))
        .collect()[0]
        .e
    )
    assert got == 30.0


def test_kmv_intersect_estimate_within_bounds(spark):
    from cdc_redshift_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_sketch,
    )

    # |A|=6000, |B|=6000, true overlap 2000, k=256 — the estimator path.
    # KMV intersection error grows with 1/match-fraction; 25% relative
    # is a conservative gate for k=256 at 1/5 overlap of the union.
    a = spark.range(0, 6000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(4000, 10000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    ka = kmv_sketch(a, ["g"], "v", k=256).withColumnRenamed("kmv", "ka")
    kb = kmv_sketch(b, ["g"], "v", k=256).withColumnRenamed("kmv", "kb")
    got = (
        ka.join(kb, "g")
        .select(kmv_intersect_estimate(F.col("ka"), F.col("kb"), 256).alias("e"))
        .collect()[0]
        .e
    )
    assert abs(got - 2000) / 2000 < 0.25, got


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cm_never_underestimates_and_is_tight_when_sparse(spark):
    from cdc_redshift_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )
    from pyspark.sql import functions as F

    # skewed stream: key k appears k times, k = 1..60 (1830 rows)
    df = spark.range(1, 61).select(
        F.explode(F.sequence(F.lit(1), F.col("id"))).alias("r"),
        F.concat(F.lit("k"), F.col("id")).alias("key"),
    )
    sk = cm_sketch(df, "key", d=4, w=1024)
    assert sk.count() <= 4 * 1024
    probes = df.select("key").distinct().union(
        spark.createDataFrame([("absent",)], "key string")
    )
    est = {r.key: r.est for r in cm_estimate(
        sk, probes, "key", d=4, w=1024).collect()}
    for k in range(1, 61):
        assert est[f"k{k}"] >= k
        # 60 keys in 1024 buckets: collisions are rare; the estimate
        # should stay within the e*N/w ~ 5 additive bound
        assert est[f"k{k}"] - k <= 5
    assert est["absent"] >= 0


def test_cm_merge_equals_whole_stream_sketch(spark):
    from cdc_redshift_spark.operators.sketches import cm_merge, cm_sketch
    from pyspark.sql import functions as F

    a = spark.range(0, 500).select(
        (F.col("id") % 37).cast("string").alias("key")
    )
    b = spark.range(500, 900).select(
        (F.col("id") % 23).cast("string").alias("key")
    )
    merged = cm_merge(cm_sketch(a, "key"), cm_sketch(b, "key"))
    whole = cm_sketch(a.union(b), "key")
    assert (
        merged.exceptAll(whole).count() == 0
        and whole.exceptAll(merged).count() == 0
    )


def test_cm_maintainer_replay_and_merge_equivalence(spark, tmp_path):
    from cdc_redshift_spark.operators.sketches import cm_sketch
    from cdc_redshift_spark.streaming.sketch import CmSketchMaintainer
    from pyspark.sql import functions as F

    df = spark.range(0, 900).select(
        (F.col("id") % 41).cast("string").alias("key"),
        F.col("id").alias("event_id"),
    )
    m = CmSketchMaintainer(
        spark, str(tmp_path / "cm"), prepare=lambda b: b.select("key"),
        d=4, w=512, keep_versions=2,
    )
    assert m.update(df.where(F.col("event_id") % 2 == 0), 0)
    assert not m.update(df.where(F.col("event_id") % 2 == 0), 0)  # replay
    assert not m.update(df.limit(5), 0)  # stale id, any payload
    assert m.update(df.where(F.col("event_id") % 2 == 1), 1)
    streamed = m.current()
    whole = cm_sketch(df.select("key"), "key", d=4, w=512)
    assert (
        streamed.exceptAll(whole).count() == 0
        and whole.exceptAll(streamed).count() == 0
    )
    # retention: keep_versions bounds the snapshot count
    m.update(df.limit(10).select("key", "event_id"), 2)
    vdirs = [d for d in (tmp_path / "cm").iterdir()
             if d.name.startswith("v")]
    assert len(vdirs) <= 2


def test_kmv_maintainer_streamed_equals_whole_table(spark, tmp_path):
    from cdc_redshift_spark.operators.sketches import kmv_sketch
    from cdc_redshift_spark.streaming.sketch import KmvSketchMaintainer
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 137).alias("u"),
        F.col("id").alias("event_id"),
    )
    m = KmvSketchMaintainer(
        spark, str(tmp_path / "kmv"),
        prepare=lambda b: b.select("g", "u"),
        dims=["g"], col="u", k=32,
    )
    assert m.update(df.where(F.col("event_id") % 2 == 0), 0)
    assert not m.update(df.where(F.col("event_id") % 2 == 0), 0)
    assert m.update(df.where(F.col("event_id") % 2 == 1), 1)
    streamed = {r.g: r.kmv for r in m.current().collect()}
    whole = {
        r.g: r.kmv
        for r in kmv_sketch(df, ["g"], "u", k=32).collect()
    }
    # lossless merge: BIT-identical sketch arrays per group
    assert streamed == whole and len(streamed) == 3


def test_cm_inner_product_never_underestimates(spark):
    from cdc_redshift_spark.operators.sketches import (
        cm_inner_product,
        cm_sketch,
    )

    # heavy collisions: tiny width forces overestimates, never under
    a = spark.createDataFrame([(str(i % 7),) for i in range(500)], "k string")
    b = spark.createDataFrame([(str(i % 11),) for i in range(300)], "k string")
    d, w = 4, 16
    est = cm_inner_product(
        cm_sketch(a, "k", d=d, w=w), cm_sketch(b, "k", d=d, w=w), d
    ).collect()[0]["n_est"]
    exact = a.join(b, "k").count()
    assert est >= exact > 0


def test_cm_inner_product_disjoint_keys_zero(spark):
    from cdc_redshift_spark.operators.sketches import (
        cm_inner_product,
        cm_sketch,
    )

    a = spark.createDataFrame([("a",), ("b",)], "k string")
    b = spark.createDataFrame([("x",), ("y",)], "k string")
    # wide sketch: disjoint keys are unlikely to collide in EVERY row,
    # so at least one row j has no joined cells -> short-circuit to 0
    d, w = 4, 4096
    est = cm_inner_product(
        cm_sketch(a, "k", d=d, w=w), cm_sketch(b, "k", d=d, w=w), d
    ).collect()[0]["n_est"]
    assert est == 0


# ---------------------------------------------------------------------------
# pure-Python CM estimator: property tests (no Spark — the planner path)
# ---------------------------------------------------------------------------


def _py_cm_cells(keys, d, w):
    """Pure-Python mirror of cm_sketch's cells over a key multiset:
    the same stable_hash60 double-hash arithmetic (h1 + j*h2 mod w,
    h2 forced odd) as operators/sketches.cm_hashes."""
    import hashlib
    from collections import Counter

    cells = Counter()
    for k in keys:
        h1 = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        h2 = int(hashlib.md5(f"c:{k}".encode()).hexdigest()[:15], 16) | 1
        for j in range(d):
            cells[(j, (h1 + j * h2) % w)] += 1
    return [[j, b, c] for (j, b), c in cells.items()]


def test_cm_cells_python_mirror_matches_spark(spark):
    """The pure-Python cell construction used by the property tests is
    the SAME sketch cm_sketch builds — pinned once against Spark so
    the Sparkless property tests below certify the real arithmetic."""
    from pyspark.sql import functions as F

    from cdc_redshift_spark.operators.sketches import cm_collect, cm_sketch

    keys = [str(i % 37) for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    spark_cells = sorted(
        map(tuple, cm_collect(cm_sketch(df, "k", d=4, w=64)))
    )
    py_cells = sorted(map(tuple, _py_cm_cells(keys, 4, 64)))
    assert spark_cells == py_cells


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    a=st.lists(st.integers(0, 50), min_size=0, max_size=120),
    b=st.lists(st.integers(0, 50), min_size=0, max_size=120),
    d=st.integers(2, 5),
    w=st.sampled_from([16, 64, 256]),
)
def test_cm_inner_product_cells_never_undershoots(a, b, d, w):
    """One-sided guarantee over random key multisets: the planner-side
    estimate is >= the exact frequency-vector inner product (the true
    equi-join size), and exactly equal when w is collision-free for
    the key set."""
    from collections import Counter

    from cdc_redshift_spark.operators.sketches import (
        cm_inner_product_cells,
    )

    ka, kb = [str(x) for x in a], [str(x) for x in b]
    exact = sum(
        ca * Counter(kb)[k] for k, ca in Counter(ka).items()
    )
    est = cm_inner_product_cells(
        _py_cm_cells(ka, d, w), _py_cm_cells(kb, d, w), d
    )
    assert est >= exact
    # empty side -> some sketch row has no colliding cells -> exactly 0
    if not a or not b:
        assert est == 0


@settings(max_examples=30, deadline=None)
@given(
    a=st.lists(st.integers(0, 30), min_size=1, max_size=80),
    d=st.integers(2, 5),
)
def test_cm_self_join_estimate_bounds_sum_of_squares(a, d):
    """Self-join: exact size is sum(n_k^2); the estimate upper-bounds
    it and, at a collision-free width, equals it exactly."""
    from collections import Counter

    from cdc_redshift_spark.operators.sketches import (
        cm_inner_product_cells,
    )

    ka = [str(x) for x in a]
    exact = sum(n * n for n in Counter(ka).values())
    w = 4096
    cells = _py_cm_cells(ka, d, w)
    est = cm_inner_product_cells(cells, cells, d)
    assert est >= exact
    # the min-over-rows strips collisions whenever ANY row maps every
    # distinct key to its own bucket — compute that directly and pin
    # EXACT equality for it (the property the estimator's guarantee is
    # built on), instead of a vacuous upper bound
    import hashlib

    row_free = []
    distinct = set(ka)
    for j in range(d):
        buckets = set()
        for k in distinct:
            h1 = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
            h2 = int(hashlib.md5(f"c:{k}".encode()).hexdigest()[:15], 16) | 1
            buckets.add((h1 + j * h2) % w)
        row_free.append(len(buckets) == len(distinct))
    if any(row_free):
        assert est == exact, (d, sorted(distinct))


def test_duck_murmur3_register_mirror_boundary_strings():
    """The DuckDB murmur3_x64_128 mirror inside duck_hll8_registers
    must agree with the pure-Python public-spec mirror across ASCII
    strings of ANY length (round 13, VERDICT r11 #7: the 16-byte
    block rounds now run as a recursive CTE, so 16+-byte keys are IN
    domain).  Pure-DuckDB test: adversarial keys across every
    boundary — sub-8 (k1-only tail), exactly 8, 9..15 (k2 tail),
    exactly 16 (one block, empty tail), 16+1 / 16+8 / 16+9 (block
    plus each tail leg), 2 and 3 blocks, 100 bytes — compared to
    hll8_registers at the byte level.  (Empty string excluded — it
    hashes fine but can't survive the VALUES-list VARCHAR round-trip
    distinctly from NULL.)"""
    import duckdb

    from cdc_redshift_spark.operators.sketches import duck_hll8_registers
    from hll_register_mirror import hll8_registers

    keys = [
        "0", "7", "12345", "abcdefg",          # < 8 bytes
        "abcdefgh", "12345678",                # exactly 8 (k1 full)
        "abcdefghi", "987654321012345",        # 9..15 (k2 path)
        "had", "HAD", "~~~~~~~~~~~~~~~",       # case + punct, 15 bytes
        "0123456789abcdef",                    # 16: 1 block, no tail
        "0123456789abcdefX",                   # block + 1-byte tail
        "0123456789abcdefABCDEFGH",            # block + 8-byte tail
        "0123456789abcdefABCDEFGHI",           # block + 9 (k2 tail)
        "0123456789abcdef0123456789abcdef",    # 2 blocks, no tail
        "u" * 47, "u" * 48, "x" * 100,         # multi-block + tails
    ]
    lgk = 4
    vals = ", ".join(f"('g', '{k}')" for k in keys)
    sql = duck_hll8_registers(
        f"SELECT d, s FROM (VALUES {vals}) v(d, s)", "d", "s", lgk
    ) + "\nORDER BY slot"
    got = [r[2] for r in duckdb.sql(sql).fetchall()]
    want = hll8_registers(keys, lgk=lgk)
    assert got == want


def test_kmv_null_values_do_not_consume_slots(spark):
    """Review r14: a NULL value's NULL hash used to take rank 1 in
    the k-window (NULLS FIRST) and then vanish from collect_list —
    the sketch shrank to k-1 entries and kmv_estimate fell into its
    'exact' branch, a silent unbounded underestimate.  NULLs must be
    excluded outright (COUNT DISTINCT semantics)."""
    from pyspark.sql import functions as F

    from cdc_redshift_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    rows = [("g", str(i)) for i in range(10)] + [("g", None)]
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, ["g"], "v", k=4).collect()[0]
    assert len(sk["kmv"]) == 4, "NULL consumed a k-slot"
    est = (
        kmv_sketch(df, ["g"], "v", k=4)
        .select(kmv_estimate(F.col("kmv"), k=4).alias("e"))
        .collect()[0]["e"]
    )
    # 10 distinct values, k=4: the estimator branch must fire (not
    # the 'exact size' branch reporting 3.0)
    assert est > 4.0
    # and a NULL-free frame of the same values gives the SAME sketch
    clean = kmv_sketch(
        spark.createDataFrame(rows[:10], "g string, v string"),
        ["g"], "v", k=4,
    ).collect()[0]
    assert clean["kmv"] == sk["kmv"]


def test_hist_sketch_drops_null_values(spark):
    """Review r14: a NULL value used to count as a NULL bin_id bin,
    inflating hist_quantiles' n and shifting every quantile.  NULLs
    drop (COUNT(col) semantics); the sketch and quantiles over a
    NULL-bearing column equal those over its non-null subset."""
    from pyspark.sql import functions as F

    from cdc_redshift_spark.operators.sketches import (
        hist_quantiles,
        hist_sketch,
    )

    vals = [100, 200, 300, 400, 500, 600, 700, 800, 900, 1000]
    rows = [("g", v) for v in vals] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "g string, v long")
    sk = hist_sketch(df, ["g"], F.col("v"))
    assert sk.where(F.col("bin_id").isNull()).count() == 0
    with_null = {
        (r["q"], r["est"])
        for r in hist_quantiles(sk, ["g"]).collect()
    }
    clean = {
        (r["q"], r["est"])
        for r in hist_quantiles(
            hist_sketch(
                spark.createDataFrame(
                    [("g", v) for v in vals], "g string, v long"
                ),
                ["g"],
                F.col("v"),
            ),
            ["g"],
        ).collect()
    }
    assert with_null == clean


def test_cm_depth_bound_enforced(spark):
    """Review r14: d > 8 would overflow h1 + j*h2 past BIGINT on the
    Spark side (silent wrap) while the DuckDB mirror raises — the
    shared cell definition must reject it for both."""
    import pytest

    from cdc_redshift_spark.operators.sketches import cm_sketch

    df = spark.createDataFrame([("k1",)], "k string")
    with pytest.raises(ValueError, match=r"CM depth"):
        cm_sketch(df, "k", d=9, w=64)
    with pytest.raises(ValueError, match=r"CM depth"):
        cm_sketch(df, "k", d=0, w=64)
