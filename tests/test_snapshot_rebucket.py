"""Round-12 bucket-geometry tests for VersionedSnapshotStore:
byte-budget sizing (n_buckets="auto"), the explicit rebucket()
migration (read all -> rewrite at n' -> new sub-versioned token), the
geometric maybe_rebucket() growth trigger, and the invariants that
make a migration safe mid-stream — replay idempotency untouched,
pruned reads routed by the committed version's own recorded count,
and store equivalence to a full-rewrite maintainer across any delta
sequence with rebuckets interleaved."""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_redshift_spark.streaming.rollup import RollupMaintainer
from cdc_redshift_spark.streaming.snapshots import (
    BUCKET_COL,
    size_buckets_for_bytes,
)


def _m(spark, path, **kw):
    kw.setdefault("n_buckets", 8)
    return RollupMaintainer(
        spark, str(path), lambda r: r, time_col=None, bucket=None,
        dims=["k"], measures={"sum_v": "v"}, **kw,
    )


def _delta(spark, rows):
    return spark.createDataFrame(
        [(s, k, float(v)) for s, k, v in rows],
        "sign int, k string, v double",
    )


def _state(m):
    cur = m.current()
    return sorted(
        (r["k"], r["n"], float(r["sum_v"]))
        for r in (cur.collect() if cur is not None else [])
    )


# -- sizing --------------------------------------------------------------


def test_size_buckets_for_bytes_ladder():
    """The byte-budget count is the smallest power of two whose
    per-bucket share fits the target — exact at the boundaries."""
    assert size_buckets_for_bytes(0, 100) == 1
    assert size_buckets_for_bytes(100, 100) == 1
    assert size_buckets_for_bytes(101, 100) == 2
    assert size_buckets_for_bytes(200, 100) == 2
    assert size_buckets_for_bytes(201, 100) == 4
    assert size_buckets_for_bytes(100 * 1024, 100) == 1024
    with pytest.raises(ValueError, match="target_bytes"):
        size_buckets_for_bytes(1, 0)


def _hexkey(i, salt=""):
    """Deterministic incompressible-ish key: parquet can't dictionary-
    or RLE-collapse distinct digests, so N of them carry real bytes
    (tiny targets are floored, see MIN_TARGET_BUCKET_BYTES — these
    tests must move real data to move the sizing signal)."""
    import hashlib

    return hashlib.sha256(f"{salt}{i}".encode()).hexdigest()


def test_auto_sizes_from_first_commit_bytes(spark, tmp_path):
    """n_buckets='auto': the first commit writes plain, measures its
    bytes, and records the byte-budget count in the version dir; the
    SECOND commit lays the state out bucketed at that count."""
    m = _m(spark, tmp_path / "ru", n_buckets="auto",
           target_bucket_bytes=16 << 10)
    assert m.update(
        _delta(spark, [(1, _hexkey(i), 1) for i in range(1500)]), 0
    )
    v0 = tmp_path / "ru" / "v0"
    assert not any(
        d.startswith(BUCKET_COL) for d in os.listdir(v0)
    ), "first auto commit must be plain (bytes unknown before writing)"
    sized = int((v0 / "_NBUCKETS").read_text())
    assert sized == size_buckets_for_bytes(
        sum(
            f.stat().st_size
            for f in v0.iterdir()
            if not f.name.startswith((".", "_"))
        ),
        16 << 10,
    )
    assert sized >= 2  # 1500 x 64-hex keys >> 16 KiB target
    k0 = _hexkey(0)
    assert m.update(_delta(spark, [(1, k0, 1)]), 1)
    v1 = tmp_path / "ru" / "v1"
    got = {
        int(d.split("=")[1])
        for d in os.listdir(v1)
        if d.startswith(f"{BUCKET_COL}=")
    }
    assert got and max(got) < int((v1 / "_NBUCKETS").read_text())
    assert (k0, 2, 2.0) in _state(m)


def test_target_bucket_bytes_floor_enforced(spark, tmp_path):
    """A target at or below the per-file parquet overhead would let
    layout overhead feed the sizing signal (each migration adds files
    -> more measured bytes -> another migration, forever) — the
    constructor rejects targets under the documented floor."""
    with pytest.raises(ValueError, match="target_bucket_bytes"):
        _m(spark, tmp_path / "ru", n_buckets="auto",
           target_bucket_bytes=1024)


def test_explicit_rebucket_preserves_state_and_batch_id(spark, tmp_path):
    """rebucket(n') migrates as a sub-versioned token: identical
    state, committed_batch unchanged (replay of an old id still
    no-ops, the next real id still commits), and subsequent pruned
    commits read/route/link on the MIGRATED layout."""
    m = _m(spark, tmp_path / "ru", n_buckets=4)
    assert m.update(
        _delta(spark, [(1, f"k{i}", i + 1) for i in range(30)]), 0
    )
    before = _state(m)
    assert m.rebucket(16) == 16
    assert m._committed_token() == "0_r1"
    assert m.committed_batch() == 0
    assert m._bucket_count() == 16
    vdir = tmp_path / "ru" / "v0_r1"
    assert (vdir / "_NBUCKETS").read_text() == "16"
    assert _state(m) == before
    # replay of the already-committed batch must still no-op
    assert not m.update(_delta(spark, [(1, "k0", 9)]), 0)
    assert _state(m) == before
    # next real batch commits PRUNED against the migrated layout:
    # untouched buckets hard-link forward from v0_r1's inodes
    def inodes(tok):
        vd = tmp_path / "ru" / f"v{tok}"
        return {
            d: {
                fn: os.stat(vd / d / fn).st_ino
                for fn in os.listdir(vd / d)
                if not fn.startswith((".", "_"))
            }
            for d in os.listdir(vd)
            if d.startswith(f"{BUCKET_COL}=")
        }

    old = inodes("0_r1")
    assert len(old) > 2
    d1 = _delta(spark, [(1, "k0", 100)])
    touched = m.touched_buckets(d1)
    assert m.update(d1, 1)
    new = inodes("1")
    assert len(touched) == 1
    tdir = f"{BUCKET_COL}={touched[0]}"
    for d, files in old.items():
        if d != tdir:
            assert new[d] == files, f"untouched {d} rewritten post-migration"
    assert ("k0", 2, 101.0) in _state(m)


def test_rebucket_validation(spark, tmp_path):
    m = _m(spark, tmp_path / "ru", n_buckets=4)
    with pytest.raises(ValueError, match="first commit"):
        m.rebucket(8)
    assert m.update(_delta(spark, [(1, "a", 1)]), 0)
    with pytest.raises(ValueError, match="n_new"):
        m.rebucket(0)
    # same count on an already-bucketed layout: no new version
    assert m.rebucket(4) == 4
    assert m._committed_token() == "0"
    un = _m(spark, tmp_path / "un", n_buckets=0)
    assert un.update(_delta(spark, [(1, "a", 1)]), 0)
    with pytest.raises(ValueError, match="bucketed"):
        un.rebucket(8)


def test_maybe_rebucket_grows_geometrically(spark, tmp_path):
    """Auto mode grows only on >= 2x outgrowth: a small delta leaves
    the grid alone; piling on state until the byte-budget size
    doubles triggers exactly one migration to the doubled count."""
    m = _m(spark, tmp_path / "ru", n_buckets="auto",
           target_bucket_bytes=16 << 10)
    assert m.update(
        _delta(spark, [(1, _hexkey(i), 1) for i in range(1200)]), 0
    )
    n0 = m._bucket_count()
    assert n0 >= 1
    # small growth: no migration
    k0 = _hexkey(0)
    assert m.update(_delta(spark, [(1, k0, 1)]), 1)
    tok_before = m._committed_token()
    assert "_r" not in tok_before
    # bulk growth: keys explode the stored bytes well past 2x
    assert m.update(
        _delta(spark, [(1, _hexkey(i, "big"), 1) for i in range(6000)]), 2
    )
    n2 = m._bucket_count()
    assert n2 >= n0 * 2
    assert m._committed_token().startswith("2_r")
    got = _state(m)
    assert (k0, 2, 2.0) in got and len(got) == 7200


def test_growth_double_flip_keeps_pre_commit_version(spark, tmp_path):
    """r14 known limitation, closed: an AUTO growth migration runs
    TWO flips inside one update() (the data commit, then the
    rebucket's sub-versioned commit).  At keep_versions=2 the second
    flip's prune used to delete the version that was committed when
    the update() began — stranding a concurrent reader that resolved
    the pointer just before the call.  The migration flip now exempts
    that version (keep_extra), and it ages out on the NEXT update
    instead."""
    m = _m(spark, tmp_path / "ru", n_buckets="auto",
           target_bucket_bytes=16 << 10, keep_versions=2)
    assert m.update(
        _delta(spark, [(1, _hexkey(i), 1) for i in range(1200)]), 0
    )
    assert m.update(_delta(spark, [(1, _hexkey(0), 1)]), 1)
    pre = m._committed_token()
    assert pre == "1"
    # growth batch: commit flips v2, then the migration flips v2_r1
    assert m.update(
        _delta(spark, [(1, _hexkey(i, "big"), 1) for i in range(6000)]), 2
    )
    assert m._committed_token().startswith("2_r")
    assert (tmp_path / "ru" / "v1").exists(), (
        "double-flip pruned the pre-commit version within one update()"
    )
    # the reader-visible pre-commit snapshot is genuinely readable
    assert spark.read.parquet(str(tmp_path / "ru" / "v1")).count() > 0
    # convergence: the next update ages v1 out normally (it is no
    # longer prev nor the keep_extra of that flip)
    assert m.update(_delta(spark, [(1, _hexkey(1), 1)]), 3)
    assert not (tmp_path / "ru" / "v1").exists()
    left = sorted(
        d for d in os.listdir(tmp_path / "ru") if d.startswith("v")
    )
    # only batch-2/3 era versions remain, whether or not batch 3
    # itself migrated again
    assert left and all(d.startswith(("v2_r", "v3")) for d in left)
    assert _state(m)  # pointer resolves and reads


def test_restart_routes_by_migrated_count(spark, tmp_path):
    """A maintainer RESTARTED after a migration (fresh instance, the
    original pre-migration constructor value) must route reads and
    writes by the committed version's recorded count — the _NBUCKETS
    resolution order, which outranks both the legacy top-level
    _BUCKETS pin (still 4 here) and the constructor."""
    m = _m(spark, tmp_path / "ru", n_buckets=4)
    assert m.update(_delta(spark, [(1, f"k{i}", 1) for i in range(20)]), 0)
    assert (tmp_path / "ru" / "_BUCKETS").read_text() == "4"
    m.rebucket(16)
    m2 = _m(spark, tmp_path / "ru", n_buckets=4)  # restart
    assert m2._bucket_count() == 16
    assert m2.update(_delta(spark, [(1, "k0", 1)]), 1)
    assert ("k0", 2, 2.0) in _state(m2)
    # and the new commit's layout carries the migrated count forward
    assert (tmp_path / "ru" / "v1" / "_NBUCKETS").read_text() == "16"


def test_explicit_count_never_auto_migrates(spark, tmp_path):
    """Pinned-n stores keep their geometry no matter how the state
    grows — maybe_rebucket is the AUTO loop's trigger only, so an
    operator who pinned n_buckets gets no surprise full rewrites."""
    m = _m(spark, tmp_path / "ru", n_buckets=2,
           target_bucket_bytes=16 << 10)
    assert m.update(
        _delta(spark, [(1, _hexkey(i), 1) for i in range(3000)]), 0
    )
    assert m.update(
        _delta(spark, [(1, _hexkey(i, "x"), 1) for i in range(3000)]), 1
    )
    assert m._bucket_count() == 2
    assert "_r" not in m._committed_token()
    # the trigger is still available explicitly, and sizes from bytes
    n = m.maybe_rebucket()
    assert n is not None and n >= 4  # 6000 hex keys >> 2 x 16 KiB
    assert m._bucket_count() == n


def test_crash_mid_rebucket_leaves_store_consistent(spark, tmp_path):
    """The crash-safety claim in rebucket()'s docstring, pinned: all
    migration mutation lands in the NEW version dir before the atomic
    _LATEST flip, so a crash mid-migration (simulated: a partial
    sub-version dir exists, pointer never flipped) leaves the store
    reading the OLD version, routing by the OLD count, accepting the
    next batch normally — and version pruning eventually removes the
    orphan."""
    m = _m(spark, tmp_path / "ru", n_buckets=4)
    assert m.update(_delta(spark, [(1, f"k{i}", 1) for i in range(20)]), 0)
    before = _state(m)
    # simulate a torn migration: partial new-version dir, no flip
    orphan = tmp_path / "ru" / "v0_r1"
    (orphan / f"{BUCKET_COL}=0").mkdir(parents=True)
    (orphan / f"{BUCKET_COL}=0" / "part-00000.parquet").write_bytes(
        b"torn write"
    )
    (orphan / "_NBUCKETS").write_text("16")
    assert m._committed_token() == "0"
    assert m._bucket_count() == 4  # orphan's _NBUCKETS must NOT route
    assert _state(m) == before
    # next commits proceed normally; keep_versions=2 pruning removes
    # the orphan once enough newer versions exist (sorted token order)
    assert m.update(_delta(spark, [(1, "k0", 1)]), 1)
    assert m.update(_delta(spark, [(1, "k1", 1)]), 2)
    assert not orphan.exists(), "orphan dir must be pruned"
    got = _state(m)
    assert ("k0", 2, 2.0) in got and ("k1", 2, 2.0) in got
    # and a LATER real migration still works over the healed store
    assert m.rebucket(8) == 8
    assert m._committed_token() == "2_r1"
    assert _state(m) == got


@given(
    plan=st.lists(
        st.one_of(
            st.lists(  # a signed delta batch
                st.tuples(
                    st.sampled_from([1, -1]),
                    st.sampled_from(["a", "b", "c", "d", "e"]),
                    st.integers(min_value=1, max_value=3),
                ),
                min_size=0,
                max_size=5,
            ),
            st.sampled_from(["re2", "re8", "re16"]),  # interleaved rebucket
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rebucket_interleaved_equals_full_rewrite(
    spark, tmp_path_factory, plan
):
    """Store equivalence across migrations: ANY interleaving of signed
    delta batches and rebucket() calls ends with the identical stored
    state to a full-rewrite (n_buckets=0) maintainer fed the same
    deltas — migrations are invisible to semantics."""
    tmp_a = tmp_path_factory.mktemp("ru_re")
    tmp_b = tmp_path_factory.mktemp("ru_full")
    ma = _m(spark, tmp_a, n_buckets=4)
    mb = _m(spark, tmp_b, n_buckets=0)
    bid = 0
    for step in plan:
        if isinstance(step, str):
            if ma.committed_batch() is not None:
                ma.rebucket(int(step[2:]))
            continue
        ma.update(_delta(spark, step), bid)
        mb.update(_delta(spark, step), bid)
        bid += 1
    assert _state(ma) == _state(mb)


def test_orphan_never_displaces_previous_committed_version(
    spark, tmp_path
):
    """ADVICE r12: a crash-aborted rebucket orphan (v0_r1, never
    committed) must not count toward keep_versions — with
    keep_versions=2 the flip to v1 must keep the genuinely previous
    committed v0 (a reader holding the old pointer still resolves)
    and delete the orphan outright, not the other way around."""
    m = _m(spark, tmp_path / "ru", n_buckets=4)
    assert m.update(_delta(spark, [(1, f"k{i}", 1) for i in range(8)]), 0)
    orphan = tmp_path / "ru" / "v0_r1"
    (orphan / f"{BUCKET_COL}=0").mkdir(parents=True)
    (orphan / f"{BUCKET_COL}=0" / "part-00000.parquet").write_bytes(
        b"torn write"
    )
    (orphan / "_NBUCKETS").write_text("16")
    assert m.update(_delta(spark, [(1, "k0", 1)]), 1)
    assert not orphan.exists(), "never-committed orphan must be deleted"
    assert (tmp_path / "ru" / "v0").exists(), (
        "previous committed version displaced by the orphan"
    )
    assert (tmp_path / "ru" / "v1").exists()


def test_lost_latest_pointer_keeps_survivors_under_keep_versions(
    spark, tmp_path
):
    """ADVICE r13: prev_key=None in _flip means no committed pointer
    EXISTED — which is ALSO the state of a store whose _LATEST was
    lost (partial restore, manual copy), where every surviving version
    dir is a real committed snapshot.  The next commit must count the
    survivors toward keep_versions (here: keep the newest, prune the
    oldest), not rmtree them all as crash orphans."""
    m = _m(spark, tmp_path / "ru", n_buckets=4, keep_versions=2)
    assert m.update(_delta(spark, [(1, "a", 1)]), 0)
    assert m.update(_delta(spark, [(1, "b", 2)]), 1)
    assert (tmp_path / "ru" / "v0").exists()
    assert (tmp_path / "ru" / "v1").exists()
    os.remove(tmp_path / "ru" / "_LATEST")
    # pointer lost: the maintainer sees a fresh store and rebuilds
    # from the next delta — but the commit's pruning must treat the
    # surviving v0/v1 as committed history, keeping keep_versions=2
    # worth of dirs (v1 + the new v2), not deleting both outright
    assert m.update(_delta(spark, [(1, "c", 3)]), 2)
    assert not (tmp_path / "ru" / "v0").exists()  # pruned by policy
    assert (tmp_path / "ru" / "v1").exists(), (
        "lost-pointer survivor deleted outright instead of kept "
        "under keep_versions"
    )
    assert (tmp_path / "ru" / "v2").exists()
    # the recoverable snapshot really is readable after the flip
    v1 = spark.read.parquet(str(tmp_path / "ru" / "v1"))
    assert sorted(r["k"] for r in v1.collect()) == ["a", "b"]


def test_lost_pointer_replay_from_zero_keeps_flipped_dir(
    spark, tmp_path
):
    """Review r14: after a lost-pointer restore the stream replays
    from batch 0, so the surviving dirs carry HIGHER tokens than the
    new commit — the keep_versions prune (lowest keys first) must
    never select the dir _LATEST was just flipped to, or the store
    reads a deleted directory on the next access."""
    m = _m(spark, tmp_path / "ru", n_buckets=4, keep_versions=2)
    assert m.update(_delta(spark, [(1, "a", 1)]), 5)
    assert m.update(_delta(spark, [(1, "b", 2)]), 6)
    os.remove(tmp_path / "ru" / "_LATEST")
    # replay from batch 0: the new commit's token (0) sorts BELOW the
    # survivors (5, 6)
    assert m.update(_delta(spark, [(1, "c", 3)]), 0)
    assert (tmp_path / "ru" / "v0").exists(), (
        "prune deleted the just-committed version dir"
    )
    assert _state(m) == [("c", 1, 3.0)]  # _LATEST resolves and reads
    # the flipped dir is EXEMPT from the retention count, so this one
    # flip may keep keep_versions + 1 dirs (safety over thrift)
    assert (tmp_path / "ru" / "v5").exists()
    assert (tmp_path / "ru" / "v6").exists()
    # ...and the survivors KEEP surviving subsequent flips (review
    # r14: their _COMMITTED markers distinguish them from crash
    # orphans, so the `key > prev_key` outright-delete rule no longer
    # destroys the only copies of the pre-loss state one flip later);
    # the oldest replay version ages out under keep_versions instead
    assert m.update(_delta(spark, [(1, "d", 4)]), 1)
    left = sorted(
        d for d in os.listdir(tmp_path / "ru") if d.startswith("v")
    )
    # v0 survives this flip too: it is the immediately-previous
    # committed version, exempt from the keep_versions prune whatever
    # its sort order (ADVICE r14 — the high-token survivors must not
    # fill the retention slice and push out the version a reader
    # holding the old pointer still resolves)
    assert left == ["v0", "v1", "v5", "v6"], (
        "pre-loss committed survivors destroyed as crash orphans, or "
        "the immediately-previous version pruned under them"
    )
    assert _state(m) == [("c", 1, 3.0), ("d", 1, 4.0)]
    # one more flip: v0 is no longer prev and now ages out normally,
    # so the transient over-retention converges
    assert m.update(_delta(spark, [(1, "e", 5)]), 2)
    left = sorted(
        d for d in os.listdir(tmp_path / "ru") if d.startswith("v")
    )
    assert left == ["v1", "v2", "v5", "v6"]
    # the recoverable pre-loss snapshot is still readable
    v6 = spark.read.parquet(str(tmp_path / "ru" / "v6"))
    assert sorted(r["k"] for r in v6.collect()) == ["a", "b"]


def test_keep_versions_below_two_rejected(spark, tmp_path):
    """Review r14: keep_versions=1 would prune the previous version
    at each flip (breaking the reader-holding-the-old-pointer
    guarantee) and 0 would make the prune slice [:0] and retain
    everything forever — both must be rejected loudly at
    CONSTRUCTION (ADVICE r14: failing only at first commit means the
    version dir is already written), with the _flip check kept as a
    backstop."""
    for bad in (1, 0):
        with pytest.raises(ValueError, match="keep_versions"):
            _m(spark, tmp_path / f"ru{bad}", n_buckets=4,
               keep_versions=bad)


def test_dangling_pointer_fails_with_diagnosis(spark, tmp_path):
    """Review r14: the converse of the lost-pointer restore — pointer
    present, version dir missing — must fail with a message naming
    the corruption, not an opaque listdir/reader error."""
    import shutil as _sh

    m = _m(spark, tmp_path / "ru", n_buckets=4)
    assert m.update(_delta(spark, [(1, "a", 1)]), 0)
    _sh.rmtree(tmp_path / "ru" / "v0")
    with pytest.raises(RuntimeError, match="_LATEST points at"):
        m.current()
    with pytest.raises(RuntimeError, match="_LATEST points at"):
        m.update(_delta(spark, [(1, "b", 2)]), 1)


def test_empty_state_fallback_preserves_grown_bucket_count(
    spark, tmp_path
):
    """ADVICE r12: the _ensure_readable empty-state fallback rewrites
    the version dir with mode('overwrite'), which used to delete the
    just-recorded _NBUCKETS — an AUTO store whose state emptied then
    resolved its count from the stale first-sized _BUCKETS pin,
    silently resetting a geometrically grown grid.  The pin must
    survive the fallback."""
    m = _m(spark, tmp_path / "ru", n_buckets="auto",
           target_bucket_bytes=16 << 10)
    rows = [(1, _hexkey(i), 1) for i in range(400)]
    assert m.update(_delta(spark, rows), 0)
    assert m.update(_delta(spark, [(1, _hexkey(0), 1)]), 1)
    stale_pin = int((tmp_path / "ru" / "_BUCKETS").read_text())
    grown = m.rebucket(max(8, stale_pin * 4))
    assert grown > stale_pin
    # retract EVERYTHING (batch 0's rows plus batch 1's duplicate of
    # key 0): the committed state empties, the bucketed write emits no
    # data file, and the fallback plain write fires
    retract = [(-1, k, v) for _s, k, v in rows] + [(-1, _hexkey(0), 1)]
    assert m.update(_delta(spark, retract), 2)
    cur = m.current()
    assert cur is None or cur.count() == 0
    assert m._bucket_count() == grown, (
        "grown bucket count must survive the empty-state fallback"
    )
