"""Property-based LWW merge semantics (SURVEY §5.4).

Hypothesis generates random changelogs (arbitrary per-key interleavings
of insert/update/delete, timestamp ties, duplicate replays) and random
micro-batch splits; the engine's dedup → merge pipeline must always
equal the sequential reference reducer "apply events in (ts, offset)
order per key", and replaying any batch twice must be a no-op
(the idempotence behind the exactly-once claim, SURVEY §7.3).

Spark round-trips are slow, so examples are capped and deadline
disabled — the value is in the adversarial interleavings, not volume.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_redshift_spark.dedup import latest_per_key
from cdc_redshift_spark.normalize import pg_changeset
from cdc_redshift_spark.plans.merge import apply_changeset

KEYS = ("db", "table", "key")

# (op, key, ts_ms) with small domains so collisions/ties are COMMON
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=14,
)
splits_strategy = st.lists(st.integers(min_value=1, max_value=13), max_size=3)


def reference_reducer(events):
    """Final state by applying events in (ts, offset) order per key."""
    state: dict[int, tuple] = {}
    for off, (op, key, ts) in enumerate(events):
        cur = state.get(key)
        if cur is None or (ts, off) >= cur[:2]:
            state[key] = (ts, off, op)
    return {
        k: (ts, off) for k, (ts, off, op) in state.items() if op != "d"
    }


def raw_frame(spark, events, offset_base=0):
    rows = []
    for off, (op, key, ts) in enumerate(events):
        after = json.dumps({"id": key, "seq": off}) if op != "d" else None
        before = json.dumps({"id": key}) if op in ("d", "u") else None
        rows.append(
            (
                json.dumps(
                    {
                        "before": before,
                        "after": after,
                        "source": {"db": "d1", "table": "t1", "ts_ms": ts},
                        "op": op,
                        "ts_ms": ts,
                    }
                ),
                offset_base + off,
            )
        )
    return spark.createDataFrame(rows, "value string, offset long")


def engine_state(df):
    return {
        int(r["key"]): (r["ts_ms"], r["offset"]) for r in df.collect()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, splits=splits_strategy)
def test_random_interleavings_match_reference(spark, events, splits):
    # split the log into sequential micro-batches at the given points
    points = sorted({s for s in splits if s < len(events)})
    bounds = [0, *points, len(events)]
    batches = [
        events[a:b] for a, b in zip(bounds, bounds[1:]) if a < b
    ]
    target = None
    for i, batch in enumerate(batches):
        raw = raw_frame(spark, batch, offset_base=bounds[i])
        ch = latest_per_key(pg_changeset(raw, offset_col="offset"))
        target = apply_changeset(
            target, ch, keys=KEYS, keep_tombstones=True
        ).localCheckpoint(eager=True)
    visible = target.where("op != 'delete'")
    assert engine_state(visible) == reference_reducer(events)
    # idempotence: replaying the LAST batch onto the final state is a
    # no-op (at-least-once delivery safety)
    raw = raw_frame(spark, batches[-1], offset_base=bounds[len(batches) - 1])
    ch = latest_per_key(pg_changeset(raw, offset_col="offset"))
    replayed = apply_changeset(target, ch, keys=KEYS, keep_tombstones=True)
    assert engine_state(replayed.where("op != 'delete'")) == reference_reducer(
        events
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, split=st.integers(min_value=1, max_value=13))
def test_broadcast_strategy_matches_shuffle_on_random_logs(
    spark, events, split
):
    """Strategy parity as a PROPERTY: for any random changelog split
    into (base, changes) — arbitrary op interleavings, ts ties on
    distinct offsets, delete/resurrect chains — the broadcast merge
    plan must produce exactly the shuffle plan's state, tombstones
    included.  (Offsets are unique by construction, the documented
    precondition under which the two plans are result-identical.)"""
    if len(events) < 2:
        return  # need a non-empty changeset; cheap pre-Spark exit
    # clamp the cut INSIDE the log so every surviving example
    # exercises a real (base, changes) merge — no burned examples
    cut = min(split, len(events) - 1)
    base_ev, chg_ev = events[:cut], events[cut:]
    base_ch = latest_per_key(
        pg_changeset(raw_frame(spark, base_ev), offset_col="offset")
    )
    target = apply_changeset(
        None, base_ch, keys=KEYS, keep_tombstones=True
    ).localCheckpoint(eager=True)
    ch = latest_per_key(
        pg_changeset(
            raw_frame(spark, chg_ev, offset_base=cut), offset_col="offset"
        )
    )
    for keep in (True, False):
        shuffle = apply_changeset(
            target, ch, keys=KEYS, keep_tombstones=keep
        )
        bcast = apply_changeset(
            target, ch, keys=KEYS, keep_tombstones=keep, strategy="broadcast"
        )
        # full-row MULTISET equality over EVERY output column
        # (payload/ts_date included — a winner picked by the right
        # (ts, offset) identity but projecting the wrong payload must
        # fail): a dict keyed on the merge key would mask a
        # duplicate-emission regression at the merged/new-rows union
        cols = sorted(shuffle.columns)
        assert sorted(bcast.columns) == cols

        def rows(df):
            return sorted(
                tuple((c, r[c]) for c in cols) for r in df.collect()
            )

        assert rows(bcast) == rows(shuffle), f"keep_tombstones={keep}"
