"""Per-query bench diff between two BENCH_FULL_r{N}.json artifacts
(VERDICT r12 #7) — one command instead of the per-verdict noise-triage
ritual.

    python tools/bench_diff.py r12 r13
    python tools/bench_diff.py 12 13        # same thing

Prints the headline delta, every per-query time side by side with its
ratio, the flattened numeric maintainer axes, and the comparison of
the NEW run against SCALE.md's isolated steady-state pins.  Moves
beyond the flag threshold (default 2x, either direction — the
documented host-noise band) are marked ``**``; per SCALE.md round 11,
a flagged IN-SUITE number is a candidate for an isolated min-of-3
re-probe, not yet a regression.

Exit code is always 0: the tool reports, humans (and close notes)
judge.
"""

from __future__ import annotations

import json
import os
import sys

#: isolated steady-state pins from SCALE.md (round-11 table, recorded
#: once under bench.py's min-of-3 warmup discipline).  In-suite
#: readings within ~2x of these are host noise; only a min-of-3
#: drifting well past them is signal.
SCALE_PINS = {
    # re-pinned round 14 (VERDICT r13 #3): isolated min-of-5 x2 fresh
    # sessions under the NEW pair-aggregate bench shape — mins 6.1 /
    # 9.7, swings up to 50 s under host contention (SCALE.md r14).
    # The 2x band is read against this pin.
    "dedup_simjoin": 8.0,
    "graph_tree_roots": 1.83,
    "layout_pruned_scan": 1.02,
    # re-pinned round 14: isolated min-of-3 = 1.08 on the current
    # host (history: 0.41 r11, 0.67 r12, 0.76 r13 — no temporal.py
    # change in any of those rounds; events row count fixed at 100k
    # by seed, so the drift is host throughput, not code or data)
    "events_twap": 1.08,
}

FLAG_X = 2.0


def _load(tag: str) -> tuple[str, dict]:
    n = tag.lstrip("r")
    path = f"BENCH_FULL_r{int(n)}.json"
    if not os.path.exists(path):
        sys.exit(f"bench_diff: {path} not found")
    with open(path) as f:
        return path, json.load(f)


def _flatten(prefix: str, obj, out: dict) -> dict:
    if isinstance(obj, dict):
        for k, v in sorted(obj.items()):
            _flatten(f"{prefix}.{k}" if prefix else k, v, out)
    elif isinstance(obj, list):
        # list axes must not vanish silently — index them in
        for i, v in enumerate(obj):
            _flatten(f"{prefix}[{i}]", v, out)
    elif isinstance(obj, (int, float)) and not isinstance(obj, bool):
        out[prefix] = float(obj)
    return out


def _ratio(old: float, new: float) -> float | None:
    if old == 0:
        return None
    return new / old


def _fmt(v: float | None) -> str:
    return "-" if v is None else f"{v:9.3f}"


def _row(name: str, old, new, width: int) -> tuple[str, bool]:
    r = _ratio(old, new) if old is not None and new is not None else None
    flagged = r is not None and (r > FLAG_X or r < 1.0 / FLAG_X)
    mark = " **" if flagged else ""
    rs = "-" if r is None else f"{r:6.2f}x"
    return (
        f"  {name:<{width}} {_fmt(old)} {_fmt(new)} {rs}{mark}",
        flagged,
    )


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit("usage: python tools/bench_diff.py rN rM")
    pa, a = _load(sys.argv[1])
    pb, b = _load(sys.argv[2])
    flags = 0

    print(f"bench diff: {pa} (old) -> {pb} (new)")
    print(
        f"  headline: {a.get('value')} -> {b.get('value')} "
        f"{a.get('unit', '')} (sf {a.get('sf')} -> {b.get('sf')})"
    )

    qa, qb = a.get("queries", {}), b.get("queries", {})
    names = sorted(set(qa) | set(qb))
    width = max((len(n) for n in names), default=10) + 1
    print(f"\nper-query seconds ({len(names)} entries; ** = >{FLAG_X}x move)")
    print(f"  {'query':<{width}} {'old':>9} {'new':>9}  ratio")
    for n in names:
        line, f = _row(n, qa.get(n), qb.get(n), width)
        print(line)
        flags += f

    ea = _flatten("", a.get("extra", {}), {})
    eb = _flatten("", b.get("extra", {}), {})
    anames = sorted(set(ea) | set(eb))
    if anames:
        width = max(len(n) for n in anames) + 1
        print("\nextra axes")
        print(f"  {'axis':<{width}} {'old':>9} {'new':>9}  ratio")
        for n in anames:
            line, f = _row(n, ea.get(n), eb.get(n), width)
            print(line)
            flags += f

    print("\nnew run vs SCALE.md isolated steady-state pins")
    width = max(len(n) for n in SCALE_PINS) + 1
    print(f"  {'query':<{width}} {'pin':>9} {'new':>9}  ratio")
    for n, pin in sorted(SCALE_PINS.items()):
        line, f = _row(n, pin, qb.get(n), width)
        print(line)
        flags += f

    print(
        f"\n{flags} entr{'y' if flags == 1 else 'ies'} beyond the "
        f"{FLAG_X}x band"
        + (
            " — candidates for an isolated min-of-3 re-probe "
            "(SCALE.md round-11 discipline)"
            if flags
            else ""
        )
    )


if __name__ == "__main__":
    main()
