#!/usr/bin/env python3
"""Quiet-run perf-regression gate (VERDICT r7 #6).

Compares a current bench JSON (graft.Bench's full output, e.g.
target/bench_last.json) against a previous round's committed copy and
fails on per-query regressions beyond a factor — so a real slowdown is
self-serve distinguishable from machine-contention noise WITHOUT a
judge rerun. Both inputs should be min-of-N quiet numbers (Bench
records the per-query min across SPARK_GRAFT_PASSES).

BASELINE must be ONE fresh Bench run at a single commit — never a
per-query min folded across runs or commits (a merged baseline hides
regressions by construction; VERDICT r11 #1). Noise absorption is THIS
gate's job, via the factor and floor.

Usage:
  python3 tools/perfgate.py CURRENT.json BASELINE.json [factor] [min_abs]
  python3 tools/perfgate.py --self-test

A query is flagged iff  cur > factor * base  AND  cur - base > min_abs
(the absolute floor keeps 0.1 s -> 0.25 s jitter on cheap queries from
tripping a 2x factor). New queries (absent from baseline) and removed
ones are reported informationally, never flagged. Exit 1 iff any query
is flagged.

BASELINE DISCIPLINE (VERDICT r11 #1): a committed bench snapshot must
be ONE fresh graft.Bench run (min-of-N passes within that single
invocation) at a stated HEAD. Never fold per-query minima across
separate runs or commits into a committed artifact — in a min-merged
baseline a per-query regression is invisible by construction. Noise
absorption is THIS gate's job (factor + floor), not the artifact's.
"""
import json
import sys

DEFAULT_FACTOR = 2.0
DEFAULT_MIN_ABS = 0.5  # seconds


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(
            f"{path}: no 'queries' map — pass graft.Bench's FULL output "
            "(target/bench_last.json), not the driver's truncated wrapper")
    return {k: float(v) for k, v in q.items()}


def gate(cur, base, factor=DEFAULT_FACTOR, min_abs=DEFAULT_MIN_ABS):
    """Returns (flagged, new, removed): flagged is a list of
    (name, base_sec, cur_sec, ratio)."""
    flagged = []
    for name in sorted(set(cur) & set(base)):
        b, c = base[name], cur[name]
        if c > factor * b and c - b > min_abs:
            flagged.append((name, b, c, c / b if b > 0 else float("inf")))
    new = sorted(set(cur) - set(base))
    removed = sorted(set(base) - set(cur))
    return flagged, new, removed


def self_test():
    base = {"q_fast": 0.2, "q_mid": 1.0, "q_slow": 5.0}
    # q_mid artificially slowed 3x: MUST be flagged
    cur = {"q_fast": 0.45, "q_mid": 3.0, "q_slow": 5.5, "q_new": 1.0}
    flagged, new, removed = gate(cur, base)
    assert [f[0] for f in flagged] == ["q_mid"], flagged
    # cheap-query jitter (0.2 -> 0.45 is >2x but under the abs floor)
    # and sub-factor drift (5.0 -> 5.5) must NOT flag
    assert new == ["q_new"] and removed == [], (new, removed)
    # floor disabled -> the cheap query trips too
    flagged2, _, _ = gate(cur, base, min_abs=0.0)
    assert [f[0] for f in flagged2] == ["q_fast", "q_mid"], flagged2
    print("perfgate self-test OK")


def main(argv):
    if len(argv) >= 2 and argv[1] == "--self-test":
        self_test()
        return 0
    if len(argv) < 3:
        print(__doc__)
        return 2
    factor = float(argv[3]) if len(argv) > 3 else DEFAULT_FACTOR
    min_abs = float(argv[4]) if len(argv) > 4 else DEFAULT_MIN_ABS
    cur, base = load_queries(argv[1]), load_queries(argv[2])
    flagged, new, removed = gate(cur, base, factor, min_abs)
    for name, b, c, r in flagged:
        print(f"REGRESSION {name}: {b:.2f}s -> {c:.2f}s ({r:.1f}x)")
    if new:
        print(f"new queries (not gated): {', '.join(new)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")
    both = set(cur) & set(base)
    print(f"== {len(flagged)} regression(s) over {len(both)} shared "
          f"queries (factor {factor}, floor {min_abs}s) ==")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
