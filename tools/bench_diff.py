"""Round-over-round bench comparison, floor-aware.

Usage:  python tools/bench_diff.py OLD_DETAIL.json NEW_DETAIL.json [k]

Subtracts each run's own calibrated job floor (``floor_sec``, written
by bench.py since r8; older files default to 0) from every per-query
Spark time, then reports the k largest above-floor regressions and
improvements plus the suite aggregates.  This is the comparison the
raw numbers can't support: the per-session floor moved 0.002 → 0.293 s
between the r6 and r7 driver sessions with zero code change, which
made 76 raw per-query ratios unreadable (BENCHNOTES_r07).
"""

from __future__ import annotations

import json
import sys


def load(path: str):
    with open(path) as f:
        d = json.load(f)
    floor = float(d.get("floor_sec", 0.0))
    q = {
        n: max(t - floor, 0.0)
        for n, t in d.get("queries", {}).items()
        if "#" not in n
    }
    return d, floor, q


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_d, old_f, old_q = load(sys.argv[1])
    new_d, new_f, new_q = load(sys.argv[2])
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    shared = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    deltas = sorted(
        ((new_q[n] - old_q[n], n) for n in shared), reverse=True
    )

    print(
        f"floors: old={old_f:.4f}s new={new_f:.4f}s | "
        f"shared={len(shared)} added={len(added)} removed={len(removed)}"
    )
    o_tot = sum(old_q[n] for n in shared)
    n_tot = sum(new_q[n] for n in shared)
    print(
        f"shared-set above-floor total: {o_tot:.1f}s -> {n_tot:.1f}s "
        f"({(n_tot - o_tot):+.1f}s)"
    )
    print(f"\ntop {k} regressions (above-floor seconds):")
    for dlt, n in deltas[:k]:
        if dlt <= 0:
            break
        print(f"  {dlt:+7.3f}  {old_q[n]:7.3f} -> {new_q[n]:7.3f}  {n}")
    print(f"\ntop {k} improvements:")
    for dlt, n in reversed(deltas[-k:]):
        if dlt >= 0:
            break
        print(f"  {dlt:+7.3f}  {old_q[n]:7.3f} -> {new_q[n]:7.3f}  {n}")
    if added:
        print(f"\nnew queries: {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")


if __name__ == "__main__":
    main()
