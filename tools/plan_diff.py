"""Structural plan-regression gate: diff two PLANS.md revisions and
flag queries whose physical-plan SHAPE degraded — exchange count grew,
a broadcast join became a sort-merge join, a cartesian appeared, or
pushed/partition filters vanished.  The timing gate (bench.py ->
REGRESSIONS.md) catches slow; this catches WHY, and catches
regressions too small to time at sf0.1 but fatal at 100 TB (one extra
exchange is noise locally and a full reshuffle on a cluster).

Usage:
  python tools/plan_diff.py                  # HEAD:PLANS.md vs worktree
  python tools/plan_diff.py <rev>            # <rev>:PLANS.md vs worktree
  python tools/plan_diff.py <rev_a> <rev_b>  # two committed revisions
"""

from __future__ import annotations

import subprocess
import sys


def _parse(text: str) -> dict:
    rows = {}
    for line in text.splitlines():
        if not line.startswith("| ") or line.startswith("| query"):
            continue
        parts = [p.strip() for p in line.split("|")[1:-1]]
        if len(parts) < 8 or not parts[1].isdigit():
            continue
        name = parts[0]
        rows[name] = {
            "bhj": int(parts[1]),
            "smj": int(parts[2]),
            "bnlj": int(parts[3]),
            "cartesian": int(parts[4]),
            "exchanges": int(parts[5]),
            "pushed": parts[6] != "``",
            "pt": parts[7] != "``",
        }
    return rows


def _load(rev: str | None) -> dict:
    if rev is None:
        with open("PLANS.md") as f:
            return _parse(f.read())
    out = subprocess.run(
        ["git", "show", f"{rev}:PLANS.md"],
        capture_output=True,
        text=True,
        check=True,
    )
    return _parse(out.stdout)


def main() -> None:
    args = sys.argv[1:]
    if len(args) == 0:
        old, new, label = _load("HEAD"), _load(None), "HEAD -> worktree"
    elif len(args) == 1:
        old, new, label = _load(args[0]), _load(None), f"{args[0]} -> worktree"
    else:
        old, new, label = (
            _load(args[0]),
            _load(args[1]),
            f"{args[0]} -> {args[1]}",
        )
    shared = sorted(set(old) & set(new))
    flagged = []
    for q in shared:
        o, n = old[q], new[q]
        reasons = []
        if n["cartesian"] > o["cartesian"]:
            reasons.append(f"cartesian {o['cartesian']}->{n['cartesian']}")
        if n["exchanges"] > o["exchanges"]:
            reasons.append(f"exchanges {o['exchanges']}->{n['exchanges']}")
        if n["smj"] > o["smj"] and n["bhj"] < o["bhj"]:
            reasons.append(
                f"broadcast->sort-merge (BHJ {o['bhj']}->{n['bhj']}, "
                f"SMJ {o['smj']}->{n['smj']})"
            )
        if o["pushed"] and not n["pushed"]:
            reasons.append("pushed filters vanished")
        if o["pt"] and not n["pt"]:
            reasons.append("partition filters vanished")
        if reasons:
            flagged.append((q, reasons))
    print(f"plan diff {label}: {len(shared)} shared queries")
    if not flagged:
        print("no structural plan regressions")
        return
    for q, reasons in flagged:
        print(f"  {q}: {'; '.join(reasons)}")
    sys.exit(1)


if __name__ == "__main__":
    main()
