#!/usr/bin/env python3
"""Diff two PlanDump fingerprint files (graft.PlanDump output) — the
plan-regression detector's reporting half. A silent optimizer/AQE flip
(a join strategy change, a new shuffle, a lost pushed filter, a
broadcast appearing on a fact-derived side) shows up as a one-line diff
here instead of a bench anomaly hunted by hand.

Usage: python3 scripts/plan_diff.py <old.json> <new.json>

Prints one line per query whose fingerprint changed; exit 1 when any
query changed (so round close can gate on it), 0 on identical plans.
New/removed queries are listed but do not fail the gate — adding
queries is normal; changing an existing query's plan needs a look.
"""
import json
import sys


def main():
    if len(sys.argv) != 3:
        sys.exit("usage: plan_diff.py <old.json> <new.json>")
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    changed = []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if a == b:
            continue
        deltas = []
        for k in sorted(set(a) | set(b)):
            va, vb = a.get(k, 0), b.get(k, 0)
            if va != vb:
                deltas.append(f"{k}: {va}->{vb}")
        changed.append((name, deltas))

    if added:
        print(f"[plan-diff] {len(added)} new queries: {', '.join(added)}")
    if removed:
        print(f"[plan-diff] {len(removed)} removed queries: {', '.join(removed)}")
    for name, deltas in changed:
        print(f"[plan-diff] {name}: " + "; ".join(deltas))
    print(f"[plan-diff] {len(changed)} changed, {len(added)} added, "
          f"{len(removed)} removed over {len(set(old) & set(new))} common")
    sys.exit(1 if changed else 0)


if __name__ == "__main__":
    main()
