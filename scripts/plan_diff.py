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

# AQE's opportunistic stage reuse races on IDENTICAL subtrees: when two
# equal shuffle stages materialize concurrently, the loser is sometimes
# reused and sometimes duplicated, so the exchange count flaps by 1 run
# to run (measured: ds38 3/4/4 and ds87 3/4/3 over three same-code
# dumps; only exchange.shuffle.* moves, never joins/aggs/scans). These
# rows WARN instead of failing the gate; any other delta still fails.
KNOWN_FLAKY = {
    "ds38_intersect_count": "AQE stage-reuse race on INTERSECT's two identical fact scans",
    "ds87_except_chain": "AQE stage-reuse race on EXCEPT's two identical fact scans",
}


def main():
    if len(sys.argv) != 3:
        sys.exit("usage: plan_diff.py <old.json> <new.json>")
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    changed, flaky = [], []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if a == b:
            continue
        deltas = []
        only_exchanges = True
        for k in sorted(set(a) | set(b)):
            va, vb = a.get(k, 0), b.get(k, 0)
            if va != vb:
                deltas.append(f"{k}: {va}->{vb}")
                if not k.startswith("exchange.shuffle."):
                    only_exchanges = False
        if name in KNOWN_FLAKY and only_exchanges:
            flaky.append((name, deltas))
        else:
            changed.append((name, deltas))

    if added:
        print(f"[plan-diff] {len(added)} new queries: {', '.join(added)}")
    if removed:
        print(f"[plan-diff] {len(removed)} removed queries: {', '.join(removed)}")
    for name, deltas in flaky:
        print(f"[plan-diff] {name} (known-flaky, warn only — "
              f"{KNOWN_FLAKY[name]}): " + "; ".join(deltas))
    for name, deltas in changed:
        print(f"[plan-diff] {name}: " + "; ".join(deltas))
    print(f"[plan-diff] {len(changed)} changed, {len(flaky)} known-flaky, "
          f"{len(added)} added, {len(removed)} removed over "
          f"{len(set(old) & set(new))} common")
    sys.exit(1 if changed else 0)


if __name__ == "__main__":
    main()
