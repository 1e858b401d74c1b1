#!/usr/bin/env python3
"""The round-close weak-query screen as committed code (r16 verdict #2).

Joins the latest bench pair (Spark side) against the committed per-query
DuckDB IDLE baseline and the PROF adjudication ledger, and prints every
flag with its bound arithmetic and its adjudication pointer. d12/t19
slipped through round 16 precisely because this join was a human step.

Rule (the judge's convention since r14): a query whose in-suite Spark
time exceeds 2x a REAL-WORK (> 0.2 s) per-query DuckDB idle oracle is
WEAK unless a committed PROF row adjudicates it under the written
exchange-floor criterion (spark_idle <= 2*duckdb_idle + floor(E)).
The adjudication ledger IS the PROF_r*.md table rows — this script
greps them, so there is no second artifact to go stale.

Usage: python3 scripts/weak_screen.py [spark_bench.json=bench_out.json]
           [idle.json=duckdb_idle_sf0.1.json] [--line 0.2] [--ratio 2.0]

Exit 1 when any flag lacks an adjudication row (round close is then
mechanical: run graft.Prof + FloorControl on the named queries and add
the rows to the round's PROF file).
Driver-side tool like check.py / bench_duckdb.py — never a library dep.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def adjudication_rows(name):
    """Every PROF_r*.md table row for this query — BOUND rows (the ones
    carrying an accepted/exits verdict cell) first, then any other
    measured row (an A/B or dissection table), newest file first within
    each class. The pointer should land on the row that ADJUDICATES,
    not merely mentions, the query."""
    bound, other = [], []
    for path in sorted(glob.glob(os.path.join(REPO, "PROF_r*.md")),
                       reverse=True):
        with open(path) as f:
            for i, line in enumerate(f, 1):
                if re.match(r"^\|\s*" + re.escape(name) + r"\b", line):
                    hit = (os.path.basename(path), i, line.strip())
                    if re.search(r"accepted|exits|structural fix|floor",
                                 line, re.I):
                        bound.append(hit)
                    else:
                        other.append(hit)
    return bound + other


def main():
    usage = ("usage: weak_screen.py [spark_bench.json] [idle.json] "
             "[--line S] [--ratio R]")
    argv, flags = [], {"--line": 0.2, "--ratio": 2.0}
    it = iter(sys.argv[1:])
    for a in it:
        if a in flags:
            try:
                flags[a] = float(next(it))
            except (StopIteration, ValueError):
                sys.exit(f"{a} needs a float value; {usage}")
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a}; {usage}")
        else:
            argv.append(a)
    bench_path = argv[0] if len(argv) > 0 else os.path.join(REPO, "bench_out.json")
    idle_path = argv[1] if len(argv) > 1 else os.path.join(REPO, "duckdb_idle_sf0.1.json")
    line, ratio = flags["--line"], flags["--ratio"]

    spark = json.load(open(bench_path))["queries"]
    idle_doc = json.load(open(idle_path))
    idle = idle_doc["queries"]

    missing_idle = sorted(set(spark) - set(idle))
    if missing_idle:
        print(f"[weak-screen] WARNING: {len(missing_idle)} bench queries have "
              f"no idle baseline (regenerate duckdb_idle over ALL keys): "
              f"{', '.join(missing_idle[:10])}")

    flags_out, unadjudicated = [], []
    for name in sorted(spark):
        du = idle.get(name, -1.0)
        sp = spark[name]
        if du <= line or sp <= ratio * du:
            continue  # under the real-work line, or inside 2x
        rows = adjudication_rows(name)
        status = (f"adjudicated: {rows[0][0]}:{rows[0][1]}" if rows
                  else "NEEDS ADJUDICATION (graft.Prof min-of-6 idle + "
                       "FloorControl plan-E bound -> PROF row)")
        flags_out.append((name, sp, du, status))
        if not rows:
            unadjudicated.append(name)

    print(f"[weak-screen] pair={os.path.basename(bench_path)} "
          f"idle={os.path.basename(idle_path)} line={line}s ratio={ratio}x "
          f"-> {len(flags_out)} flags, {len(unadjudicated)} unadjudicated")
    for name, sp, du, status in flags_out:
        print(f"  {name}: spark_pair={sp:.3f}s oracle_idle={du:.3f}s "
              f"({sp / du:.1f}x; reference bound 2*idle+floor(3)="
              f"{2 * du + 0.594:.3f}s at the r16 floor)  [{status}]")
    if unadjudicated:
        print(f"[weak-screen] FAIL: {len(unadjudicated)} flags lack a "
              f"committed PROF row: {', '.join(unadjudicated)}")
        sys.exit(1)
    print("[weak-screen] PASS: every flag is backed by a committed PROF row")


if __name__ == "__main__":
    main()
