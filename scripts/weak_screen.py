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
           [--abs 3.0]

Two flagging criteria (r18: the second closes the screen's
absolute-time blind spot — i07_ivm_join tripled against a sub-0.2 s
oracle in r17 and the real-work line excluded it BY CONSTRUCTION):
  1. real-work ratio: oracle idle > --line AND spark > --ratio x idle;
  2. absolute tripwire: spark pair time > --abs seconds AND above
     --ratio x the oracle idle — i.e. the real-work oracle line is
     waived, but not the ratio: a fixed-floor/streaming row that
     drifts into the suite's slowest tier must carry an adjudication
     row like any other flag, while a genuinely big query that BEATS
     its equally-big oracle is not weak at any absolute time.

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


def session_floor3():
    """floor(3) from the NEWEST PROF ledger's FloorControl table (the
    printed reference bound must track the floor the adjudications
    actually keyed on — the hard-coded r16 value silently staled,
    r17 verdict wrong #3). Returns (value, source_label)."""
    for path in sorted(glob.glob(os.path.join(REPO, "PROF_r*.md")),
                       reverse=True):
        with open(path) as f:
            text = f.read()
        m = re.search(r"^## Floors\b.*?$(.*?)(?:^## |\Z)", text,
                      re.M | re.S)
        if not m:
            continue
        row = re.search(r"^\|\s*3\s*\|\s*([0-9.]+)", m.group(1), re.M)
        if row:
            return float(row.group(1)), os.path.basename(path)
    return 0.594, "hard-coded r16 fallback (no Floors table found)"


def main():
    usage = ("usage: weak_screen.py [spark_bench.json] [idle.json] "
             "[--line S] [--ratio R] [--abs A]")
    argv, flags = [], {"--line": 0.2, "--ratio": 2.0, "--abs": 3.0}
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
    line, ratio, abs_trip = flags["--line"], flags["--ratio"], flags["--abs"]
    floor3, floor_src = session_floor3()

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
        ratio_hit = du > line and sp > ratio * du
        abs_hit = sp > abs_trip and sp > ratio * du
        if not (ratio_hit or abs_hit):
            continue
        rows = adjudication_rows(name)
        status = (f"adjudicated: {rows[0][0]}:{rows[0][1]}" if rows
                  else "NEEDS ADJUDICATION (graft.Prof min-of-6 idle + "
                       "FloorControl plan-E bound -> PROF row)")
        why = "+".join(w for w, hit in
                       [("ratio", ratio_hit), ("abs", abs_hit)] if hit)
        flags_out.append((name, sp, du, why, status))
        if not rows:
            unadjudicated.append(name)

    print(f"[weak-screen] pair={os.path.basename(bench_path)} "
          f"idle={os.path.basename(idle_path)} line={line}s ratio={ratio}x "
          f"abs={abs_trip}s floor3={floor3}s ({floor_src}) "
          f"-> {len(flags_out)} flags, {len(unadjudicated)} unadjudicated")
    for name, sp, du, why, status in flags_out:
        print(f"  {name}: spark_pair={sp:.3f}s oracle_idle={du:.3f}s "
              f"({sp / du:.1f}x, {why}; reference bound 2*idle+floor(3)="
              f"{2 * du + floor3:.3f}s)  [{status}]")
    if unadjudicated:
        print(f"[weak-screen] FAIL: {len(unadjudicated)} flags lack a "
              f"committed PROF row: {', '.join(unadjudicated)}")
        sys.exit(1)
    print("[weak-screen] PASS: every flag is backed by a committed PROF row")


if __name__ == "__main__":
    main()
