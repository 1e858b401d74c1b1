#!/usr/bin/env python3
"""Per-query DuckDB IDLE baselines — the committed artifact the weak-query
screen keys on (r15 verdict #2). The single-session bench pair's oracle
times swing between sessions (q59's oracle read 1.21 s in the r14 pair
and 0.25 s in the r15 one — 5x), so adjudicating ">2x the oracle" off
one pair flags session noise. This tool measures each oracle the way the
PROF adjudications do: several passes in ONE process, min reported.

Protocol:
  - pass 1 over every oracle (warm process, views created, one warmup
    count(*) first);
  - every query whose pass-1 time exceeds --floor (default 0.10 s, a
    margin under the 0.15 s real-work line) gets N-1 more passes;
  - idle = min over its passes (fast queries: the single pass — they are
    below the real-work line and never enter the weak screen).

Usage: python3 scripts/duckdb_idle.py <sf_dir> <oracle_sql.json>
           [out.json=duckdb_idle_sf0.1.json] [--passes 3] [--floor 0.10]

Output: {"queries": {name: idle_min_sec}, "passes": {name: [sec, ...]},
         "protocol": ..., "sf": dir, "n_failed": n}
Driver-side tool like check.py / bench_duckdb.py — never a library dep.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    # consume --flag VALUE pairs BEFORE splitting positionals, so a
    # flag's value can never leak into the positional list (a leaked
    # "--passes 5" would silently become the out_path)
    usage = ("usage: duckdb_idle.py <sf_dir> <oracle_sql.json> "
             "[out.json] [--passes N] [--floor S]")
    argv, flags = [], {"--passes": 3, "--floor": 0.10}
    it = iter(sys.argv[1:])
    for a in it:
        if a in flags:
            try:
                flags[a] = type(flags[a])(next(it))
            except (StopIteration, ValueError):
                sys.exit(f"{a} needs a {type(flags[a]).__name__} value; {usage}")
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a}; {usage}")
        else:
            argv.append(a)
    if len(argv) < 2:
        sys.exit(usage)
    sf_dir, oracle_path = argv[0], argv[1]
    out_path = argv[2] if len(argv) > 2 else "duckdb_idle_sf0.1.json"
    passes, floor = flags["--passes"], flags["--floor"]
    oracles = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    con.execute("SELECT count(*) FROM lineitem").fetchall()

    all_passes, failed = {}, []
    for name in sorted(oracles):
        try:
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            all_passes[name] = [time.time() - t0]
        except Exception as e:
            print(f"[duckdb-idle] {name} FAILED: {e}", file=sys.stderr)
            all_passes[name] = [-1.0]
            failed.append(name)
    slow = [n for n, p in all_passes.items() if p[0] > floor]
    print(f"[duckdb-idle] pass 1 done; {len(slow)} queries over "
          f"{floor:.2f} s get {passes - 1} more passes", file=sys.stderr)
    for _ in range(passes - 1):
        for name in sorted(slow):
            # a query can succeed on pass 1 and throw later (e.g. a
            # TABLESAMPLE edge or resource blip) — mark it failed
            # instead of crashing and losing the whole artifact
            if all_passes[name][0] < 0:
                continue
            try:
                t0 = time.time()
                con.execute(oracles[name]).fetchall()
                all_passes[name].append(time.time() - t0)
            except Exception as e:
                print(f"[duckdb-idle] {name} FAILED on later pass: {e}",
                      file=sys.stderr)
                all_passes[name] = [-1.0]
                failed.append(name)

    idle = {n: (min(p) if p[0] >= 0 else -1.0) for n, p in all_passes.items()}
    out = {"queries": idle, "passes": all_passes,
           "protocol": {"passes_for_slow": passes, "floor_sec": floor,
                        "idle": "min over passes, one process, threads=32"},
           "sf": sf_dir, "n_failed": len(failed)}
    with open(out_path, "w") as f:
        json.dump(out, f)
    total = sum(v for v in idle.values() if v >= 0)
    print(json.dumps({"metric": "idle_total", "value": total,
                      "n": len(idle), "n_slow": len(slow),
                      "n_failed": len(failed)}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
