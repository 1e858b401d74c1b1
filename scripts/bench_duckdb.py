#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given SF — the same-scale single-node
reference the Spark bench is compared against (driver-side tool, like
check.py; not part of the library).

Usage: python3 scripts/bench_duckdb.py <sf_dir> <oracle_sql.json> [out.json]

Writes one JSON object {"queries": {name: sec}, "total": sec, "sf": dir,
"n_failed": n} mirroring bench_out.json so per-query ratios line up.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "duckdb_bench_out.json"
    oracles = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    results, failed = {}, []
    # one warmup query so buffer-cache/file-open costs don't land on the
    # first measured entry (same policy as the Spark bench)
    try:
        con.execute("SELECT count(*) FROM lineitem").fetchall()
    except Exception as e:
        print(f"[duckdb-bench] warmup failed: {e}", file=sys.stderr)
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            results[name] = time.time() - t0
        except Exception as e:
            print(f"[duckdb-bench] {name} FAILED: {e}", file=sys.stderr)
            results[name] = -1.0
            failed.append(name)
    total = sum(v for v in results.values() if v >= 0)
    line = {"metric": "total", "value": total, "unit": "sec",
            "queries": results, "sf": sf_dir, "n_failed": len(failed)}
    with open(out_path, "w") as f:
        json.dump(line, f)
    print(json.dumps(line))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
