#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's t2 gate:
run Verify's parquet dumps against DuckDB executing oracle_sql.json
over the same base tables; compare column-name-sorted, canonicalized,
row-sorted values.

INVARIANT: float comparison is shortest-repr bit-exact (str(v), not a
%.12g round-trip), mirroring the driver's hash. Every query that emits
a DOUBLE column must therefore round() it explicitly (in BOTH the Spark
code and the oracle SQL) — an un-rounded double will fail on last-ulp
cross-engine drift even when semantically correct.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
"""
import duckdb, json, sys, glob, os

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # str(), not %.12g: the driver's hash distinguishes 254 from 254.0
        # (DuckDB HUGEINT sums surface as float64 via pandas), so an
        # int-vs-float column-type skew must FAIL here too.
        return str(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    produced = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    for name in sorted(produced | set(oracle)):
        if only and name not in only:
            continue
        if name not in produced:
            print(f"FAIL {name}: spark output missing"); n_fail += 1; continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(sp_rows)} rows (no oracle)")
            continue
        try:
            du = con.execute(oracle[name])
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sc, s = frame(sp_rows, sp_cols)
        dc, d = frame(du_rows, du_cols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}"); n_fail += 1; continue
        if s == d:
            print(f"PASS {name}: {len(s)} rows"); n_pass += 1; continue
        n_fail += 1
        print(f"FAIL {name}: spark {len(s)} rows vs duckdb {len(d)} rows; cols={sc}")
        ss, ds = set(s), set(d)
        for r in list(s)[:3] if not (ss - ds) else list(ss - ds)[:3]:
            print(f"  spark : {r}")
        for r in list(d)[:3] if not (ds - ss) else list(ds - ss)[:3]:
            print(f"  duckdb: {r}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
