#!/usr/bin/env bash
# Belt-and-braces wrapper for the driver bench contract (r18 verdict #1):
# run the bench exactly as the driver does, then re-print the short
# summary JSON from bench_out.json as the genuinely last stdout line.
# With build.sbt's StdoutOutput + showSuccess:=false the bare sbt
# invocation already ends with that line; this wrapper guarantees it
# even if sbt settings drift.
#
# Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... scripts/bench.sh
set -o pipefail
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Bench"
rc=$?
python3 - <<'EOF'
import json
d = json.load(open("bench_out.json"))
print(json.dumps({
    "metric": "total", "value": d["value"], "unit": "sec",
    "sf": d["sf"], "cpus": d["env"]["cpus"],
    "n_queries": len(d["queries"]), "n_failed": d["n_failed"],
    "timing": d["timing"], "queries_file": "bench_out.json",
}, separators=(",", ":")))
EOF
exit $rc
