#!/usr/bin/env bash
# Full validation sweep: ScalaTest, then the Verify main + DuckDB
# oracle compare at every SF, then the Bench main. One command, green
# or dead. Usage: tools/sweep.sh [--skip-tests]
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" != "--skip-tests" ]]; then
  sbt -batch test
fi

for sf in 0.001 0.01 0.1; do
  dir="/root/testdata/sf$sf"
  [[ -d "$dir" ]] || continue
  out="/tmp/verify_sweep_$sf"
  echo "=== verify @ sf$sf ==="
  sbt -batch "runMain graft.Verify $dir $out"
  python3 tools/check.py "$dir" "$out"
done

echo "=== bench @ sf0.1 ==="
SPARK_GRAFT_BENCH_OUT=/tmp/bench_sweep.json sbt -batch "runMain graft.Bench"
python3 - <<'EOF'
import json
j = json.load(open('/tmp/bench_sweep.json'))
print(f"bench total {j['value']:.1f}s over {len(j['queries'])} queries")
EOF
echo "SWEEP GREEN"
