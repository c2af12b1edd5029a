#!/usr/bin/env bash
# Full verification gauntlet — every check the driver/judge runs, locally.
# Usage: tools/ci.sh [sf_dir]    (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}

echo "== 1/5 pytest (full suite) =="
python -m pytest tests/ -x -q

echo "== 2/5 driver-gate replica (tuned session) =="
python tools/check_contract.py "$SF"

echo "== 3/5 driver-gate replica (vanilla default-config session) =="
CONTRACT_VANILLA=1 python tools/check_contract.py "$SF"

echo "== 4/5 bench JSON contract (scaling skipped) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=4 BENCH_SCALING=0 \
    python bench.py | python -c "import json,sys; json.loads(sys.stdin.read()); print('bench JSON ok')"

echo "== 5/5 spark-submit launch + checkpoint-resume probe =="
OUT=$(mktemp -d /tmp/ir_ci_idx.XXXX)
tools/spark_submit.sh --docs 2000 --units 4 --out "$OUT" | tail -1
tools/spark_submit.sh --docs 2000 --units 4 --out "$OUT" | tail -1 \
    | grep -q '"units_built_this_run": 0' && echo "resume no-op ok"
rm -rf "$OUT"

echo "ALL GREEN"
