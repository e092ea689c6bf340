#!/usr/bin/env bash
# Full local replica of the driver's per-round checks:
#   compile + tests + Verify@sf0.01 + DuckDB oracle compare + Bench@sf0.1
# Usage: tools/run_gate.sh [--no-bench]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt test =="
# run to a log and check the exit code explicitly — piping through grep
# would let a red suite slip past `set -o pipefail` via the `|| true`
sbt -batch test > /tmp/gate_test.log 2>&1 \
  || { tail -30 /tmp/gate_test.log; echo "sbt test FAILED"; exit 1; }
grep -E 'Tests:|\*\*\* FAILED' /tmp/gate_test.log || true

echo "== Verify @ sf0.01 =="
rm -rf /tmp/gate_out
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_out" \
  > /tmp/gate_verify.log 2>&1 || { tail -20 /tmp/gate_verify.log; exit 1; }
CE=$(grep -c CompileException /tmp/gate_verify.log || true)
echo "codegen CompileExceptions: $CE (must be 0)"
grep '\[verify\].*failed' /tmp/gate_verify.log || true

echo "== DuckDB oracle compare =="
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/gate_out

if [[ "${1:-}" != "--no-bench" ]]; then
  echo "== Bench @ sf0.1 =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
fi
