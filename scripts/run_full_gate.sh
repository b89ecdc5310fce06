#!/usr/bin/env bash
# The complete round gate, one command: unit/property/streaming suites,
# the sf0.01 Verify dump + DuckDB oracle replay, the plan-smell audit,
# and the leak sweep. Exits nonzero on the first failing stage. The
# mixed-corpus variant is its own command (scripts/run_mixed_gate.sh).
#
# Usage: scripts/run_full_gate.sh [sfDir] [verifyOutDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-target/verify_out}

echo "== 1/4 sbt test =="
sbt -batch test

echo "== 2/4 Verify + DuckDB oracle ($SF) =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/check_oracle.py "$SF" "$OUT"

echo "== 3/4 plan-smell audit =="
# `|| true` so a missing summary line (sbt dying mid-stage) still reaches
# the guard below and prints the FAIL diagnostic instead of aborting the
# pipeline silently under set -e (round-10 advice)
audit_out=$(sbt -batch "runMain graft.Explain --audit $SF" | tee /dev/stderr |
  grep -oP '(?<=, )\d+(?= UNEXPLAINED)' | tail -1 || true)
if [ "${audit_out:-1}" != "0" ]; then
  echo "FAIL: plan audit reported ${audit_out:-?} unexplained smells" >&2
  exit 1
fi

echo "== 4/4 leak sweep =="
python3 scripts/leakcheck.py

echo "FULL GATE GREEN"
