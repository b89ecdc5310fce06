#!/usr/bin/env bash
# Mixed-corpus correctness gate (round-8 verdict task 7): regenerate the
# non-ASCII fixture variant (CJK / accented-Latin / Greek / Cyrillic /
# emoji planted documents, every other table byte-copied), run the FULL
# Verify dump over it, and replay every oracle SQL in DuckDB over the same
# variant. Exits nonzero if the regenerated corpus has the wrong document
# count or any query mismatches its oracle — one command reproduces the
# round gate on the corpus that exercises multi-byte UTF-8 hashing.
#
# Usage: scripts/run_mixed_gate.sh [sfInDir] [mixedOutDir] [verifyOutDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_IN=${1:-/root/testdata/sf0.01}
MIXED=${2:-target/mixed0.01}
VERIFY_OUT=${3:-target/verify_mixed}
PLANTED=12

gen_log=$(mktemp)
sbt -batch "runMain graft.MixedCorpusGen $SF_IN $MIXED" | tee "$gen_log"

base_docs=$(python3 - "$SF_IN" <<'EOF'
import sys, duckdb
print(duckdb.sql(f"SELECT count(*) FROM '{sys.argv[1]}/documents.parquet'").fetchone()[0])
EOF
)
want=$((base_docs + PLANTED))
got=$(grep -oP '\[mixed-corpus\] \K[0-9]+(?= documents)' "$gen_log")
non_ascii=$(grep -oP '(?<=documents, )[0-9]+(?= non-ASCII)' "$gen_log")
if [ "$got" != "$want" ] || [ "$non_ascii" -lt "$PLANTED" ]; then
  echo "FAIL: mixed corpus has $got docs ($non_ascii non-ASCII), expected $want with >= $PLANTED non-ASCII" >&2
  exit 1
fi
echo "mixed corpus OK: $got documents ($non_ascii non-ASCII)"

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $MIXED $VERIFY_OUT"
python3 scripts/check_oracle.py "$MIXED" "$VERIFY_OUT"

# The no_oracle ML queries: their inputs are byte-copied into the mixed
# fixture, so under the same Verify config the mixed dump must equal the
# base dump cell-for-cell (scripts/check_mixed_ml.py). Requires a base
# Verify dump — the full gate produces one at target/verify_out.
BASE_OUT=${4:-target/verify_out}
if [ -d "$BASE_OUT/q29_ml_rf_confusion" ]; then
  python3 scripts/check_mixed_ml.py "$BASE_OUT" "$VERIFY_OUT"
else
  echo "FAIL: no base Verify dump at $BASE_OUT — run the full gate first" >&2
  exit 1
fi
