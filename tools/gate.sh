#!/usr/bin/env bash
# One-command round gate: Verify -> DuckDB compare -> type audit -> Bench
# -> sbt test, ending in ONE JSON line on stdout that the round-close doc
# copies verbatim (kills the remembered-numbers class of prose drift:
# r4 stale gates, r5 "299 tests" vs the actual 280).
#
# Usage: tools/gate.sh [sf_verify_dir] [sf_bench_dir] [out_json]
#        tools/gate.sh --quick [q_a,q_b,...]
#
# --quick is the PRE-COMMIT guard (seconds-to-minutes, not the full ~30 min
# gate): sbt compile, then — if a comma-list of queries is given — a targeted
# Verify at sf0.01 + DuckDB compare + oracle type audit on just those
# queries. Every run (quick or full) appends one JSON line to the committed
# round log (GATE_LOG env, default ROUND_GATES.jsonl) with the git HEAD and
# per-step rcs, so the round-close doc can prove no commit landed between a
# red gate and its fix (the round-7 uncompiled-commit failure class).
set -uo pipefail
cd "$(dirname "$0")/.."

# default points at the CURRENT round's committed log, derived from the
# committed ROUND marker file (no per-round in-script constant to forget
# to bump — a forgotten bump would silently append this round's gates to
# last round's log and break the per-round audit trail)
ROUND_N=$(tr -dc '0-9' < ROUND 2>/dev/null)
GATE_LOG="${GATE_LOG:-ROUND${ROUND_N:?missing ROUND marker file}_GATES.jsonl}"

log_gate() { # $1 = json line
  echo "$1" >> "$GATE_LOG"
}

if [ "${1:-}" = "--quick" ]; then
  QUERIES="${2:-}"
  HEAD_SHA=$(git rev-parse --short HEAD 2>/dev/null || echo none)
  DIRTY=$([ -n "$(git status --porcelain 2>/dev/null)" ] && echo true || echo false)
  TS=$(date -u +%Y-%m-%dT%H:%M:%SZ)
  step() { echo "[quick-gate] $*" >&2; }

  step "compile"
  sbt -batch compile > /tmp/quickgate_compile.log 2>&1
  COMPILE_RC=$?
  VERIFY_RC=-1; CMP_OK=-1; CMP_FAIL=-1; TYPES_FLAGGED=-1
  if [ $COMPILE_RC -eq 0 ] && [ -n "$QUERIES" ]; then
    step "targeted verify: $QUERIES"
    rm -rf /tmp/quickgate_out
    SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
      tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/quickgate_out \
      > /tmp/quickgate_verify.log 2>&1
    VERIFY_RC=$?
    FAILED_JSON=$(cat /tmp/quickgate_out/failed.json 2>/dev/null || echo '{"unreadable":true}')
    [ "$FAILED_JSON" != "{}" ] && VERIFY_RC=1
    CMP=$(python3 tools/compare.py --only "$QUERIES" /root/testdata/sf0.01 /tmp/quickgate_out 2>&1 | tail -1)
    CMP_OK=$(echo "$CMP" | sed -n 's/^\([0-9]*\) ok.*/\1/p'); CMP_OK=${CMP_OK:--1}
    CMP_FAIL=$(echo "$CMP" | sed -n 's/.* \([0-9]*\) failed.*/\1/p'); CMP_FAIL=${CMP_FAIL:--1}
    TYPES=$(python3 tools/compare.py --types --only "$QUERIES" /root/testdata/sf0.01 /tmp/quickgate_out 2>&1 | tail -1)
    TYPES_FLAGGED=$(echo "$TYPES" | sed -n 's/^\([0-9]*\) oracles flagged.*/\1/p'); TYPES_FLAGGED=${TYPES_FLAGGED:--1}
  fi
  PASS=false
  if [ $COMPILE_RC -eq 0 ] && { [ -z "$QUERIES" ] || { [ $VERIFY_RC -eq 0 ] && [ "$CMP_FAIL" = 0 ] && [ "$TYPES_FLAGGED" = 0 ]; }; }; then
    PASS=true
  fi
  LINE="{\"mode\":\"quick\",\"ts\":\"$TS\",\"head\":\"$HEAD_SHA\",\"dirty\":$DIRTY,\"queries\":\"$QUERIES\",\"compile_rc\":$COMPILE_RC,\"verify_rc\":$VERIFY_RC,\"oracle_ok\":$CMP_OK,\"oracle_failed\":$CMP_FAIL,\"types_flagged\":$TYPES_FLAGGED,\"pass\":$PASS}"
  log_gate "$LINE"
  echo "$LINE"
  [ "$PASS" = true ] && exit 0 || exit 1
fi

SF_VERIFY="${1:-/root/testdata/sf0.01}"
SF_BENCH="${2:-/root/testdata/sf0.1}"
OUT="${3:-/tmp/gate_result.json}"
VOUT=/tmp/gate_verify_out
BENCH_OUT=/tmp/gate_bench.json
CPUS="${SPARK_GRAFT_CPUS:-8}"

step() { echo "[gate] $*" >&2; }

step "1/5 Verify @ $SF_VERIFY"
rm -rf "$VOUT"
SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Verify $SF_VERIFY $VOUT" \
  > /tmp/gate_verify.log 2>&1
VERIFY_RC=$?
FAILED_JSON=$(cat "$VOUT/failed.json" 2>/dev/null || echo '{"unreadable":true}')

step "2/5 DuckDB compare"
CMP=$(python3 tools/compare.py "$SF_VERIFY" "$VOUT" 2>&1 | tail -1)
# e.g. "213 ok, 0 failed"
CMP_OK=$(echo "$CMP" | sed -n 's/^\([0-9]*\) ok.*/\1/p')
CMP_FAIL=$(echo "$CMP" | sed -n 's/.* \([0-9]*\) failed.*/\1/p')

step "3/5 oracle type audit"
TYPES=$(python3 tools/compare.py --types "$SF_VERIFY" "$VOUT" 2>&1 | tail -1)
TYPES_FLAGGED=$(echo "$TYPES" | sed -n 's/^\([0-9]*\) oracles flagged.*/\1/p')

step "4/5 Bench @ $SF_BENCH (reps from SPARK_GRAFT_BENCH_REPS or 3)"
SPARK_GRAFT_SF_DIR=$SF_BENCH SPARK_GRAFT_CPUS=$CPUS \
  SPARK_GRAFT_BENCH_OUT=$BENCH_OUT sbt -batch "runMain graft.Bench" \
  > /tmp/gate_bench.log 2>&1
BENCH_RC=$?
BENCH_LINE=$(cat "$BENCH_OUT" 2>/dev/null || echo '{}')
# like-for-like round-over-round diff vs the latest same-config round
# artifact (BENCH_r0N_local_w$CPUS.json) — lands in the gate JSON so the
# median/worst ratios are artifact-derived, never remembered prose
PREV_BENCH="${GATE_PREV_BENCH:-$(ls BENCH_r*_local_w${CPUS}.json 2>/dev/null | sort | tail -1)}"
if [ -n "$PREV_BENCH" ] && [ -f "$PREV_BENCH" ]; then
  BENCH_DIFF=$(python3 tools/bench_diff.py --json "$PREV_BENCH" "$BENCH_OUT" 2>/dev/null || echo '{}')
else
  BENCH_DIFF='{}'
fi

step "5/5 sbt test"
sbt -batch test > /tmp/gate_test.log 2>&1
TEST_RC=$?
TEST_LINE=$(grep -E "Tests: succeeded" /tmp/gate_test.log | tail -1 | sed 's/\[info\] //')
T_OK=$(echo "$TEST_LINE" | sed -n 's/.*succeeded \([0-9]*\).*/\1/p')
T_FAIL=$(echo "$TEST_LINE" | sed -n 's/.*failed \([0-9]*\).*/\1/p')
T_CANCEL=$(echo "$TEST_LINE" | sed -n 's/.*canceled \([0-9]*\).*/\1/p')

# the full gate asserts the pre-commit guard is actually installed (the
# quick gate must be emitted by the hook, not by per-wave discipline)
HOOK=.git/hooks/pre-commit
if [ -x "$HOOK" ] && grep -q "gate.sh --quick" "$HOOK" 2>/dev/null; then
  HOOK_INSTALLED=true
else
  HOOK_INSTALLED=false
fi

python3 - "$OUT" <<EOF
import json, sys
bench = json.loads('''$BENCH_LINE''' or '{}')
gate = {
  "verify_rc": $VERIFY_RC,
  "verify_failed": json.loads('''$FAILED_JSON'''),
  "oracle_ok": int("${CMP_OK:-0}" or 0),
  "oracle_failed": int("${CMP_FAIL:-999}" or 999),
  "oracle_types_flagged": int("${TYPES_FLAGGED:-999}" or 999),
  "bench_rc": $BENCH_RC,
  "bench_total_sec": bench.get("value"),
  "bench_n_queries": bench.get("n_queries"),
  "bench_n_failed": bench.get("n_failed"),
  "bench_reps": bench.get("reps"),
  "bench_spread": bench.get("spread"),
  "bench_diff": json.loads('''$BENCH_DIFF''' or '{}'),
  "tests_succeeded": int("${T_OK:-0}" or 0),
  "tests_failed": int("${T_FAIL:-999}" or 999),
  "tests_canceled": int("${T_CANCEL:-0}" or 0),
  "sbt_test_rc": $TEST_RC,
  "hook_installed": "$HOOK_INSTALLED" == "true",
}
gate["green"] = (gate["verify_rc"] == 0 and gate["oracle_failed"] == 0
  and gate["oracle_types_flagged"] == 0 and not gate["verify_failed"]
  and gate["bench_rc"] == 0 and gate["bench_n_failed"] == 0
  and gate["tests_failed"] == 0 and gate["sbt_test_rc"] == 0
  and gate["hook_installed"])
line = json.dumps(gate)
open(sys.argv[1], "w").write(line + "\n")
print(line)
EOF

# append the full-gate result to the committed round log too (same file
# the --quick pre-commit guard writes), so the log is the ONE place the
# round-close doc proves gate coverage from
HEAD_SHA=$(git rev-parse --short HEAD 2>/dev/null || echo none)
DIRTY=$([ -n "$(git status --porcelain 2>/dev/null)" ] && echo true || echo false)
TS=$(date -u +%Y-%m-%dT%H:%M:%SZ)
GREEN=$(python3 -c "import json,sys; print(str(json.load(open('$OUT'))['green']).lower())" 2>/dev/null || echo false)
log_gate "{\"mode\":\"full\",\"ts\":\"$TS\",\"head\":\"$HEAD_SHA\",\"dirty\":$DIRTY,\"green\":$GREEN,\"out\":\"$OUT\"}"
