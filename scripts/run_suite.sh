#!/bin/bash
# Suite runner: one pytest process per test file.
#
# XLA:CPU compiles segfault flakily in long-lived many-compile processes on
# this box (observed: single-process full-suite runs die ~80 compiles in,
# inside backend_compile_and_load; each file passes standalone).  Per-file
# processes bound the compile count per process; the shared persistent
# compile cache keeps the total cost close to a single run.
# Usage: scripts/run_suite.sh [--slow] [extra pytest args]
#   --slow  ALSO run the slow tier (full-prover e2e, 2^16-gate sharded
#           PLONK proof identity, streamed/sorted scale MSMs) — hours
#           cold; run once per round at idle and note the result in
#           PARITY.md (VERDICT r4 #10).
set -u
cd "$(dirname "$0")/.."
slow=0
if [ "${1:-}" = "--slow" ]; then
  slow=1
  shift
fi
rc_all=0
for f in tests/test_*.py; do
  echo "=== $f ==="
  python -m pytest "$f" -q "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    rc_all=$rc
    echo "!!! $f rc=$rc"
  fi
  if [ $slow -eq 1 ]; then
    if python -m pytest "$f" -m slow -q --collect-only >/dev/null 2>&1; then
      echo "=== $f (slow tier) ==="
      python -m pytest "$f" -m slow -q "$@"
      rc=$?
      if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then   # 5 = no tests collected
        rc_all=$rc
        echo "!!! $f slow rc=$rc"
      fi
    fi
  fi
done
echo "=== suite done rc=$rc_all ==="
exit $rc_all
