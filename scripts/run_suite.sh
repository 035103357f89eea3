#!/bin/bash
# Suite runner: one pytest process per test file.
#
# XLA:CPU compiles segfault flakily in long-lived many-compile processes on
# this box (observed: single-process full-suite runs die ~80 compiles in,
# inside backend_compile_and_load; each file passes standalone).  Per-file
# processes bound the compile count per process; the shared persistent
# compile cache keeps the total cost close to a single run.
# Usage: scripts/run_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
rc_all=0
for f in tests/test_*.py; do
  echo "=== $f ==="
  python -m pytest "$f" -q "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    rc_all=$rc
    echo "!!! $f rc=$rc"
  fi
done
echo "=== suite done rc=$rc_all ==="
exit $rc_all
