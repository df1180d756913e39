#!/usr/bin/env bash
# Pre-commit gate — run before landing any registry/query change.
#
# Chains the three local checks in cheapest-first order; any FLAG or
# mismatch is a hard red (exit nonzero). The r5 driver red
# (fn_hof_exists_forall: DuckDB integer '/' -> DOUBLE vs Spark INT)
# would have been caught by step 1 — it existed but was not wired into
# the standard flow. This script IS the standard flow now.
#
#   tools/gate.sh                 # type audit + full oracle gate
#   tools/gate.sh q1 q2 ...       # type audit + named queries only
#   GATE_PYTEST=1 tools/gate.sh   # also run the full pytest suite
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== gate step 1/3: output-type audit (plan-only, both engines) =="
python tools/audit_output_types.py

echo "== gate step 2/3: DuckDB oracle gate =="
python tools/check_correctness.py "$@"

if [[ "${GATE_PYTEST:-0}" == "1" ]]; then
  echo "== gate step 3/3: pytest =="
  python -m pytest tests/ -x -q
else
  echo "== gate step 3/3: pytest skipped (set GATE_PYTEST=1 to include) =="
fi
echo "gate: ALL GREEN"
