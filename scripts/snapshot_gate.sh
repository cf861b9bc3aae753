#!/usr/bin/env bash
# Snapshot gate (round-3 verdict #2/#3): the round-3 end-of-round
# commit shipped a query that failed ANALYSIS, redding its
# CORRECTNESS row and zeroing the entire bench. This gate makes that
# class of breakage impossible to commit unnoticed: run it (and
# require it green) before any end-of-round / milestone commit.
#
#   ./scripts/snapshot_gate.sh          # oracle sweep + plan shapes
#   ./scripts/snapshot_gate.sh --full   # entire test suite
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--full" ]]; then
  exec python -m pytest tests/ -x -q
fi
# the two files that gate the driver registry: every registered query
# must build AND match its DuckDB oracle, and the promised plan
# shapes (pushdown / broadcast / no-python) must hold
exec python -m pytest tests/test_queries_oracle.py tests/test_plan_shapes.py -q
