#!/usr/bin/env bash
# One-command pre-commit gate: unit/e2e suite, driver-config oracle
# rehearsal at sf0.01, and the sf0.1 benchmark.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py -q
python tools/plan_lint.py
python bench.py 2>/dev/null | tail -1
