#!/usr/bin/env bash
# Builder-pass bench wrapper (VERDICT r13 item 6, second half): run
# bench.py, read the machine degradation verdict the record now carries
# (run_conditions.degraded), and if the pass was degraded, stash the
# degraded record aside and automatically retry ONCE.  Five of six
# r12/r13 builder passes rode a measured co-tenant and were
# hand-adjudicated; this closes that loop for builder passes.  The
# external driver runs bench.py directly (no retry) — its record still
# carries the verdict for the judge to read.
#
# Usage: tools/bench_pass.sh [label]
#   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS pass through to bench.py.
set -u
cd "$(dirname "$0")/.."
label="${1:-pass}"

run_once() {
  python bench.py 2>/dev/null | tail -1
}

echo "== bench pass '$label' (attempt 1) ==" >&2
line1="$(run_once)"
echo "$line1"
deg="$(python - <<'EOF'
import json
print(json.load(open("bench_full_latest.json"))["run_conditions"]["degraded"])
EOF
)"
if [ "$deg" != "True" ]; then
  echo "== verdict: not degraded; accepting attempt 1 ==" >&2
  exit 0
fi
cp bench_full_latest.json "bench_full_degraded_${label}.json"
echo "== verdict: DEGRADED (saved bench_full_degraded_${label}.json); retrying once ==" >&2
line2="$(run_once)"
echo "$line2"
deg2="$(python - <<'EOF'
import json
print(json.load(open("bench_full_latest.json"))["run_conditions"]["degraded"])
EOF
)"
echo "== attempt 2 degraded: $deg2 (record kept either way; compare both) ==" >&2
