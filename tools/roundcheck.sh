#!/usr/bin/env bash
# Full local round validation: compile + tests + oracle compare + bench.
# Usage: tools/roundcheck.sh [sf_dir_for_verify] [sf_dir_for_bench]
set -euo pipefail
cd "$(dirname "$0")/.."
VDIR=${1:-/root/testdata/sf0.01}
BDIR=${2:-/root/testdata/sf0.1}
OUT=$(mktemp -d /tmp/graft_roundcheck.XXXX)

echo "== compile + test"
sbt -batch test 2>&1 | grep -E "Tests:|\*\*\*" | tail -2

echo "== verify + duckdb compare ($VDIR)"
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $VDIR $OUT" 2>&1 \
  | grep -E "\[verify\]" || true
python3 tools/compare_local.py "$OUT" "$VDIR" | tail -1

echo "== bench ($BDIR)"
SPARK_GRAFT_SF_DIR=$BDIR SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Bench" \
  2>/dev/null | grep '"metric"' | python3 -c "
import json, statistics, sys
j = json.loads(sys.stdin.read().strip().removeprefix('[info] '))
q = j['queries']
bad = [k for k, v in q.items() if v < 0]
print(f'total {j[\"value\"]:.1f}s / {len(q)} queries | median '
      f'{statistics.median(q.values()):.2f}s | failed: {bad or \"none\"}')"
