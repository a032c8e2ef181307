#!/bin/bash
# Round-4 wave E: mxu-sum A/B at 512 (wave D's attempt hit the
# negative-index dynamic_slice Mosaic lowering bug, now fixed) and a
# plain-nomax 768 row to isolate mxu-sum's contribution there (wave D's
# 768 row ran nomax+mxusum combined).
# Usage: bash tools_dev/bench_matrix_r4e.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_matrix_r4e.log}"
: > "$OUT"

run() {
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "$to" env "$@" 2>>"$OUT" | tail -2 | tee -a "$OUT"
  local rc="${PIPESTATUS[0]}"
  if [ "$rc" -ne 0 ]; then
    echo "FAIL($tag): exit $rc" | tee -a "$OUT"
  fi
  echo "--- exit $rc ---" >> "$OUT"
}

run mxusum_512    3600 BENCH_VERBOSE=1 HCP_FLASH_NOMAX=1 HCP_FLASH_MXU_SUM=1 python bench.py
run nomax768_plain 3600 BENCH_VERBOSE=1 BENCH_SIZE=768 HCP_FLASH_NOMAX=1 python bench.py

echo "DONE $(date)" | tee -a "$OUT"
