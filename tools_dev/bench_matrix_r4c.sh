#!/bin/bash
# Round-4 remaining rows (r4b was cut short mid sd15_768_b8).
# Usage: bash tools_dev/bench_matrix_r4c.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_matrix_r4c.log}"
: > "$OUT"

run() {  # tag, timeout_s, env pairs..., -- cmd...
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

# DeepCache quality evidence (intervals 2+3, PSNR/SSIM vs exact loop)
run dc_quality    3600 python tools_dev/deepcache_quality.py
# SDXL-1024 inference (streaming flash kernel now has a 32M scoped limit)
run sdxl_1024     5400 BENCH_VERBOSE=1 BENCH_MODEL=sdxl HCP_FLASH_VAE=1 python bench.py
# 768px at batch 8 (r4b died mid-compile on this row)
run sd15_768_b8   3600 BENCH_VERBOSE=1 BENCH_SIZE=768 BENCH_BATCH=8 HCP_FLASH_VAE=1 python bench.py
# SDXL LoRA training retry (first attempt: compile helper SIGKILL)
run sdxl_train    5400 BENCH_MODEL=sdxl python bench_train.py
# fallback at batch 2 if the b4 graph still OOMs the compile helper
if grep -q "FAIL(sdxl_train)" "$OUT"; then
  run sdxl_train_b2 5400 BENCH_MODEL=sdxl BENCH_BATCH=2 python bench_train.py
fi
# conv kernel in training (custom_vjp recomputes bwd through XLA ref)
run train_conv    3600 HCP_PALLAS_CONV=1 python bench_train.py

echo "DONE $(date)" | tee -a "$OUT"
