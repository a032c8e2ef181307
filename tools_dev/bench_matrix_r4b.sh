#!/bin/bash
# Round-4 follow-up matrix: conv rows post VMEM-limit fix, 768px with the
# flash VAE decode, DeepCache quality evidence.
# Usage: bash tools_dev/bench_matrix_r4b.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_matrix_r4b.log}"
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

# conv kernel, fixed 64M scoped limit — the headline lever
run pallas_conv   3600 BENCH_VERBOSE=1 HCP_PALLAS_CONV=1 python bench.py
# conv + GN barrier (conv kernel removes the conv+GN fusion, barrier may
# now help the remaining GN stats)
run conv_gnbar    3600 BENCH_VERBOSE=1 HCP_PALLAS_CONV=1 HCP_GN_BARRIER=1 python bench.py
# 768px with flash VAE (the matrix's 768 row ran without it)
run sd15_768_vae  3600 BENCH_VERBOSE=1 BENCH_SIZE=768 BENCH_BATCH=4 HCP_FLASH_VAE=1 python bench.py
# 768px at batch 8 (the matrix row used batch 4; 512px runs batch 8)
run sd15_768_b8   3600 BENCH_VERBOSE=1 BENCH_SIZE=768 BENCH_BATCH=8 HCP_FLASH_VAE=1 python bench.py
# conv kernel in training (custom_vjp recomputes bwd through XLA ref)
run train_conv    3600 HCP_PALLAS_CONV=1 python bench_train.py
# DeepCache quality evidence (intervals 2+3, PSNR/SSIM vs exact loop)
run dc_quality    3600 python tools_dev/deepcache_quality.py
# SDXL-1024 inference (flash-VAE stream kernel now has a 32M scoped limit)
run sdxl_1024     5400 BENCH_VERBOSE=1 BENCH_MODEL=sdxl HCP_FLASH_VAE=1 python bench.py
# SDXL LoRA training retry (first attempt: compile helper SIGKILL)
run sdxl_train    5400 BENCH_MODEL=sdxl python bench_train.py

echo "DONE $(date)" | tee -a "$OUT"
