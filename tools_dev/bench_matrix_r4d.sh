#!/bin/bash
# Round-4 wave D: no-max flash softmax A/B, sdxl_1024 rerun (wave C's
# attempt was perturbed by a concurrent dryrun grabbing the TPU),
# batch-16 retest under the current default mix, fresh trace.
# Usage: bash tools_dev/bench_matrix_r4d.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_matrix_r4d.log}"
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

# headline control (also exercises the new MFU JSON fields on-chip)
run control       3600 BENCH_VERBOSE=1 python bench.py
# no-max flash softmax — the attention-bucket lever
run nomax         3600 BENCH_VERBOSE=1 HCP_FLASH_NOMAX=1 python bench.py
run nomax_mxusum  3600 BENCH_VERBOSE=1 HCP_FLASH_NOMAX=1 HCP_FLASH_MXU_SUM=1 python bench.py
run nomax_train   3600 HCP_FLASH_NOMAX=1 python bench_train.py
# SDXL-1024 rerun, clean chip (donated fp32->bf16 cast fixes the wave-C
# OOM at the cast peak); fall back to smaller batches if b4 still OOMs
run sdxl_1024     5400 BENCH_VERBOSE=1 BENCH_MODEL=sdxl HCP_FLASH_VAE=1 python bench.py
if grep -q "FAIL(sdxl_1024)" "$OUT"; then
  run sdxl_1024_b2 5400 BENCH_VERBOSE=1 BENCH_MODEL=sdxl BENCH_BATCH=2 HCP_FLASH_VAE=1 python bench.py
fi
if grep -q "FAIL(sdxl_1024_b2)" "$OUT"; then
  run sdxl_1024_b1 5400 BENCH_VERBOSE=1 BENCH_MODEL=sdxl BENCH_BATCH=1 HCP_FLASH_VAE=1 python bench.py
fi
# batch 16 under the round-3/4 default mix (ff Pallas kernels landed
# since the round-2 batch test)
run batch16       3600 BENCH_VERBOSE=1 BENCH_BATCH=16 python bench.py
# no-max at 768px (attention share doubles there; batch 8 = the better
# default per wave C: 0.98 vs 0.93 img/s)
run nomax_768     3600 BENCH_VERBOSE=1 BENCH_SIZE=768 HCP_FLASH_NOMAX=1 HCP_FLASH_MXU_SUM=1 python bench.py

echo "DONE $(date)" | tee -a "$OUT"
