#!/bin/bash
# Round-3 measurement matrix — run sequentially on the real chip.
# Usage: bash tools_dev/bench_matrix_r3.sh [outfile]
# Each line of output: tag + the bench JSON (or FAIL).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_matrix_r3.log}"
: > "$OUT"

run() {  # tag, timeout_s, env pairs..., -- cmd...
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "$to" env "$@" 2>>"$OUT" | tail -1 | tee -a "$OUT"
  local rc="${PIPESTATUS[0]}"   # timeout's status, not tee's
  if [ "$rc" -ne 0 ]; then
    echo "FAIL($tag): exit $rc" | tee -a "$OUT"
  fi
  echo "--- exit $rc ---" >> "$OUT"
}

# 1. headline (default config: pallas ff + residual epilogue) — the
#    driver metric; run FIRST in case the chip window is short
run headline            2400 BENCH_VERBOSE=1 python bench.py
# 2. training headline (driver metric #2)
run train_first         2400 python bench_train.py
# 1b. VAE flash decode (D=512 streaming kernel — first hardware validation)
run vae_flash           2400 BENCH_VERBOSE=1 HCP_FLASH_VAE=1 python bench.py
# 2. proj routing on top (to_out/proj_in/proj_out through Pallas)
run pallas_proj         2400 BENCH_VERBOSE=1 HCP_PALLAS_PROJ=1 python bench.py
# 3. GN barrier A/B (re-test under the new kernel mix)
run gn_barrier          2400 BENCH_VERBOSE=1 HCP_GN_BARRIER=1 python bench.py
# 3b. LN-fused projections (ln+qkv/ln+q/ln+geglu) on top of proj routing
run pallas_ln           2400 BENCH_VERBOSE=1 HCP_PALLAS_LN=1 HCP_PALLAS_PROJ=1 python bench.py
# 3b2. Pallas conv routing (resblock conv1/conv2 + fused epilogues)
run pallas_conv         2400 BENCH_VERBOSE=1 HCP_PALLAS_CONV=1 python bench.py
# 3b3. everything: conv + proj + LN together
run pallas_all          2400 BENCH_VERBOSE=1 HCP_PALLAS_CONV=1 HCP_PALLAS_PROJ=1 HCP_PALLAS_LN=1 python bench.py
# 3c. DeepCache interval 2 and 3 (approximate mode; NOT the headline)
run deepcache2          2400 BENCH_VERBOSE=1 BENCH_DEEPCACHE=2 python bench.py
run deepcache3          2400 BENCH_VERBOSE=1 BENCH_DEEPCACHE=3 python bench.py
# 4. training headline (re-measure with pallas ff default + residual fusion)
run train               2400 python bench_train.py
# 5. 768px (streaming flash + new VAE flash decode)
run sd15_768            3000 BENCH_VERBOSE=1 BENCH_SIZE=768 BENCH_BATCH=4 python bench.py
# 6. SDXL 1024 inference (big compile; generous timeout). Uses the flash
#    VAE decode (validated by row 1b) — the XLA path's 16384^2 fp32
#    logits are ~1GB/image at decode.
run sdxl_1024           5400 BENCH_VERBOSE=1 BENCH_MODEL=sdxl HCP_FLASH_VAE=1 python bench.py
# 7. SDXL LoRA training
run sdxl_train          5400 BENCH_MODEL=sdxl python bench_train.py

echo "DONE $(date)" | tee -a "$OUT"
