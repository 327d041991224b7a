#!/usr/bin/env bash
# Round-3 second A/B queue (after the winner flips): sym-backward tile size,
# batch-size records, and the packed-synthesis channel ceiling. Serialized —
# the relay compile helpers are a per-process budget.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
LOG=tools_scratch/ab_r3b.log
run() {
  local tag="$1"; shift
  echo "== $tag ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  local out
  out=$(env "$@" timeout 2400 python bench.py 2>/dev/null | tail -1)
  echo "$tag $out" | tee -a "$LOG"
}

# 1. GAN train: sym-backward tile size (default 512), bs16 record
run gan-symt1024   BENCH_MODE=gan_train FMI_FLASH_SYM_T=1024
run gan-symt256    BENCH_MODE=gan_train FMI_FLASH_SYM_T=256
run gan-bs16       BENCH_MODE=gan_train BENCH_BS=16

# 2. flagship: bs32
run flagship-bs32  BENCH_MODE=flagship BENCH_BS=32

# 3. pSp: packed-synthesis ceiling (default 64 — pack the 256² stage too)
run psp-maxch128   BENCH_MODE=psp FMI_PACKED_SYNTH_MAX_CH=128

echo "ab_queue_r3b complete" | tee -a "$LOG"
