#!/usr/bin/env bash
# Round-3 relay-outage A/B queue: run serialized on the real chip as soon
# as the relay is back. Each line is one bench process (the relay compile
# helpers are a per-process budget — never run two concurrently).
# Results append to tools_scratch/ab_r3.log as "<tag> <json-line>".
# After runs: flip code defaults for winners, re-run affected pytest files,
# then scripts/tpu_refresh_artifacts.sh.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
LOG=tools_scratch/ab_r3.log
run() {  # run <tag> <env...> — executes bench.py with the env, logs last line
  local tag="$1"; shift
  echo "== $tag ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  local out
  out=$(env "$@" timeout 2400 python bench.py 2>/dev/null | tail -1)
  echo "$tag $out" | tee -a "$LOG"
}

# 1. flagship (BENCH_MODE default)
run flagship-base            BENCH_MODE=flagship
run flagship-sym             BENCH_MODE=flagship FMI_FLASH_SYM=1
run flagship-sym-t1024       BENCH_MODE=flagship FMI_FLASH_SYM=1 FMI_FLASH_SYM_T=1024

# 2. GAN train
run gan-base                 BENCH_MODE=gan_train
run gan-symbwd               BENCH_MODE=gan_train FMI_FLASH_SYM_BWD=1
run gan-sym                  BENCH_MODE=gan_train FMI_FLASH_SYM=1
run gan-symbwd-packeddx         BENCH_MODE=gan_train FMI_FLASH_SYM_BWD=1 FMI_PACKED_DX_CI3=1

# 3. pSp (flat-noise + donation already default; compare vs recorded 134.18 @ bs16)
run psp-base                 BENCH_MODE=psp
run psp-group4               BENCH_MODE=psp FMI_PACKED_1X1_GROUP=4
run psp-group4-rowd2s        BENCH_MODE=psp FMI_PACKED_1X1_GROUP=4 FMI_D2S_ROWCONV=1
run psp-group4-rowd2s-barrier BENCH_MODE=psp FMI_PACKED_1X1_GROUP=4 FMI_D2S_ROWCONV=1 FMI_MODCONV_BARRIER=1
run psp-plus-unroll          BENCH_MODE=psp FMI_PACKED_1X1_GROUP=4 FMI_D2S_ROWCONV=1 FMI_MODCONV_BARRIER=1 FMI_STYLE_SCAN_UNROLL=3

echo "A/B queue complete. Flip winners, re-test, then scripts/tpu_refresh_artifacts.sh" | tee -a "$LOG"
