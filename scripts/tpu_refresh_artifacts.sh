#!/usr/bin/env bash
# Regenerate the per-round on-chip artifacts after kernel/bench changes:
#   KERNEL_VALIDATION.json  (compiled Pallas-kernel parity, incl. the fused
#                            tied flash backward via the flash bwd check)
#   BENCH_DETAIL.json       (all five BASELINE configs)
# Must run with the TPU relay up (PYTHONPATH=/root/.axon_site is the relay
# client; JAX_PLATFORMS=axon is the container default). Serialize: the relay
# compile helpers are a per-process budget — never run these concurrently.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
echo "== kernel validation =="
timeout 1800 python -m face_mask_inpaint_tpu.tools.validate_kernels
echo "== bench (all configs) =="
BENCH_ALL=1 timeout 5400 python bench.py
