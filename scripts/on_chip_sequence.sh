#!/bin/bash
# Pending on-chip measurements (round-3 queue, run in round 4), in
# order of value. Run when /tmp/tpu_status.txt says TPU-UP. Logs to
# logs/on_chip_r4.log.
#
# COMPILE-CONTAINMENT DISCIPLINE (VERDICT r3 #3): any new (kernel,
# dtype, shape-class) combination compiles first in a sacrificial
# subprocess with a hard timeout (corsair_tpu/utils/compile_probe.py);
# only probed configs run in-process. Step 7 below enforces it: the
# single-plane bench A/B only runs if the contained compile sweep
# passed. A SIGABRT in a probe subprocess leaves the parent alive and
# is recorded in logs/probe_ledger.jsonl.
set -u
cd "$(dirname "$0")/.."
LOG=logs/on_chip_r4.log
run() {
  echo "=== $* $(date +%H:%M:%S) ===" | tee -a "$LOG"
  local out rc
  out=$(timeout 3000 "$@" 2>&1)
  rc=$?
  echo "$out" | tail -24 | tee -a "$LOG"
  echo "--- rc=$rc $(date +%H:%M:%S) ---" | tee -a "$LOG"
  return $rc
}

# 1. isolated kNN kernel A/B + merged-kernel parity on chip
run python scripts/bench_knn_kernels.py

# 2. protocol bench at the deployed defaults (down-band 896,
#    reference-faithful SymPose budget)
run python bench.py

# 3. merged-global sector-kNN in-program
run env CORSAIR_MERGED_KNN=1 python bench.py

# 4. down-band attribution: the old 2*384=768 rule (L2-down falls back
#    to the gather path) vs the new 896 default measured in step 2
run env CORSAIR_BANDED_DOWN_BAND=768 python bench.py

# 5. bf16 end-to-end with the banded conv (exact 3-plane selection)
run env CORSAIR_BENCH_BF16=1 python bench.py

# 5b. opt-in fast() SymPose preset A/B (reduced Lloyd budget +
#     subsampled prescores; decision-identical on the budget studies
#     incl. the near-threshold reject-side fixtures)
run env CORSAIR_BENCH_FAST_SYMPOSE=1 python bench.py

# 6. sharded pipeline through the real TPU kernels
run python scripts/mesh_smoke.py

# 7. single-plane selection: contained compile sweep FIRST (each
#    config in its own subprocess — a SIGABRT cannot take this script
#    or the backend handle down with it), bench A/B only on a clean
#    sweep. Expected if the sublane-pad guard holds: selection FLOPs
#    /3 and recombine passes /6 => a large extraction win at
#    gather-path precision class.
if run python scripts/diagnose_banded_bf16.py; then
  run env CORSAIR_BANDED_FAST=1 python bench.py
else
  echo "single-plane sweep FAILED - skipping in-process A/B" | tee -a "$LOG"
fi
