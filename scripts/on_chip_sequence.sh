#!/bin/bash
# Round-3 pending on-chip measurements (NOTES.md checklist), in order of
# value. Run when /tmp/tpu_status.txt says TPU-UP. Logs to
# logs/on_chip_r3.log. The crash-risky single-plane bf16 diagnosis
# (scripts/diagnose_banded_bf16.py) is deliberately NOT here — run it
# manually LAST, after everything else is measured.
set -u
cd "$(dirname "$0")/.."
LOG=logs/on_chip_r3.log
run() {
  echo "=== $* $(date +%H:%M:%S) ===" | tee -a "$LOG"
  local out rc
  out=$(timeout 3000 "$@" 2>&1)
  rc=$?
  echo "$out" | tail -20 | tee -a "$LOG"
  echo "--- rc=$rc $(date +%H:%M:%S) ---" | tee -a "$LOG"
}

# 1. isolated kNN kernel A/B + merged-kernel parity on chip
run python scripts/bench_knn_kernels.py

# 2. protocol bench at the new deployed defaults (down-band 896)
run python bench.py

# 3. merged-global sector-kNN in-program
run env CORSAIR_MERGED_KNN=1 python bench.py

# 4. down-band attribution: the old 2*384=768 rule (L2-down falls back
#    to the gather path) vs the new 896 default measured in step 2
run env CORSAIR_BANDED_DOWN_BAND=768 python bench.py

# 5. bf16 end-to-end with the banded conv (exact 3-plane selection)
run env CORSAIR_BENCH_BF16=1 python bench.py

# 6. sharded pipeline through the real TPU kernels
run python scripts/mesh_smoke.py

# 7. RISKY LAST (can kill the backend — same class as the recorded
#    SIGABRT): single-plane selection compile sweep with the new
#    sublane-pad guard, then the single-plane bench A/B. Expected if
#    the guard holds: selection FLOPs /3 and recombine passes /6 =>
#    a large extraction win at gather-path precision class.
run python scripts/diagnose_banded_bf16.py
run env CORSAIR_BANDED_FAST=1 python bench.py
