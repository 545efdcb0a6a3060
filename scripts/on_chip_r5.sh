#!/bin/bash
# Round-5 on-chip queue (session 4). Run when /tmp/tpu_status.txt says
# TPU-UP. Logs to logs/on_chip_r5.log.
#
# 1. Deployed-defaults protocol bench with the up_join merge-join
#    up-tables (committed e423050; expected extract 0.94 -> ~0.79 s /
#    128, ~36+ pclouds/sec).
# 2. The REAL CLI at protocol scale (VERDICT r4 #5): 652 CADs x 128
#    scans x 15k pts through corsair_tpu.cli.evaluation, default +
#    strict-protocol, prefetch + caches + metric tables ->
#    logs/evaluation_protocol_scale.txt (smoke log removed first: the
#    committed artifact must be the protocol-scale run).
# 3. (low priority) CORSAIR_BANDED_NOCOND=1 A/B. The exclusive-self-time
#    re-parse of the r5s3 xplane shows the cond wrapper is ~0.15 ms/step
#    (the earlier 41.7 ms figure was the wrapper's NESTED children,
#    double-counted), so this should be a flat negative — run it last,
#    to put a measured number on the record.
set -u
cd "$(dirname "$0")/.."
LOG=logs/on_chip_r5.log
export JAX_COMPILATION_CACHE_DIR=/tmp/corsair_jax_cache
run() {
  echo "=== $* $(date +%H:%M:%S) ===" | tee -a "$LOG"
  local out rc
  out=$(timeout 4000 env "$@" 2>&1)
  rc=$?
  echo "$out" | tail -30 | tee -a "$LOG"
  echo "--- rc=$rc $(date +%H:%M:%S) ---" | tee -a "$LOG"
  return $rc
}

# 1. deployed defaults (up_join on by default)
run python bench.py

# 2. protocol-scale CLI (VERDICT r4 #5)
rm -f logs/evaluation_protocol_scale.txt
run python scripts/evaluation_protocol_scale.py

# 3. cond-wrapper A/B (expected negative; contained probe first per
#    the discipline in .claude/skills/verify).
if run CORSAIR_BANDED_NOCOND=1 python -m corsair_tpu.utils.compile_probe \
    --body-file scripts/probe_nocond.py --name nocond_extract_16x16384 \
    --timeout 1200; then
  run CORSAIR_BANDED_NOCOND=1 python bench.py
else
  echo "nocond probe failed — skipping the A/B" | tee -a "$LOG"
fi

echo "SEQUENCE DONE $(date +%H:%M:%S)" | tee -a "$LOG"
