#!/bin/bash
# Round-5 on-chip queue (session 4). Run when /tmp/tpu_status.txt says
# TPU-UP. Logs to logs/on_chip_r5.log.
#
# 1. Deployed-defaults protocol bench with the up_join merge-join
#    up-tables (committed e423050; expected extract 0.94 -> ~0.79 s /
#    128, ~36+ pclouds/sec).
# 2. CORSAIR_BANDED_NOCOND=1 A/B: quantifies the lax.cond wrapper's
#    data-movement cost (41.7 ms/step per the post-up_join roofline,
#    logs/extraction_roofline.json). Experiment knob only — if it wins
#    big, a safe always-banded deployment design follows; if not, a
#    recorded negative.
# 3. The REAL CLI at protocol scale (VERDICT r4 #5): 652 CADs x 128
#    scans x 15k pts through corsair_tpu.cli.evaluation, default +
#    strict-protocol, prefetch + caches + metric tables ->
#    logs/evaluation_protocol_scale.txt (smoke log removed first: the
#    committed artifact must be the protocol-scale run).
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

# 2. cond-wrapper A/B (extraction-only question; full bench both arms).
#    Contained compile probe first (discipline: .claude/skills/verify).
if run CORSAIR_BANDED_NOCOND=1 python -m corsair_tpu.utils.compile_probe \
    --body-file scripts/probe_nocond.py --name nocond_extract_16x16384 \
    --timeout 1200; then
  run CORSAIR_BANDED_NOCOND=1 python bench.py
else
  echo "nocond probe failed — skipping the A/B" | tee -a "$LOG"
fi

# 3. protocol-scale CLI (VERDICT r4 #5)
rm -f logs/evaluation_protocol_scale.txt
run python scripts/evaluation_protocol_scale.py

echo "SEQUENCE DONE $(date +%H:%M:%S)" | tee -a "$LOG"
