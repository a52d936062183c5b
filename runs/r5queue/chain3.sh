#!/bin/bash
# Round-5 TPU chain, part 3: perf sweep + final bench after all validation.
cd /root/repo
Q=runs/r5queue
log() { echo "[chain3] $1 $(date -u +%H:%M:%S)" >> $Q/chain.log; }

while ! grep -q "chain2 done" $Q/chain.log 2>/dev/null; do sleep 60; done

log "E: fine engine sweep around the production point"
python scripts/sweep_engine_configs.py --scene full --reps 2 --configs \
  V4_T2_R2_L16 V4_T2_R2_L15 V4_T2_R2_L14 V4_T1_R1_L16 V4_T1_R1_L15 \
  V4_T3_R3_L16 V4_T2_R1_L16 V4_T2_R2_L16_EF25 V4_T2_R2_L16_EF50 V4_T2_R2_L17 \
  > $Q/sweep_fine.log 2>&1 || log "SWEEP FAILED"

log "F: bench"
python bench.py > $Q/bench.log 2>&1 || log "BENCH FAILED"
log "chain3 done"
