#!/bin/bash
# Round-5 TPU chain, part 7: regenerate the 4D-demo record. The first
# round-5 session ran the demo end-to-end but its artifacts
# (runs/4d_demo/4d_demo.json + reconstructions) did not survive the
# machine restart; README/PHYSICS_VALIDATION cite that record, so it is
# re-run here at the same reference ROOSTER depth and committed this time.
# Strictly serial TPU use: waits for chain6.
cd /root/repo
Q=runs/r5queue
log() { echo "[chain7] $1 $(date -u +%H:%M:%S)" >> $Q/chain5.log; }

while ! grep -q "chain6 done" $Q/chain5.log 2>/dev/null; do sleep 60; done

log "A: 4D demo at reference ROOSTER depth (regenerate lost record)"
timeout 4500 python scripts/run_4d_demo.py --output-folder runs/4d_demo \
  --rooster-iterations 10 --rooster-cg-iterations 4 --rooster-phases 10 \
  > $Q/4d_demo.log 2>&1 || log "4D FAILED"

log "B: insert-tracking motion analysis"
timeout 900 python scripts/analyze_4d_motion.py --folder runs/4d_demo \
  > $Q/4d_motion.log 2>&1 || log "4DMOTION FAILED"

log "C: validation plots (incl. 4d_motion_recovery.png)"
timeout 900 python scripts/plot_validation.py > $Q/plots2.log 2>&1 \
  || log "PLOTS2 FAILED"
log "chain7 done"
