#!/bin/bash
# Round-5 TPU chain, part 4: recon-operator benchmark after everything else.
cd /root/repo
Q=runs/r5queue
log() { echo "[chain4] $1 $(date -u +%H:%M:%S)" >> $Q/chain.log; }

while ! grep -q "chain3 done" $Q/chain.log 2>/dev/null; do sleep 60; done

log "G: shear-warp vs joseph recon benchmark"
python scripts/bench_shearwarp.py > $Q/bench_shearwarp.log 2>&1 \
  || log "SWBENCH FAILED"
log "chain4 done"
