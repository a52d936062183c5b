#!/bin/bash
cd /root/repo
Q=runs/r4queue2
log() { echo "[queue] $1 $(date -u +%H:%M:%S)" >> $Q/queue.log; }

log "1/5 MTF start"
python scripts/run_mtf.py --output-folder runs/mtf > $Q/mtf.log 2>&1 || log "MTF FAILED"

log "2/5 4D demo start (reference ROOSTER depth)"
python scripts/run_4d_demo.py --output-folder runs/4d_demo \
  --rooster-iterations 10 --rooster-cg-iterations 4 --rooster-phases 10 \
  > $Q/4d_demo.log 2>&1 || log "4D FAILED"

log "3/5 fit-noise start"
python scripts/run_noise_fit.py --output-folder runs/noise_fit \
  --n-projections 40 --counts 6e7 1.8e8 5.4e8 > $Q/noise_fit.log 2>&1 || log "NOISE FAILED"

log "4/5 catphan 894-view simulation start"
python scripts/run_catphan_simulation.py --output-folder runs/catphan_r4 \
  --n-projections 894 --n-histories 1.2e8 > $Q/catphan_sim.log 2>&1 || log "CATPHAN SIM FAILED"
python scripts/assemble_catphan_parts.py runs/catphan_r4 > $Q/assemble.log 2>&1
python scripts/catphan_acceptance.py --images runs/catphan_r4/images.npy \
  --air runs/catphan_r4/air.npy --output-folder runs/catphan_r4/report \
  --n-histories 1.2e8 > $Q/acceptance.log 2>&1 || log "ACCEPTANCE FAILED"

log "5/5 plots start"
python scripts/plot_validation.py > $Q/plots.log 2>&1 || log "PLOTS FAILED"
log "queue done"
