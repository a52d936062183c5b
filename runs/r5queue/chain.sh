#!/bin/bash
# Round-5 TPU chain: the at-scale runs round 4 queued but never landed.
# Ordered so the committed deliverables (acceptance record, 4D demo,
# patient demo) come before the long-tail items (fast-scan).
cd /root/repo
Q=runs/r5queue
log() { echo "[chain] $1 $(date -u +%H:%M:%S)" >> $Q/chain.log; }

log "0/9 waiting for catphan sim"
while ! grep -q "simulation complete" $Q/catphan_sim.log 2>/dev/null; do
  # if the sim process died without finishing, resume it (PID file from
  # the launcher; never match processes by command-line pattern)
  if ! kill -0 "$(cat /tmp/catphan_sim.pid 2>/dev/null)" 2>/dev/null; then
    if grep -q "simulation complete" $Q/catphan_sim.log; then break; fi
    log "sim process gone; resuming"
    echo $$ > /tmp/catphan_sim.pid
    python scripts/run_catphan_simulation.py --output-folder runs/catphan_r5 \
      --n-projections 894 --n-histories 1.2e8 >> $Q/catphan_sim.log 2>&1
  fi
  sleep 60
done
log "sim done"

log "1/9 assemble + acceptance (894 views)"
python scripts/assemble_catphan_parts.py runs/catphan_r5 > $Q/assemble.log 2>&1
python scripts/catphan_acceptance.py --images runs/catphan_r5/images.npy \
  --air runs/catphan_r5/air.npy --output-folder runs/catphan_r5/report \
  --n-histories 1.2e8 > $Q/acceptance.log 2>&1 \
  && cp runs/catphan_r5/report/catphan_acceptance.json \
       docs/validation/catphan_acceptance_r5.json \
  || log "ACCEPTANCE FAILED"

log "2/9 MC-FP geometric agreement"
python scripts/mc_fp_agreement.py --folder runs/catphan_r5 \
  > $Q/mc_fp.log 2>&1 \
  && cp runs/catphan_r5/mc_fp_agreement.json docs/validation/ \
  || log "MCFP FAILED"

log "3/9 4D demo at reference ROOSTER depth"
python scripts/run_4d_demo.py --output-folder runs/4d_demo \
  --rooster-iterations 10 --rooster-cg-iterations 4 --rooster-phases 10 \
  > $Q/4d_demo.log 2>&1 || log "4D FAILED"

log "4/9 patient demo"
python scripts/run_patient_demo.py --output-folder runs/patient_demo \
  > $Q/patient_demo.log 2>&1 || log "PATIENT FAILED"

log "5/9 speedup acceptance at scan scale"
python scripts/speedup_acceptance.py --folder runs/catphan_r5 \
  --n-histories 1.2e8 > $Q/speedup_acceptance.log 2>&1 \
  || log "SPEEDUP FAILED"

log "6/9 full-resolution noise fit"
python scripts/noise_fit_fullres.py --output runs/noise_fit_r5 \
  > $Q/noise_fit.log 2>&1 || log "NOISEFIT FAILED"

log "7/9 fast-scan acceptance (long)"
python scripts/fast_scan_acceptance.py --folder runs/catphan_r5 \
  --n-histories-mc 1.2e8 > $Q/fast_scan.log 2>&1 || log "FASTSCAN FAILED"

log "8/9 plots"
python scripts/plot_validation.py > $Q/plots.log 2>&1 || log "PLOTS FAILED"

log "9/9 bench"
python bench.py > $Q/bench.log 2>&1 || log "BENCH FAILED"
log "chain done"
