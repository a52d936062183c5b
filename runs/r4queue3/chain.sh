#!/bin/bash
# Round-4 session-3 TPU chain: one job at a time owns the chip.
cd /root/repo
Q=runs/r4queue3
log() { echo "[chain] $1 $(date -u +%H:%M:%S)" >> $Q/chain.log; }

log "1/8 4D demo retry (reference ROOSTER depth)"
for attempt in 1 2 3; do
  python scripts/run_4d_demo.py --output-folder runs/4d_demo \
    --rooster-iterations 10 --rooster-cg-iterations 4 --rooster-phases 10 \
    >> $Q/4d_demo.log 2>&1 && break
  log "4D attempt $attempt FAILED"
  sleep 60
done

log "2/8 catphan 894-view resume"
python scripts/run_catphan_simulation.py --output-folder runs/catphan_r4 \
  --n-projections 894 --n-histories 1.2e8 > $Q/catphan_sim.log 2>&1 \
  || log "CATPHAN SIM FAILED"

log "3/8 assemble + acceptance"
python scripts/assemble_catphan_parts.py runs/catphan_r4 > $Q/assemble.log 2>&1
python scripts/catphan_acceptance.py --images runs/catphan_r4/images.npy \
  --air runs/catphan_r4/air.npy --output-folder runs/catphan_r4/report \
  --n-histories 1.2e8 > $Q/acceptance.log 2>&1 || log "ACCEPTANCE FAILED"

log "4/8 fast-scan acceptance"
python scripts/fast_scan_acceptance.py --folder runs/catphan_r4 \
  --n-histories-mc 1.2e8 > $Q/fast_scan.log 2>&1 || log "FASTSCAN FAILED"

log "5/8 speedup acceptance"
python scripts/speedup_acceptance.py --folder runs/catphan_r4 \
  --n-histories 1.2e8 > $Q/speedup_acceptance.log 2>&1 || log "SPEEDUP FAILED"

log "6/8 patient demo"
python scripts/run_patient_demo.py --output-folder runs/patient_demo \
  > $Q/patient_demo.log 2>&1 || log "PATIENT FAILED"

log "7/8 plots"
python scripts/plot_validation.py > $Q/plots.log 2>&1 || log "PLOTS FAILED"

log "8/8 perf: microbench + fine sweep + bench"
python scripts/microbench_ops.py --out runs/microbench.json > $Q/microbench.log 2>&1 \
  || log "MICROBENCH FAILED"
python scripts/sweep_engine_configs.py --scene full --reps 2 --configs \
  V4_T2_R2_L16 V4_T2_R2_L15 V4_T2_R2_L14 V4_T1_R1_L16 V4_T1_R1_L15 \
  V4_T3_R3_L16 V4_T2_R1_L16 V4_T2_R2_L16_EF25 V4_T2_R2_L16_EF50 V4_T2_R2_L17 \
  > $Q/sweep_fine.log 2>&1 || log "SWEEP FAILED"
python bench.py > $Q/bench.log 2>&1 || log "BENCH FAILED"
log "chain done"
