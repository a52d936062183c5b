#!/bin/bash
# Round-4 session-3 TPU chain, take 3: deliverables that consume the 13 GB
# uncommitted catphan parts run FIRST (reboots wipe untracked files); the
# crash-prone ROOSTER probe + 4D retry run after them.
cd /root/repo
Q=runs/r4queue3
log() { echo "[chain3] $1 $(date -u +%H:%M:%S)" >> $Q/chain.log; }

log "1/9 catphan 894-view resume"
python scripts/run_catphan_simulation.py --output-folder runs/catphan_r4 \
  --n-projections 894 --n-histories 1.2e8 > $Q/catphan_sim.log 2>&1 \
  || log "CATPHAN SIM FAILED"

log "2/9 assemble + acceptance"
python scripts/assemble_catphan_parts.py runs/catphan_r4 > $Q/assemble.log 2>&1
python scripts/catphan_acceptance.py --images runs/catphan_r4/images.npy \
  --air runs/catphan_r4/air.npy --output-folder runs/catphan_r4/report \
  --n-histories 1.2e8 > $Q/acceptance.log 2>&1 || log "ACCEPTANCE FAILED"

log "3/9 fast-scan acceptance"
python scripts/fast_scan_acceptance.py --folder runs/catphan_r4 \
  --n-histories-mc 1.2e8 > $Q/fast_scan.log 2>&1 || log "FASTSCAN FAILED"

log "4/9 speedup acceptance"
python scripts/speedup_acceptance.py --folder runs/catphan_r4 \
  --n-histories 1.2e8 > $Q/speedup_acceptance.log 2>&1 || log "SPEEDUP FAILED"

log "5/9 ROOSTER crash probe at 4D-demo shapes"
python scripts/probe_rooster_crash.py > $Q/probe.log 2>&1 \
  || log "PROBE DIED (see probe.log for last stage banner)"

log "6/9 4D demo retry (instrumented, host-dispatched CG)"
for attempt in 1 2; do
  sleep 90  # let a crashed TPU worker finish restarting
  python scripts/run_4d_demo.py --output-folder runs/4d_demo \
    --rooster-iterations 10 --rooster-cg-iterations 4 --rooster-phases 10 \
    >> $Q/4d_demo.log 2>&1 && break
  log "4D attempt $attempt FAILED"
done

log "7/9 patient demo"
python scripts/run_patient_demo.py --output-folder runs/patient_demo \
  > $Q/patient_demo.log 2>&1 || log "PATIENT FAILED"

log "8/9 plots"
python scripts/plot_validation.py > $Q/plots.log 2>&1 || log "PLOTS FAILED"

log "9/9 perf: microbench + fine sweep + bench"
python scripts/microbench_ops.py --out runs/microbench.json > $Q/microbench.log 2>&1 \
  || log "MICROBENCH FAILED"
python scripts/sweep_engine_configs.py --scene full --reps 2 --configs \
  V4_T2_R2_L16 V4_T2_R2_L15 V4_T2_R2_L14 V4_T1_R1_L16 V4_T1_R1_L15 \
  V4_T3_R3_L16 V4_T2_R1_L16 V4_T2_R2_L16_EF25 V4_T2_R2_L16_EF50 V4_T2_R2_L17 \
  > $Q/sweep_fine.log 2>&1 || log "SWEEP FAILED"
python bench.py > $Q/bench.log 2>&1 || log "BENCH FAILED"
log "chain3 done"
