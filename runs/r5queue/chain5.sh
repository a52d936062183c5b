#!/bin/bash
# Round-5 TPU chain, part 5 (second session): the remaining verdict items.
# The first session landed the 894-view acceptance + 4D demo but its raw
# projection data did not survive; downstream items (MC-FP, fast-scan,
# speedup acceptance) re-simulate a 224-view full-arc run on the identical
# geometry (the 894-view acceptance record already stands) and record
# measured steady-state s/view so the 894-view wall-clock is a measured
# extrapolation, not a claim. Strictly serial: two concurrent TPU clients
# wedge the device (round-5 chain1 lesson).
cd /root/repo
Q=runs/r5queue
log() { echo "[chain5] $1 $(date -u +%H:%M:%S)" >> $Q/chain5.log; }

log "1/9 catphan 224-view sim"
timeout 4500 python scripts/run_catphan_simulation.py \
  --output-folder runs/catphan_r5b --n-projections 224 --n-histories 1.2e8 \
  > $Q/catphan_sim.log 2>&1 || log "SIM FAILED"
python scripts/assemble_catphan_parts.py runs/catphan_r5b \
  > $Q/assemble.log 2>&1 || log "ASSEMBLE FAILED"

log "2/9 MC-FP geometric agreement"
timeout 1800 python scripts/mc_fp_agreement.py --folder runs/catphan_r5b \
  > $Q/mc_fp.log 2>&1 \
  && cp runs/catphan_r5b/mc_fp_agreement.json docs/validation/ \
  || log "MCFP FAILED"

log "3/9 fast-scan acceptance (224 views at reference statistics)"
timeout 5400 python scripts/fast_scan_acceptance.py --folder runs/catphan_r5b \
  --n-histories-mc 1.2e8 > $Q/fast_scan.log 2>&1 || log "FASTSCAN FAILED"

log "4/9 patient demo"
timeout 3000 python scripts/run_patient_demo.py --output-folder runs/patient_demo \
  > $Q/patient_demo.log 2>&1 || log "PATIENT FAILED"

log "5/9 pallas bucket experiment"
timeout 1800 python scripts/pallas_bucket_experiment.py \
  --output runs/pallas_bucket_experiment.json > $Q/pallas.log 2>&1 \
  || log "PALLAS FAILED"

log "6/9 speedup acceptance at scan scale"
timeout 3000 python scripts/speedup_acceptance.py --folder runs/catphan_r5b \
  --n-histories 1.2e8 > $Q/speedup_acceptance.log 2>&1 \
  || log "SPEEDUP FAILED"

log "7/9 full-resolution noise fit"
timeout 4200 python scripts/noise_fit_fullres.py --output runs/noise_fit_r5 \
  > $Q/noise_fit.log 2>&1 || log "NOISEFIT FAILED"

log "8/9 oracle at scale"
timeout 2400 python scripts/oracle_at_scale.py \
  --output docs/validation/oracle_at_scale_r5.json > $Q/oracle.log 2>&1 \
  || log "ORACLE FAILED"

log "9/9 speedup cross-scene eval"
timeout 1800 python scripts/eval_speedup_cross_scene.py --output runs/speedup \
  > $Q/cross_scene.log 2>&1 || log "CROSSSCENE FAILED"

log "plots"
timeout 900 python scripts/plot_validation.py > $Q/plots.log 2>&1 \
  || log "PLOTS FAILED"
log "chain5 done"
