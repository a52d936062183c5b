#!/bin/bash
# Runs after patient_batch.sh: reference-statistics fast-scan acceptance.
cd /root/repo
Q=runs/r4queue2
while ! grep -q "\[patient\] done" $Q/queue.log; do sleep 120; done
echo "[fastscan] start $(date -u +%H:%M:%S)" >> $Q/queue.log
python scripts/fast_scan_acceptance.py --folder runs/catphan_r4 \
  --n-histories-mc 1.2e8 > $Q/fast_scan.log 2>&1 \
  || echo "[fastscan] FAILED" >> $Q/queue.log
echo "[fastscan] done $(date -u +%H:%M:%S)" >> $Q/queue.log
