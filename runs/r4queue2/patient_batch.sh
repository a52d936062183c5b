#!/bin/bash
# Runs after speedup_batch.sh: patient-style end-to-end run-mc demo.
cd /root/repo
Q=runs/r4queue2
while ! grep -q "\[speedup-acc\] done" $Q/queue.log; do sleep 120; done
echo "[patient] start $(date -u +%H:%M:%S)" >> $Q/queue.log
python scripts/run_patient_demo.py --output-folder runs/patient_demo \
  > $Q/patient_demo.log 2>&1 || echo "[patient] FAILED" >> $Q/queue.log
echo "[patient] done $(date -u +%H:%M:%S)" >> $Q/queue.log
