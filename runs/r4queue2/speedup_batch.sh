#!/bin/bash
# Runs after perf_batch.sh: speedup-model acceptance at the 894-view scale.
cd /root/repo
Q=runs/r4queue2
while ! grep -q "\[perf\] done" $Q/queue.log; do sleep 120; done
echo "[speedup-acc] start $(date -u +%H:%M:%S)" >> $Q/queue.log
python scripts/speedup_acceptance.py --folder runs/catphan_r4 \
  --n-histories 1.2e8 > $Q/speedup_acceptance.log 2>&1 \
  || echo "[speedup-acc] FAILED" >> $Q/queue.log
echo "[speedup-acc] done $(date -u +%H:%M:%S)" >> $Q/queue.log
