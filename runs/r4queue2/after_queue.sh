#!/bin/bash
# Waits for the r4queue2 job queue to finish, then retries the 4D demo at
# reference ROOSTER depth (now checkpoint/resumable) and refreshes plots.
cd /root/repo
Q=runs/r4queue2
while ! grep -q "queue done" $Q/queue.log; do sleep 120; done
echo "[after] queue done detected $(date -u +%H:%M:%S)" >> $Q/queue.log
for attempt in 1 2 3; do
  echo "[after] 4D retry attempt $attempt $(date -u +%H:%M:%S)" >> $Q/queue.log
  python scripts/run_4d_demo.py --output-folder runs/4d_demo \
    --rooster-iterations 10 --rooster-cg-iterations 4 --rooster-phases 10 \
    >> $Q/4d_demo_retry.log 2>&1 && break
  echo "[after] 4D retry attempt $attempt FAILED" >> $Q/queue.log
  sleep 60
done
python scripts/plot_validation.py > $Q/plots2.log 2>&1 || echo "[after] PLOTS FAILED" >> $Q/queue.log
echo "[after] all done $(date -u +%H:%M:%S)" >> $Q/queue.log
