#!/bin/bash
# Runs after after_queue.sh ("all done" marker): fine engine sweep around
# the production point + extended microbench (table-size/batch-size axes),
# then refreshes best_config.json consumers and reruns bench.py.
cd /root/repo
Q=runs/r4queue2
while ! grep -q "\[after\] all done" $Q/queue.log; do sleep 120; done
echo "[perf] start $(date -u +%H:%M:%S)" >> $Q/queue.log
python scripts/microbench_ops.py --out runs/microbench.json > $Q/microbench2.log 2>&1 \
  || echo "[perf] MICROBENCH FAILED" >> $Q/queue.log
python scripts/sweep_engine_configs.py --scene full --reps 2 --configs \
  V4_T2_R2_L16 V4_T2_R2_L15 V4_T2_R2_L14 V4_T1_R1_L16 V4_T1_R1_L15 \
  V4_T3_R3_L16 V4_T2_R1_L16 V4_T2_R2_L16_EF25 V4_T2_R2_L16_EF50 V4_T2_R2_L17 \
  > $Q/sweep_fine.log 2>&1 || echo "[perf] SWEEP FAILED" >> $Q/queue.log
python bench.py > $Q/bench_after_sweep.log 2>&1 \
  || echo "[perf] BENCH FAILED" >> $Q/queue.log
echo "[perf] done $(date -u +%H:%M:%S)" >> $Q/queue.log
