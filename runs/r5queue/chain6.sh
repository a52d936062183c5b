#!/bin/bash
# Round-5 TPU chain, part 6: segmenter retrain on the widened corpus,
# engine fine sweep, bench. Runs after chain5 (strictly serial TPU use).
cd /root/repo
Q=runs/r5queue
log() { echo "[chain6] $1 $(date -u +%H:%M:%S)" >> $Q/chain5.log; }

while ! grep -q "chain5 done" $Q/chain5.log 2>/dev/null; do sleep 60; done

log "A: segmenter retrain (widened synthetic corpus, per-class gate)"
timeout 3000 python scripts/train_segmenter_synthetic.py \
  --data runs/synthetic_ct_r5 --output-dir runs/segmenter_r5 \
  --n-steps 1400 > $Q/segtrain.log 2>&1 || log "SEGTRAIN FAILED"
timeout 1800 python scripts/eval_segmenter_asset.py > $Q/segeval.log 2>&1 \
  || log "SEGEVAL FAILED"

log "B: fine engine sweep"
timeout 3000 python scripts/sweep_engine_configs.py --scene full --reps 2 \
  --configs V4_T2_R2_L16 V4_T2_R2_L17 V4_T1_R1_L15 V4_T2_R2_L16_EF25 \
  V4_T2_R2_L16_EF50 > $Q/sweep_fine.log 2>&1 || log "SWEEP FAILED"

log "C: bench"
timeout 1800 python bench.py > $Q/bench.log 2>&1 || log "BENCH FAILED"
log "chain6 done"
