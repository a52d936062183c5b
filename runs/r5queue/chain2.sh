#!/bin/bash
# Round-5 TPU chain, part 2: items that must not contend with chain 1
# (two concurrent TPU clients wedged the device at 06:23; strictly serial).
cd /root/repo
Q=runs/r5queue
log() { echo "[chain2] $1 $(date -u +%H:%M:%S)" >> $Q/chain.log; }

while ! grep -q "chain done" $Q/chain.log 2>/dev/null; do sleep 60; done

log "A: pallas bucket experiment"
python scripts/pallas_bucket_experiment.py \
  --output runs/pallas_bucket_experiment.json > $Q/pallas.log 2>&1 \
  || log "PALLAS FAILED"

log "B: speedup cross-scene eval"
python scripts/eval_speedup_cross_scene.py --output runs/speedup \
  > $Q/cross_scene.log 2>&1 || log "CROSSSCENE FAILED"

log "C: segmenter retrain on the widened synthetic corpus"
python scripts/train_segmenter_synthetic.py --data runs/synthetic_ct_r5 \
  --output-dir runs/segmenter_r5 --n-steps 1400 \
  > $Q/segtrain.log 2>&1 || log "SEGTRAIN FAILED"
python scripts/eval_segmenter_asset.py > $Q/segeval.log 2>&1 \
  || log "SEGEVAL FAILED"

log "D: oracle at scale (96^3 CatPhan slice)"
python scripts/oracle_at_scale.py \
  --output docs/validation/oracle_at_scale_r5.json > $Q/oracle.log 2>&1 \
  || log "ORACLE FAILED"

log "chain2 done"
