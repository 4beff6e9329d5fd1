#!/bin/sh
# Round-4 post-training evaluation battery for the converged run5 model.
# Runs serially on the single chip; every artifact lands in results/run5/.
# Usage: sh scripts/run5_post.sh [checkpoint]   (default: the git-durable
# snapshot written from the final interrupt state)
set -x
CKPT=${1:-results/run5/ckpt_snapshot}
CSV=data/processed/jarvis_merged_v2.csv.gz

# 1. full-corpus eval (all 47,494 rows -> SC metrics on ALL ~19.8K real
#    negatives, VERDICT r3 #1/#7) + per-sample error records
python scripts/evaluate.py --checkpoint "$CKPT" --csv "$CSV" \
  --batch-size 512 --errors-out results/run5/final_eval_errors.jsonl \
  --out results/run5/final_eval.json

# 2. order-robust AR (new metric, VERDICT r3 #1): K=2 respellings of a
#    2,048-row stratified slice
python scripts/order_robust_eval.py --checkpoint "$CKPT" --csv "$CSV" \
  --limit 2048 --k 2 --out results/run5/order_robust.json

# 3. oracle reconstruction on the converged model (VERDICT r3 #3)
python scripts/holdout_search.py --checkpoint "$CKPT" --csv "$CSV" \
  --oracle-only --out results/run5/oracle_reconstruction.json

# 4. end-to-end decode A/B on the same stratified slice (VERDICT r3 #6)
python scripts/evaluate.py --checkpoint "$CKPT" --csv "$CSV" \
  --limit 2048 --out results/run5/eval_ab_xla.json
python scripts/evaluate.py --checkpoint "$CKPT" --csv "$CSV" \
  --limit 2048 --pallas-decode --out results/run5/eval_ab_pallas.json
python scripts/evaluate.py --checkpoint "$CKPT" --csv "$CSV" \
  --limit 2048 --speculative --out results/run5/eval_ab_spec.json
