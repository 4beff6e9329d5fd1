#!/bin/sh
# Round-4 resume of run5 (epoch 912 -> cosine horizon 1300).
#
# Same corpus/pipeline as launch_run5.sh (47,494-row 50/50 v2 corpus,
# quantile skew transform, order augmentation K=1, RL duty 1-in-3).
# Two deliberate changes vs the original launch:
#   - --epochs 1300 (was 1100): stretches the cosine so the LR at epoch
#     912 is ~2.1e-5 instead of the ~8e-6 tail — the fine-tune was still
#     mid-recovery from the corpus/normalization shift at 62.9% AR
#     (results/run5/eval_e912.json) and needs a warmer LR to converge
#     within the round's chip window (VERDICT r3 next-round #1).
#   - the RL epochs now run the round-4 frozen-rollout + TF-re-score
#     path (ops/rl.py): ~768 samples/s at batch 128 vs 370 before, so
#     1-in-3 RL duty no longer dominates wall-clock.
exec python -u scripts/train_resilient.py --stall-timeout 1800 -- \
  --csv data/processed/jarvis_merged_v2.csv.gz --epochs 1300 \
  --batch-size 128 --bf16 --lr 1e-4 --checkpoint-interval 25 \
  --output outputs/run5 --resume auto \
  --set lr_warmup_epochs=0 --set rl_epoch_interval=3 \
  --set phase2_enabled=true --set phase2_interval=16 \
  --set eval_interval=8 --set order_augment=1 \
  --set skew_transform=quantile --set resume_grace_epochs=30
