#!/bin/sh
# Round-5 resume of run5 (epoch 1046 -> cosine horizon 1300).
#
# Same recipe as launch_run5_resume.sh with ONE deliberate change:
#   - order_augment_resample=true: every epoch redraws each augmented row's
#     element-order respelling (fresh random permutations).  Round-4 measured
#     21.7% AR on NOVEL permutations vs 78.4% on seen spellings
#     (results/run5/order_robust.json) — static K=1 augmentation teaches the
#     one extra spelling, not the "emit elements in conditioning order" rule.
#     Fresh draws each epoch supervise the rule itself (VERDICT r4 #6).
exec python -u scripts/train_resilient.py --stall-timeout 1800 -- \
  --csv data/processed/jarvis_merged_v2.csv.gz --epochs 1300 \
  --batch-size 128 --bf16 --lr 1e-4 --checkpoint-interval 25 \
  --output outputs/run5 --resume auto \
  --set lr_warmup_epochs=0 --set rl_epoch_interval=3 \
  --set phase2_enabled=true --set phase2_interval=16 \
  --set eval_interval=8 --set order_augment=1 \
  --set order_augment_resample=true \
  --set skew_transform=quantile --set resume_grace_epochs=30
