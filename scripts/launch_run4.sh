#!/bin/sh
# Run4: fine-tune continuation of run3 from the git-tracked epoch-543
# params snapshot (seeded into outputs/run4/checkpoints/epoch_00543 so
# `--resume auto` — and every crash relaunch — picks it up instead of
# rewinding to an explicit --resume path).
#
# LR: cosine(1e-4, horizon 900, no warmup) evaluated at epoch 544 gives
# ~3.4e-5 decaying to 1e-6 — a fine-tune leg matching run2's LR band over
# its 543-775 climb to 98.8% AR (docs/RESULTS.md). Drop-controller state
# in the seed's meta was reset from run3's accumulated 0.125x lr_scale.
exec python -u scripts/train_resilient.py --stall-timeout 1800 -- \
  --csv data/processed/jarvis_merged.csv.gz --epochs 900 \
  --batch-size 128 --bf16 --lr 1e-4 --checkpoint-interval 25 \
  --output outputs/run4 --resume auto \
  --set lr_warmup_epochs=0 --set rl_epoch_interval=3 \
  --set phase2_enabled=true --set phase2_interval=16 \
  --set eval_interval=8
