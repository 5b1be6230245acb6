#!/bin/bash
# Noun-pronoun distillation training (reference scripts/train_dete_dis.sh).
# $1 = pronoun (student) warm start, $2 = noun (teacher) warm start.
python -m toist_tpu.main --config configs/tdod.json \
  --load "$1" \
  --set run.load_noun="$2" \
        optim.train_batch_size=3 optim.valid_batch_size=8 \
        loss.distillation=true loss.softkd_loss=true loss.softkd_coef=50 \
        loss.cluster=true loss.cluster_memory_size=1024 loss.cluster_num=3 \
        loss.cluster_feature_loss=1e4 \
  --output-dir logs/dete_dis "${@:3}"
