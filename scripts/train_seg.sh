#!/bin/bash
# Segmentation training (reference scripts/train_seg.sh): frozen detector, mask head only.
python -m toist_tpu.main --config configs/tdod.json \
  --load "$1" \
  --output-dir logs/seg \
  --set optim.train_batch_size=2 optim.valid_batch_size=4 \
        model.mask_model=smallconv model.frozen_detector=true \
        loss.aux_loss=false model.contrastive_align_loss=false "${@:2}"
