#!/bin/bash
# From-scratch training (reference --without_pretrain, README.md:112-125):
# no pretrained weights anywhere; GroupNorm backbone so norms can train.
python -m toist_tpu.main --config configs/tdod.json \
  --output-dir logs/dete_scratch \
  --set model.without_pretrain=true model.backbone_norm=group_norm "$@"
