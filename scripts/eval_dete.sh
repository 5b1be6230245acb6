#!/bin/bash
# Detection eval (reference scripts/eval_dete.sh): EMA weights, no contrastive align.
python -m toist_tpu.main --config configs/tdod.json --eval \
  --resume "$1" \
  --set optim.valid_batch_size=8 model.contrastive_align_loss=false "${@:2}"
