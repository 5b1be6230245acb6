#!/bin/bash
python -m toist_tpu.main --config configs/tdod.json --eval \
  --resume "$1" \
  --set optim.valid_batch_size=4 model.mask_model=smallconv \
        model.contrastive_align_loss=false "${@:2}"
