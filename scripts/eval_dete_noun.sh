#!/bin/bash
python -m toist_tpu.main --config configs/tdod.json --eval \
  --resume "$1" \
  --set data.verb_noun_input=true model.contrastive_align_loss=false "${@:2}"
