#!/bin/bash
# Plain TOIST detection training (reference scripts/train_dete.sh).
# Data parallelism comes from the jax device mesh (all local chips by default);
# global batch = train_batch_size * n_chips.
python -m toist_tpu.main --config configs/tdod.json \
  --output-dir logs/dete \
  --set optim.train_batch_size=6 optim.valid_batch_size=8 "$@"
