#!/bin/bash
# Verb-noun teacher training (reference scripts/train_dete_noun.sh): privileged captions.
python -m toist_tpu.main --config configs/tdod.json \
  --output-dir logs/dete_noun \
  --set data.verb_noun_input=true "$@"
