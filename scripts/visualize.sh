#!/bin/bash
python -m toist_tpu.visualize --config configs/tdod.json \
  --resume "$1" --output-dir visualizations "${@:2}"
