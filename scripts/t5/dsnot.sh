#!/usr/bin/env bash
# DSnoT mask refinement + RESSA retrain, FlanT5-XL — the canonical grid of
# reference scripts/T5/wanda.py + train.sh: 50% unstructured (or 2:4 via
# PRUNE_N/M), specs 39-R-1.0-1.0 / 24-R-1.0-1.0, 128 calib samples @ bs 1,
# KD w=0.1 T=1, LoRA r V/L/Q = 4/8/2, 25k retrain samples.
set -euo pipefail
RATIO=${1:-0.5}
PRUNE_N=${2:-0}
PRUNE_M=${3:-0}
KL=${4:-0.1}
SAMPLES=${5:-25000}

python -m vlm_compression_tpu.cli.train \
  --cfg-path configs/projects/train/prune_retrain_t5.yaml \
  --prune --pruning_method blipt5_dsnot_pruner \
  --vit_prune_spec "39-${RATIO}-1.0-1.0" \
  --t5_prune_spec "24-${RATIO}-1.0-1.0" \
  --prune_n "$PRUNE_N" --prune_m "$PRUNE_M" \
  --num_data_for_prune 128 --prune_batch_size 1 \
  --train --sparse --tune_opt LVQ \
  --lora_r_v 4 --lora_r_l 8 --lora_r_q 2 --lora_alpha 16 \
  --kl_weight "$KL" --T 1 \
  --max_train_samples "$SAMPLES" \
  --save_pruned_model "$@"
