#!/usr/bin/env bash
# Wanda + RESSA for InstructBLIP-Vicuna-7B (reference scripts/Vicuna/wanda.py:
# t5_model_prefix=llm_model, spec 32-R-1.0-1.0 for the 32-layer LLM)
set -euo pipefail
RATIO=${1:-0.5}
python -m vlm_compression_tpu.cli.train \
  --cfg-path configs/models/blip2_vicuna_instruct_7b.yaml \
  --prune --pruning_method blipt5_wanda_pruner \
  --t5_model_prefix llm_model \
  --vit_prune_spec "39-${RATIO}-1.0-1.0" \
  --t5_prune_spec "32-${RATIO}-1.0-1.0" \
  --num_data_for_prune 128 --prune_batch_size 1 \
  --train --sparse --tune_opt LVQ \
  --lora_r_v 4 --lora_r_l 8 --lora_r_q 2 \
  --kl_weight 0.1 --T 1 --save_pruned_model "$@"
