#!/usr/bin/env bash
# Zero-shot eval suite (reference scripts/T5/evaluate.py:
# okvqa / gqa / nocaps / vqav2 / ret_flickr)
set -euo pipefail
CKPT=${1:?pruned checkpoint path}
for CFG in vqav2_t5; do
  python -m vlm_compression_tpu.cli.evaluate \
    --cfg-path "configs/projects/eval/${CFG}.yaml" \
    --pruned_checkpoint "$CKPT" --strip_lora_masks
done
