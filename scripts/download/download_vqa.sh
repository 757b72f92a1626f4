#!/usr/bin/env bash
# VQAv2 annotations (images ship with COCO — run download_coco.sh first;
# reference download_vqa.py fetches the same COCO zips)
set -euo pipefail
ROOT=${1:-data/coco}
mkdir -p "$ROOT/annotations"
for f in vqa_train vqa_val vqa_val_eval vqa_test; do
  wget -c "https://storage.googleapis.com/sfr-vision-language-research/datasets/${f}.json" -P "$ROOT/annotations" || true
done
wget -c "https://storage.googleapis.com/sfr-vision-language-research/datasets/answer_list.json" -P "$ROOT/annotations" || true
